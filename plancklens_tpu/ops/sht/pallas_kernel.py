r"""Pallas TPU kernel for the spin-weighted Legendre synthesis phase.

The XLA scan path (core.py) streams its recursion state and accumulator through HBM every
few multipoles; this kernel keeps everything VMEM-resident: grid over (m-tiles, ring-tiles,
l-chunks) with the l-chunk axis innermost, the d-recursion state carried in VMEM scratch
across l-chunks, and the (batch, rings, m) output tile accumulated in VMEM with one HBM
write at the end — the Legendre phase then runs at VPU compute speed instead of HBM
bandwidth.

Both directions: synthesis (G_{jm} = sum_l C_{lm} d^l_{m,n}(theta_j), grid l-innermost
with the output tile VMEM-resident) and analysis (A_{lm} = sum_j Q_{jm} d^l, grid
ring-innermost so each output l-block accumulates over consecutive revisits).
"""
import numpy as np
import jax
import jax.numpy as jnp
from functools import partial

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _synth_kernel(S, LC, alpha_ref, beta_ref, gamma_ref, l0_ref,
                  seedv_ref, seedk_ref, x_ref, cre_ref, cim_ref,
                  ore_ref, oim_ref, dm1_ref, d_ref, k_ref):
    lchunk = pl.program_id(2)

    @pl.when(lchunk == 0)
    def _():
        # (re)initialise state and output tile for this (m, r) tile
        l0 = l0_ref[0, :]
        seedv = seedv_ref[:, :]
        seedk = seedk_ref[:, :]
        init = (l0 == 0)[None, :]
        d_ref[:, :] = jnp.where(init, seedv, 0.)
        k_ref[:, :] = jnp.where(init, seedk, 0)
        dm1_ref[:, :] = jnp.zeros_like(seedv)
        ore_ref[:, :, :] = jnp.zeros_like(ore_ref)
        oim_ref[:, :, :] = jnp.zeros_like(oim_ref)

    x = x_ref[:, 0][:, None]          # (R_T, 1)
    l0 = l0_ref[0, :][None, :]        # (1, M_T)
    seedv = seedv_ref[:, :]
    seedk = seedk_ref[:, :]
    thresh = 2.0 ** (S // 2)
    down = 2.0 ** (-S)

    def body(j, state):
        dm1, d, k = state
        deff = d * jnp.exp2((S * k).astype(d.dtype))
        ore_ref[:, :, :] += cre_ref[j, :, :][:, None, :] * deff[None, :, :]
        oim_ref[:, :, :] += cim_ref[j, :, :][:, None, :] * deff[None, :, :]
        al = alpha_ref[j, :][None, :]
        bl = beta_ref[j, :][None, :]
        gl = gamma_ref[j, :][None, :]
        l = lchunk * LC + j
        d_next = (al * x + bl) * d - gl * dm1
        inject = (l + 1) == l0
        d_new = jnp.where(inject, 0., d)
        d_next = jnp.where(inject, seedv, d_next)
        k = jnp.where(inject, seedk, k)
        cond = (k < 0) & (jnp.abs(d_next) > thresh)
        fac = jnp.where(cond, down, 1.)
        return d_new * fac, d_next * fac, k + cond.astype(jnp.int32)

    dm1, d, k = jax.lax.fori_loop(0, LC, body,
                                  (dm1_ref[:, :], d_ref[:, :], k_ref[:, :]))
    dm1_ref[:, :] = dm1
    d_ref[:, :] = d
    k_ref[:, :] = k


@partial(jax.jit, static_argnums=(0, 10))
def _synth_pallas(S, alpha, beta, gamma, l0, seed_v, seed_k, x, C_re, C_im, interpret=False):
    """(B, R, M) real/imag G from (lmax+1, B, M) C coefficient arrays (all f32)."""
    lmaxp1, B, M = C_re.shape
    R = x.shape[0]
    M_T = 128
    R_T = 128
    LC = 128
    mt = -(-M // M_T)
    rt = -(-R // R_T)
    lt = -(-lmaxp1 // LC)
    Mp, Rp, Lp = mt * M_T, rt * R_T, lt * LC

    def padto(a, shape):
        pads = [(0, s - d) for d, s in zip(a.shape, shape)]
        return jnp.pad(a, pads)

    alpha = padto(alpha, (Lp, Mp))
    beta = padto(beta, (Lp, Mp))
    gamma = padto(gamma, (Lp, Mp))
    l0p = padto(l0.astype(jnp.int32)[None, :], (1, Mp)) + jnp.where(
        jnp.arange(Mp) >= M, jnp.int32(2 * Lp + 10), 0)[None, :]  # never seed padding
    seed_v = padto(seed_v, (Rp, Mp))
    seed_k = padto(seed_k, (Rp, Mp))
    xp = padto(x[:, None], (Rp, 1))
    C_re = padto(C_re, (Lp, B, Mp))
    C_im = padto(C_im, (Lp, B, Mp))

    grid = (mt, rt, lt)
    kernel = partial(_synth_kernel, S, LC)
    out_shape = [jax.ShapeDtypeStruct((B, Rp, Mp), jnp.float32),
                 jax.ShapeDtypeStruct((B, Rp, Mp), jnp.float32)]
    in_specs = [
        pl.BlockSpec((LC, M_T), lambda m, r, l: (l, m)),           # alpha
        pl.BlockSpec((LC, M_T), lambda m, r, l: (l, m)),           # beta
        pl.BlockSpec((LC, M_T), lambda m, r, l: (l, m)),           # gamma
        pl.BlockSpec((1, M_T), lambda m, r, l: (0, m)),            # l0
        pl.BlockSpec((R_T, M_T), lambda m, r, l: (r, m)),          # seed_v
        pl.BlockSpec((R_T, M_T), lambda m, r, l: (r, m)),          # seed_k
        pl.BlockSpec((R_T, 1), lambda m, r, l: (r, 0)),            # x
        pl.BlockSpec((LC, B, M_T), lambda m, r, l: (l, 0, m)),     # C_re
        pl.BlockSpec((LC, B, M_T), lambda m, r, l: (l, 0, m)),     # C_im
    ]
    out_specs = [pl.BlockSpec((B, R_T, M_T), lambda m, r, l: (0, r, m)),
                 pl.BlockSpec((B, R_T, M_T), lambda m, r, l: (0, r, m))]
    ore, oim = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[pltpu.VMEM((R_T, M_T), jnp.float32),
                        pltpu.VMEM((R_T, M_T), jnp.float32),
                        pltpu.VMEM((R_T, M_T), jnp.int32)],
        interpret=interpret,
    )(alpha, beta, gamma, l0p, seed_v, seed_k, xp, C_re, C_im)
    return ore[:, :R, :M], oim[:, :R, :M]


def legendre_synth_pallas(C, tables, x, interpret=False):
    """Drop-in synthesis using the Pallas kernel; C (batch, lmax+1, mmax+1) complex64."""
    C = jnp.asarray(C)
    Cl = jnp.moveaxis(C, 1, 0)  # (lmax+1, B, M)
    tb = tables.get('np', tables)  # host tables; dev flavour may be unmaterialised
    ore, oim = _synth_pallas(tables['S'],
                             jnp.asarray(tb['alpha'], jnp.float32),
                             jnp.asarray(tb['beta'], jnp.float32),
                             jnp.asarray(tb['gamma'], jnp.float32),
                             jnp.asarray(tb['l0']),
                             jnp.asarray(tb['seed_v'], jnp.float32),
                             jnp.asarray(tb['seed_k']),
                             jnp.asarray(x, jnp.float32),
                             jnp.real(Cl).astype(jnp.float32),
                             jnp.imag(Cl).astype(jnp.float32), interpret)
    return ore + 1j * oim


def _anal_kernel(S, LC, R_T, alpha_ref, beta_ref, gamma_ref, l0_ref,
                 seedv_ref, seedk_ref, x_ref, qre_ref, qim_ref,
                 are_ref, aim_ref, dm1_ref, d_ref, k_ref):
    """Analysis: A_{lm} = sum_j Q_{jm} d^l_{m,n}(theta_j).

    Grid (m-tiles, l-chunks, ring-tiles): ring tiles innermost so each output l-block is
    revisited consecutively (Pallas accumulation rule); the recursion state for ALL rings
    of the current m-tile lives in (Rp, M_T) scratch, sliced per ring tile."""
    lchunk = pl.program_id(1)
    rtile = pl.program_id(2)
    rows = pl.ds(rtile * R_T, R_T)

    @pl.when(lchunk == 0)
    def _():
        l0 = l0_ref[0, :]
        init = (l0 == 0)[None, :]
        d_ref[rows, :] = jnp.where(init, seedv_ref[:, :], 0.)
        k_ref[rows, :] = jnp.where(init, seedk_ref[:, :], 0)
        dm1_ref[rows, :] = jnp.zeros((R_T, l0.shape[0]), dm1_ref.dtype)

    @pl.when(rtile == 0)
    def _():
        are_ref[:, :, :] = jnp.zeros_like(are_ref)
        aim_ref[:, :, :] = jnp.zeros_like(aim_ref)

    x = x_ref[:, 0][:, None]
    l0 = l0_ref[0, :][None, :]
    seedv = seedv_ref[:, :]
    seedk = seedk_ref[:, :]
    thresh = 2.0 ** (S // 2)
    down = 2.0 ** (-S)
    qre = qre_ref[:, :, :]            # (B, R_T, M_T)
    qim = qim_ref[:, :, :]

    def body(j, state):
        dm1, d, k = state
        deff = d * jnp.exp2((S * k).astype(d.dtype))
        are_ref[j, :, :] += jnp.sum(qre * deff[None, :, :], axis=1)
        aim_ref[j, :, :] += jnp.sum(qim * deff[None, :, :], axis=1)
        al = alpha_ref[j, :][None, :]
        bl = beta_ref[j, :][None, :]
        gl = gamma_ref[j, :][None, :]
        l = lchunk * LC + j
        d_next = (al * x + bl) * d - gl * dm1
        inject = (l + 1) == l0
        d_new = jnp.where(inject, 0., d)
        d_next = jnp.where(inject, seedv, d_next)
        k = jnp.where(inject, seedk, k)
        cond = (k < 0) & (jnp.abs(d_next) > thresh)
        fac = jnp.where(cond, down, 1.)
        return d_new * fac, d_next * fac, k + cond.astype(jnp.int32)

    dm1, d, k = jax.lax.fori_loop(0, LC, body,
                                  (dm1_ref[rows, :], d_ref[rows, :], k_ref[rows, :]))
    dm1_ref[rows, :] = dm1
    d_ref[rows, :] = d
    k_ref[rows, :] = k


@partial(jax.jit, static_argnums=(0, 1, 11))
def _anal_pallas(S, lmaxp1, alpha, beta, gamma, l0, seed_v, seed_k, x, Q_re, Q_im,
                 interpret=False):
    """(lmax+1, B, M) real/imag A from (B, R, M) pre-weighted ring arrays (all f32)."""
    B, R, M = Q_re.shape
    M_T = 128
    R_T = 128
    LC = 128
    mt = -(-M // M_T)
    rt = -(-R // R_T)
    lt = -(-lmaxp1 // LC)
    Mp, Rp, Lp = mt * M_T, rt * R_T, lt * LC

    def padto(a, shape):
        pads = [(0, s - d) for d, s in zip(a.shape, shape)]
        return jnp.pad(a, pads)

    alpha = padto(alpha, (Lp, Mp))
    beta = padto(beta, (Lp, Mp))
    gamma = padto(gamma, (Lp, Mp))
    l0p = padto(l0.astype(jnp.int32)[None, :], (1, Mp)) + jnp.where(
        jnp.arange(Mp) >= M, jnp.int32(2 * Lp + 10), 0)[None, :]
    seed_v = padto(seed_v, (Rp, Mp))
    seed_k = padto(seed_k, (Rp, Mp))
    xp = padto(x[:, None], (Rp, 1))
    Q_re = padto(Q_re, (B, Rp, Mp))
    Q_im = padto(Q_im, (B, Rp, Mp))

    grid = (mt, lt, rt)
    kernel = partial(_anal_kernel, S, LC, R_T)
    out_shape = [jax.ShapeDtypeStruct((Lp, B, Mp), jnp.float32),
                 jax.ShapeDtypeStruct((Lp, B, Mp), jnp.float32)]
    in_specs = [
        pl.BlockSpec((LC, M_T), lambda m, l, r: (l, m)),           # alpha
        pl.BlockSpec((LC, M_T), lambda m, l, r: (l, m)),           # beta
        pl.BlockSpec((LC, M_T), lambda m, l, r: (l, m)),           # gamma
        pl.BlockSpec((1, M_T), lambda m, l, r: (0, m)),            # l0
        pl.BlockSpec((R_T, M_T), lambda m, l, r: (r, m)),          # seed_v
        pl.BlockSpec((R_T, M_T), lambda m, l, r: (r, m)),          # seed_k
        pl.BlockSpec((R_T, 1), lambda m, l, r: (r, 0)),            # x
        pl.BlockSpec((B, R_T, M_T), lambda m, l, r: (0, r, m)),    # Q_re
        pl.BlockSpec((B, R_T, M_T), lambda m, l, r: (0, r, m)),    # Q_im
    ]
    out_specs = [pl.BlockSpec((LC, B, M_T), lambda m, l, r: (l, 0, m)),
                 pl.BlockSpec((LC, B, M_T), lambda m, l, r: (l, 0, m))]
    are, aim = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[pltpu.VMEM((Rp, M_T), jnp.float32),
                        pltpu.VMEM((Rp, M_T), jnp.float32),
                        pltpu.VMEM((Rp, M_T), jnp.int32)],
        interpret=interpret,
    )(alpha, beta, gamma, l0p, seed_v, seed_k, xp, Q_re, Q_im)
    return are[:lmaxp1, :, :M], aim[:lmaxp1, :, :M]


def legendre_anal_pallas(Q, tables, x, lmax, interpret=False):
    """Drop-in analysis using the Pallas kernel; Q (batch, nrings, mmax+1) complex,
    pre-weighted by the quadrature weights (as core.legendre_anal expects).
    Returns (batch, lmax+1, mmax+1) complex64."""
    Q = jnp.asarray(Q)
    tb = tables.get('np', tables)  # host tables; dev flavour may be unmaterialised
    are, aim = _anal_pallas(tables['S'], lmax + 1,
                            jnp.asarray(tb['alpha'], jnp.float32),
                            jnp.asarray(tb['beta'], jnp.float32),
                            jnp.asarray(tb['gamma'], jnp.float32),
                            jnp.asarray(tb['l0']),
                            jnp.asarray(tb['seed_v'], jnp.float32),
                            jnp.asarray(tb['seed_k']),
                            jnp.asarray(x, jnp.float32),
                            jnp.real(Q).astype(jnp.float32),
                            jnp.imag(Q).astype(jnp.float32), interpret)
    A = are + 1j * aim
    return jnp.moveaxis(A, 0, 1)  # (B, lmax+1, M)
