r"""Flat-sky N1 lensing-bias integrand, vectorised.

Rebuild of the reference OpenMP kernel (reference: plancklens/n1/n1f.f90): the N^(1) bias
of QE cross-spectra, Eq. A.3 of arXiv:1807.06210, as a quadruple flat-sky integral over the
CMB wavevector l1 (radial step dL, adaptive azimuth count) and the anisotropy-source vector
(sparse multipole knots `lps`, adaptive azimuth count).

The reference's nested adaptive loops become one rectangular masked grid per (L, L1):
azimuth axes are padded to their maximum counts with zero quadrature weight, so the whole
integrand is a single fused elementwise evaluation on the (phi1, lps, phi_s) box, scanned
over L1 and vmapped over output L — the entire N1 curve is one XLA program instead of an
MPI loop over L (reference: plancklens/n1/n1.py:215-226).

Conventions replicated exactly, including the kernel's 1-based spectrum lookup
(Fortran cltt(l) == python cl[l-1]) so results are bit-comparable with the reference.
"""
import numpy as np
import jax
import jax.numpy as jnp
from functools import partial


def _cl_at(cl, li, lmin, lmax):
    """cl[l-1] lookup with [lmin, lmax] bounds mask (Fortran 1-based convention).

    l beyond the array's own band limit reads as 0 (not a clamped last entry), so a
    leg array shorter than the lmax another leg sets behaves as zero-padded — the
    convention n1L_jtp_batch implements explicitly."""
    idx = jnp.clip(li - 1, 0, cl.shape[0] - 1)
    ok = (li >= lmin) & (li <= lmax) & (li <= cl.shape[0])
    return jnp.where(ok, cl[idx], 0.)


def _geom(l1x, l2x, l1y, l2y):
    """Shared angular/radial geometry of a wavevector pair: (cos2phi12, sin2phi12,
    L.l1, L.l2, Lxl1, Lxl2) with L = l1 + l2."""
    l1sq = l1x ** 2 + l1y ** 2
    l2sq = l2x ** 2 + l2y ** 2
    dot12 = l1x * l2x + l1y * l2y
    cross12 = -l1y * l2x + l1x * l2y
    safe = jnp.maximum(l1sq * l2sq, 1e-30)
    cos2p = 2. * dot12 ** 2 / safe - 1.
    sin2p = 2. * dot12 * cross12 / safe
    Lql1 = (l1x + l2x) * l1x + (l1y + l2y) * l1y   # L . l1
    Lql2 = (l1x + l2x) * l2x + (l1y + l2y) * l2y   # L . l2
    Lxl1 = -(l1y + l2y) * l1x + (l1x + l2x) * l1y  # L x l1
    Lxl2 = -(l1y + l2y) * l2x + (l1x + l2x) * l2y  # L x l2
    return cos2p, sin2p, Lql1, Lql2, Lxl1, Lxl2


def _wf(k, l1x, l2x, l1y, l2y, l1i, l2i, cltt, clte, clee):
    """QE flat-sky weight functions W^k(l1, l2) (reference: n1f.f90:1-99).

    k is a static 3-char key: source in 'pxsf' + field pair in tt/te/et/tb/bt/ee/eb/be/bb.
    Index arrays l1i/l2i are rounded integer moduli; spectra are (len lmax) arrays.
    """
    ctt = lambda li: _cl_at(cltt, li, 1, cltt.shape[0])
    cte = lambda li: _cl_at(clte, li, 1, clte.shape[0])
    cee = lambda li: _cl_at(clee, li, 1, clee.shape[0])
    cos2p, sin2p, Lql1, Lql2, Lxl1, Lxl2 = _geom(l1x, l2x, l1y, l2y)

    if k == 'ptt':
        return ctt(l1i) * Lql1 + ctt(l2i) * Lql2
    if k == 'pte':
        return cte(l1i) * cos2p * Lql1 + cte(l2i) * Lql2
    if k == 'pet':
        return cte(l2i) * cos2p * Lql2 + cte(l1i) * Lql1
    if k == 'ptb':
        return cte(l1i) * Lql1 * sin2p
    if k == 'pbt':
        return cte(l2i) * Lql2 * (-sin2p)
    if k == 'pee':
        return (cee(l1i) * Lql1 + cee(l2i) * Lql2) * cos2p
    if k == 'peb':
        return cee(l1i) * Lql1 * sin2p
    if k == 'pbe':
        return cee(l2i) * Lql2 * (-sin2p)
    if k in ('pbb', 'xbb', 'sbb', 'fbb'):
        return jnp.zeros_like(l1x)
    if k == 'xtt':
        return ctt(l1i) * Lxl1 + ctt(l2i) * Lxl2
    if k == 'xte':
        return cte(l1i) * cos2p * Lxl1 + cte(l2i) * Lxl2
    if k == 'xet':
        return cte(l2i) * cos2p * Lxl2 + cte(l1i) * Lxl1
    if k == 'xtb':
        return cte(l1i) * Lxl1 * sin2p
    if k == 'xbt':
        return cte(l2i) * Lxl2 * (-sin2p)
    if k == 'xee':
        return (cee(l1i) * Lxl1 + cee(l2i) * Lxl2) * cos2p
    if k == 'xeb':
        return cee(l1i) * Lxl1 * sin2p
    if k == 'xbe':
        return cee(l2i) * Lxl2 * (-sin2p)
    if k == 'stt':
        return jnp.ones_like(l1x)
    if k == 'ftt':
        return ctt(l1i) + ctt(l2i)
    if k in ('ste', 'set', 'stb', 'sbt', 'seb', 'sbe', 'see',
             'fte', 'fet', 'ftb', 'fbt', 'feb', 'fbe', 'fee'):
        return jnp.zeros_like(l1x)
    raise ValueError('unknown N1 weight key ' + k)


# ----------------------------------------------------------------------------- coded W^k
# Every flat-sky QE weight above is a two-term product sum
#     W^k = s1 * C_{c1}(l1) * A_{a1}(phi12) * R_{r1}(L, l1)
#         + s2 * C_{c2}(l2) * A_{a2}(phi12) * R_{r2}(L, l2)
# with C in {0, cltt, clte, clee, 1}, A in {1, cos2phi, sin2phi}, R in {1, L.l_i, Lxl_i}
# and s a sign. Encoding the key as eight small integers turns the STATIC key choice into
# DATA, so a whole batch of field combinations (the jtp 'teb'^4 loop,
# reference: plancklens/n1/n1.py:361-406) evaluates as ONE vmapped XLA program instead of
# up to 81 host-driven kernel sequences.
_SPEC_IDX = {'0': 0, 'tt': 1, 'te': 2, 'ee': 3, '1': 4}
_ANG_IDX = {'1': 0, 'c': 1, 's': 2}
_RAD_IDX = {'1': 0, 'q': 1, 'x': 2}


def _enc(term):
    if term is None:
        return [0, 0, 0, 1]
    c, a, r, s = term
    return [_SPEC_IDX[c], _ANG_IDX[a], _RAD_IDX[r], s]


def _build_codes():
    codes = {}
    for src, rad in (('p', 'q'), ('x', 'x')):
        table = {
            'tt': (('tt', '1', rad, 1), ('tt', '1', rad, 1)),
            'te': (('te', 'c', rad, 1), ('te', '1', rad, 1)),
            'et': (('te', '1', rad, 1), ('te', 'c', rad, 1)),
            'tb': (('te', 's', rad, 1), None),
            'bt': (None, ('te', 's', rad, -1)),
            'ee': (('ee', 'c', rad, 1), ('ee', 'c', rad, 1)),
            'eb': (('ee', 's', rad, 1), None),
            'be': (None, ('ee', 's', rad, -1)),
            'bb': (None, None),
        }
        for pair, (t1, t2) in table.items():
            codes[src + pair] = _enc(t1) + _enc(t2)
    codes['stt'] = _enc(('1', '1', '1', 1)) + _enc(None)
    codes['ftt'] = _enc(('tt', '1', '1', 1)) + _enc(('tt', '1', '1', 1))
    for pair in ('tt', 'te', 'et', 'tb', 'bt', 'ee', 'eb', 'be', 'bb'):
        codes.setdefault('s' + pair, _enc(None) + _enc(None))
        codes.setdefault('f' + pair, _enc(None) + _enc(None))
    return {k: np.asarray(v, dtype=np.int32) for k, v in codes.items()}


_WF_CODES = _build_codes()


def wf_code(k):
    """The 8-int coefficient code of weight key `k` (see _wf_coded)."""
    return _WF_CODES[k]


def _wf_coded(code, l1x, l2x, l1y, l2y, l1i, l2i, cltt, clte, clee):
    """Data-driven W^k evaluation: `code` is a traced int32[8] array selecting the
    spectrum / angular factor / radial factor / sign of each of the two terms. Exactly
    equivalent to _wf(k, ...) with code = wf_code(k) (pinned by tests/test_n1.py)."""
    cos2p, sin2p, Lql1, Lql2, Lxl1, Lxl2 = _geom(l1x, l2x, l1y, l2y)
    one = jnp.ones_like(Lql1)
    zero = jnp.zeros_like(Lql1)

    def spec_stack(li):
        return jnp.stack([zero,
                          _cl_at(cltt, li, 1, cltt.shape[0]) * one,
                          _cl_at(clte, li, 1, clte.shape[0]) * one,
                          _cl_at(clee, li, 1, clee.shape[0]) * one,
                          one])

    ang = jnp.stack([one, cos2p, sin2p])
    rad1 = jnp.stack([one, Lql1, Lxl1])
    rad2 = jnp.stack([one, Lql2, Lxl2])
    t1 = spec_stack(l1i)[code[0]] * ang[code[1]] * rad1[code[2]] \
        * code[3].astype(one.dtype)
    t2 = spec_stack(l2i)[code[4]] * ang[code[5]] * rad2[code[6]] \
        * code[7].astype(one.dtype)
    return t1 + t2


def _grids(lminA, lmaxA, dL, lps):
    """Static integration-grid descriptors (numpy)."""
    L1s = np.arange(max(lminA, dL // 2), lmaxA + 1, dL, dtype=float)
    nphi = np.where(L1s.astype(int) > 3 * dL,
                    2 * np.rint(0.5 * L1s / dL).astype(int) + 1,
                    2 * L1s.astype(int) + 1)
    nphi_half = (nphi - 1) // 2 + 1
    lps = np.asarray(lps, dtype=int)
    dlps = np.empty(len(lps), dtype=float)
    dlps[0] = lps[1] - lps[0]
    dlps[1:-1] = 0.5 * (lps[2:] - lps[:-2])
    dlps[-1] = lps[-1] - lps[-2]
    ns = np.where(lps > 20,
                  2 * np.rint(0.5 * (2 * lps + 1) / dlps).astype(int) + 1,
                  2 * lps + 1)
    return L1s, nphi, int(nphi_half.max()), lps, dlps, ns, int(ns.max())


def n1L(L, kA, kB, kI, cl_kI, cltt, clte, clee, clttfid, cltefid, cleefid,
        ftlA, felA, fblA, ftlB, felB, fblB, lminA, lminB, dL, lps):
    """N1 contribution at a single output multipole L (reference: n1f.f90:129-277).

    Spectrum and filter arrays follow the reference convention: entry [i] is multipole
    i + 1, valid range [lmin, len(array)].
    """
    lmaxA = len(ftlA)
    lmaxB = len(ftlB)
    k13 = kI + kA[1] + kB[1]
    k24 = kI + kA[2] + kB[2]
    k14 = kI + kA[1] + kB[2]
    k23 = kI + kA[2] + kB[1]
    fal = {'t': np.asarray(ftlA), 'e': np.asarray(felA), 'b': np.asarray(fblA)}
    fbl = {'t': np.asarray(ftlB), 'e': np.asarray(felB), 'b': np.asarray(fblB)}
    fal1, fal2 = jnp.asarray(fal[kA[1]]), jnp.asarray(fal[kA[2]])
    fal3, fal4 = jnp.asarray(fbl[kB[1]]), jnp.asarray(fbl[kB[2]])

    L1s, nphi, nphiH, lps, dlps, ns, nsmax = _grids(lminA, lmaxA, dL, lps)

    args = (jnp.asarray(cl_kI), jnp.asarray(cltt), jnp.asarray(clte), jnp.asarray(clee),
            jnp.asarray(clttfid), jnp.asarray(cltefid), jnp.asarray(cleefid),
            fal1, fal2, fal3, fal4)
    return _n1L_core(float(L), k13, k24, k14, k23, kA, kB,
                     jnp.asarray(L1s), jnp.asarray(nphi), nphiH,
                     jnp.asarray(lps, dtype=float), jnp.asarray(dlps),
                     jnp.asarray(ns), nsmax, lminA, lmaxA, lminB, lmaxB, dL, *args)


def _n1L_body(L, k13, k24, k14, k23, kA, kB, codes, L1s, nphi, nphiH, lps, dlps, ns,
              nsmax, lminA, lmaxA, lminB, lmaxB, dL, cl_kI, cltt, clte, clee,
              clttfid, cltefid, cleefid, fal1, fal2, fal3, fal4, lmA=None, lmB=None):
    """The (phi1, lps, phi_s) box integrand scanned over L1, for one output L.

    The four inner weight keys are either STATIC strings (k13..k23; the single-key path)
    or, when k13 is None, TRACED coefficient codes (codes: int32[4, 8]) — the latter makes
    the key choice vmappable (jtp combination batches). lmA/lmB optionally override the
    static lmaxA/lmaxB in the CONTINUOUS integration-bound masks (per-combination band
    limits in a batch; the rounded-index filter lookups are handled by zero padding, but
    the continuous |l| <= lmax cut is not — it must be carried as data)."""
    bndA = lmaxA if lmA is None else lmA
    bndB = lmaxB if lmB is None else lmB
    if k13 is None:
        wf13 = lambda *a: _wf_coded(codes[0], *a)
        wf24 = lambda *a: _wf_coded(codes[1], *a)
        wf14 = lambda *a: _wf_coded(codes[2], *a)
        wf23 = lambda *a: _wf_coded(codes[3], *a)
    else:
        wf13 = partial(_wf, k13)
        wf24 = partial(_wf, k24)
        wf14 = partial(_wf, k14)
        wf23 = partial(_wf, k23)
    Lx, Ly = L, 0.

    # phi_s angular grid per lps knot: index j in [-(n-1)/2, (n-1)/2], padded to nsmax
    jgrid = jnp.arange(nsmax)[None, :] - (ns[:, None] - 1) // 2   # (nlps, nsmax)
    smask = (jnp.arange(nsmax)[None, :] < ns[:, None])
    dphi_s = 2. * np.pi / ns.astype(float)
    phi_s = dphi_s[:, None] * jgrid                                # (nlps, nsmax)
    PhiLx = lps[:, None] * jnp.cos(phi_s)
    PhiLy = lps[:, None] * jnp.sin(phi_s)
    w_s = (dphi_s * lps * dlps)[:, None] * smask                   # (nlps, nsmax)
    clk = _cl_at(cl_kI, lps.astype(int), 1, cl_kI.shape[0])[:, None]

    def per_L1(carry, x):
        L1, nphi1 = x
        dphi = 2. * np.pi / nphi1
        phis = dphi * jnp.arange(nphiH)                             # (nphiH,)
        pmask = jnp.arange(nphiH) <= (nphi1 - 1) // 2
        wphi = jnp.where(jnp.arange(nphiH) == 0, 1., 2.) * pmask
        L1x = L1 * jnp.cos(phis)
        L1y = L1 * jnp.sin(phis)
        L2x = Lx - L1x
        L2y = Ly - L1y
        L2 = jnp.sqrt(L2x ** 2 + L2y ** 2)
        L1i = jnp.rint(L1).astype(jnp.int32)
        L2i = jnp.rint(L2).astype(jnp.int32)
        ok2 = (L2 >= lminA) & (L2 <= bndA)
        wA = _wf(kA, L1x, L2x, L1y, L2y, L1i, L2i, clttfid, cltefid, cleefid)
        f12 = _cl_at(fal1, L1i, lminA, lmaxA) * _cl_at(fal2, L2i, lminA, lmaxA)
        pref = (wphi * ok2 * wA * f12 * (dphi * L1 * dL)
                / (2. * np.pi) ** 4 * 0.25)                         # (nphiH,)

        # inner box: (nphiH, nlps, nsmax)
        L3x = PhiLx[None] - L1x[:, None, None]
        L3y = PhiLy[None] - L1y[:, None, None]
        L3 = jnp.sqrt(L3x ** 2 + L3y ** 2)
        L4x = -Lx - L3x
        L4y = -Ly - L3y
        L4 = jnp.sqrt(L4x ** 2 + L4y ** 2)
        L3i = jnp.rint(L3).astype(jnp.int32)
        L4i = jnp.rint(L4).astype(jnp.int32)
        ok34 = (L3 >= lminB) & (L3 <= bndB) & (L4 >= lminB) & (L4 <= bndB)
        l1xb = jnp.broadcast_to(L1x[:, None, None], L3x.shape)
        l1yb = jnp.broadcast_to(L1y[:, None, None], L3x.shape)
        l2xb = jnp.broadcast_to(L2x[:, None, None], L3x.shape)
        l2yb = jnp.broadcast_to(L2y[:, None, None], L3x.shape)
        l1ib = jnp.broadcast_to(L1i, L3i.shape)  # L1i is scalar within a scan step
        l2ib = jnp.broadcast_to(L2i[:, None, None], L3i.shape)
        w13 = wf13(l1xb, L3x, l1yb, L3y, l1ib, L3i, cltt, clte, clee)
        w24 = wf24(l2xb, L4x, l2yb, L4y, l2ib, L4i, cltt, clte, clee)
        w14 = wf14(l1xb, L3x, l1yb, L3y, l1ib, L3i, cltt, clte, clee)
        w23 = wf23(l2xb, L4x, l2yb, L4y, l2ib, L4i, cltt, clte, clee)
        wB1 = _wf(kB, L3x, L4x, L3y, L4y, L3i, L4i, clttfid, cltefid, cleefid)
        wB2 = _wf(kB, L4x, L3x, L4y, L3y, L4i, L3i, clttfid, cltefid, cleefid)
        f3 = _cl_at(fal3, L3i, lminB, lmaxB)
        f4 = _cl_at(fal4, L4i, lminB, lmaxB)
        f3b = _cl_at(fal3, L4i, lminB, lmaxB)
        f4b = _cl_at(fal4, L3i, lminB, lmaxB)
        term1 = wB1 * w13 * w24 * f3 * f4
        term2 = wB2 * w14 * w23 * f3b * f4b
        inner = jnp.sum((term1 + term2) * ok34 * (w_s * clk)[None], axis=(1, 2))
        return carry + jnp.sum(pref * inner), None

    tot, _ = jax.lax.scan(per_L1, jnp.zeros((), jnp.float64 if cltt.dtype == jnp.float64
                                            else jnp.float32), (L1s, nphi.astype(float)))
    return tot


@partial(jax.jit, static_argnums=(1, 2, 3, 4, 5, 6, 9, 13, 14, 15, 16, 17, 18))
def _n1L_core(L, k13, k24, k14, k23, kA, kB, L1s, nphi, nphiH, lps, dlps, ns, nsmax,
              lminA, lmaxA, lminB, lmaxB, dL,
              cl_kI, cltt, clte, clee, clttfid, cltefid, cleefid, fal1, fal2, fal3, fal4):
    return _n1L_body(L, k13, k24, k14, k23, kA, kB, None, L1s, nphi, nphiH, lps, dlps,
                     ns, nsmax, lminA, lmaxA, lminB, lmaxB, dL, cl_kI, cltt, clte, clee,
                     clttfid, cltefid, cleefid, fal1, fal2, fal3, fal4)


@partial(jax.jit, static_argnums=(1, 2, 3, 4, 5, 6, 9, 13, 14, 15, 16, 17, 18))
def _n1L_batch_core(Ls2d, k13, k24, k14, k23, kA, kB, L1s, nphi, nphiH, lps, dlps, ns,
                    nsmax, lminA, lmaxA, lminB, lmaxB, dL, cl_kI, cltt, clte, clee,
                    clttfid, cltefid, cleefid, fal1, fal2, fal3, fal4):
    """The WHOLE sparse-L knot vector as one XLA program: vmap over a chunk of output
    multipoles, lax.map over the chunks (bounds the live box memory at chunk x the
    single-L footprint). Absorbs the reference's MPI L-distribution
    (plancklens/n1/n1.py:215-226) into the compiler."""
    f = lambda L: _n1L_body(L, k13, k24, k14, k23, kA, kB, None, L1s, nphi, nphiH, lps,
                            dlps, ns, nsmax, lminA, lmaxA, lminB, lmaxB, dL, cl_kI,
                            cltt, clte, clee, clttfid, cltefid, cleefid,
                            fal1, fal2, fal3, fal4)
    return jax.lax.map(jax.vmap(f), Ls2d).reshape(-1)


@partial(jax.jit, static_argnums=(2, 3, 6, 10, 11, 12, 13, 14, 15))
def _n1L_jtp_batch_core(Ls, codes, kA, kB, L1s, nphi, nphiH, lps, dlps, ns, nsmax,
                        lminA, lmaxA, lminB, lmaxB, dL, cl_kI, cltt, clte, clee,
                        clttfid, cltefid, cleefid, fmatsA, fmatsB, lmAs, lmBs):
    """All jtp primed-field combinations x all L knots in one XLA program.

    codes: int32[ncombo, 4, 8] coefficient codes of (k13, k24, k14, k23) per combination;
    fmatsA/B: (ncombo, 2, lmaxA/B) stacked filtering-matrix legs (FXXp, FYYp)/(FIIp, FJJp),
    zero-padded to the common band limits; lmAs/lmBs: (ncombo,) per-combination continuous
    integration bounds. L is mapped sequentially (the box is large), combinations are
    vmapped: the combo-independent geometry stays unbatched and only the weight selection,
    filter lookups and bound masks carry the batch axis. Returns (nL, ncombo)."""
    def per_L(L):
        f = lambda c, fa, fb, la, lb: _n1L_body(
            L, None, None, None, None, kA, kB, c, L1s, nphi, nphiH, lps, dlps, ns,
            nsmax, lminA, lmaxA, lminB, lmaxB, dL, cl_kI, cltt, clte, clee,
            clttfid, cltefid, cleefid, fa[0], fa[1], fb[0], fb[1], lmA=la, lmB=lb)
        return jax.vmap(f)(codes, fmatsA, fmatsB, lmAs, lmBs)
    return jax.lax.map(per_L, Ls)


def n1L_batch(Ls, kA, kB, kI, cl_kI, cltt, clte, clee, clttfid, cltefid, cleefid,
              ftlA, felA, fblA, ftlB, felB, fblB, lminA, lminB, dL, lps, chunk=None):
    """The full N1 curve on the output knots `Ls` as ONE jit call (see _n1L_batch_core).

    Same conventions as n1L; `chunk` (or PLK_N1_CHUNK, default 8) is the number of output
    multipoles evaluated concurrently. Returns a numpy (len(Ls),) array."""
    import os
    if chunk is None:
        chunk = int(os.environ.get('PLK_N1_CHUNK', '8'))
    lmaxA = len(ftlA)
    lmaxB = len(ftlB)
    k13 = kI + kA[1] + kB[1]
    k24 = kI + kA[2] + kB[2]
    k14 = kI + kA[1] + kB[2]
    k23 = kI + kA[2] + kB[1]
    fal = {'t': np.asarray(ftlA), 'e': np.asarray(felA), 'b': np.asarray(fblA)}
    fbl = {'t': np.asarray(ftlB), 'e': np.asarray(felB), 'b': np.asarray(fblB)}
    L1s, nphi, nphiH, lps, dlps, ns, nsmax = _grids(lminA, lmaxA, dL, lps)
    Ls = np.asarray(Ls, dtype=float)
    nL = len(Ls)
    npad = (-nL) % chunk
    Ls2d = np.concatenate([Ls, np.full(npad, Ls[-1])]).reshape(-1, chunk)
    out = _n1L_batch_core(
        jnp.asarray(Ls2d), k13, k24, k14, k23, kA, kB, jnp.asarray(L1s),
        jnp.asarray(nphi), nphiH, jnp.asarray(lps, dtype=float), jnp.asarray(dlps),
        jnp.asarray(ns), nsmax, lminA, lmaxA, lminB, lmaxB, dL,
        jnp.asarray(cl_kI), jnp.asarray(cltt), jnp.asarray(clte), jnp.asarray(clee),
        jnp.asarray(clttfid), jnp.asarray(cltefid), jnp.asarray(cleefid),
        jnp.asarray(fal[kA[1]]), jnp.asarray(fal[kA[2]]),
        jnp.asarray(fbl[kB[1]]), jnp.asarray(fbl[kB[2]]))
    return np.asarray(out)[:nL]


def n1L_jtp_batch(Ls, kA, kB, combos, kI, cl_kI, cltt, clte, clee,
                  clttfid, cltefid, cleefid, lminA, lminB, dL, lps):
    """All jtp combinations at once: `combos` is a list of (Xp + Yp + Ip + Jp, FXXp,
    FYYp, FIIp, FJJp) tuples; returns a numpy (ncombo, len(Ls)) array of N1 values
    (one jit call — replaces up to 81 x len(Ls) host-driven n1L_jtp dispatches)."""
    lmaxA = max(len(c[1]) for c in combos)
    lmaxB = max(len(c[3]) for c in combos)
    # legs are zero-padded to common lengths (zero value beyond a leg's own band limit);
    # the CONTINUOUS |l| <= lmax integration cuts ride along as per-combination data
    fmatsA = np.zeros((len(combos), 2, lmaxA))
    fmatsB = np.zeros((len(combos), 2, lmaxB))
    codes = np.zeros((len(combos), 4, 8), dtype=np.int32)
    lmAs = np.zeros(len(combos))
    lmBs = np.zeros(len(combos))
    for i, (fields, fX, fY, fI, fJ) in enumerate(combos):
        Xp, Yp, Ip, Jp = fields
        codes[i] = [wf_code(kI + Xp + Ip), wf_code(kI + Yp + Jp),
                    wf_code(kI + Xp + Jp), wf_code(kI + Yp + Ip)]
        fmatsA[i, 0, :len(fX)] = np.asarray(fX)
        fmatsA[i, 1, :len(fY)] = np.asarray(fY)
        fmatsB[i, 0, :len(fI)] = np.asarray(fI)
        fmatsB[i, 1, :len(fJ)] = np.asarray(fJ)
        lmAs[i] = float(len(fX))
        lmBs[i] = float(len(fI))
    L1s, nphi, nphiH, lps, dlps, ns, nsmax = _grids(lminA, lmaxA, dL, lps)
    out = _n1L_jtp_batch_core(
        jnp.asarray(np.asarray(Ls, dtype=float)), jnp.asarray(codes), kA, kB,
        jnp.asarray(L1s), jnp.asarray(nphi), nphiH, jnp.asarray(lps, dtype=float),
        jnp.asarray(dlps), jnp.asarray(ns), nsmax, lminA, lmaxA, lminB, lmaxB, dL,
        jnp.asarray(cl_kI), jnp.asarray(cltt), jnp.asarray(clte), jnp.asarray(clee),
        jnp.asarray(clttfid), jnp.asarray(cltefid), jnp.asarray(cleefid),
        jnp.asarray(fmatsA), jnp.asarray(fmatsB), jnp.asarray(lmAs), jnp.asarray(lmBs))
    return np.asarray(out).T


def n1L_jtp(L, kA, kB, Xp, Yp, Ip, Jp, kI, cl_kI, cltt, clte, clee,
            clttfid, cltefid, cleefid, fXXp, fYYp, fIIp, fJJp, lminA, lminB, dL, lps):
    """Joint-TP-filtering N1 at a single L (reference: n1f.f90:280-396): the QE legs couple
    to primed fields (Xp, Yp, Ip, Jp) through explicit filtering-matrix elements."""
    lmaxA = len(fXXp)
    lmaxB = len(fIIp)
    k13 = kI + Xp + Ip
    k24 = kI + Yp + Jp
    k14 = kI + Xp + Jp
    k23 = kI + Yp + Ip
    import jax.numpy as jnp
    L1s, nphi, nphiH, lps, dlps, ns, nsmax = _grids(lminA, lmaxA, dL, lps)
    args = (jnp.asarray(cl_kI), jnp.asarray(cltt), jnp.asarray(clte), jnp.asarray(clee),
            jnp.asarray(clttfid), jnp.asarray(cltefid), jnp.asarray(cleefid),
            jnp.asarray(np.asarray(fXXp)), jnp.asarray(np.asarray(fYYp)),
            jnp.asarray(np.asarray(fIIp)), jnp.asarray(np.asarray(fJJp)))
    return _n1L_core(float(L), k13, k24, k14, k23, kA, kB,
                     jnp.asarray(L1s), jnp.asarray(nphi), nphiH,
                     jnp.asarray(lps, dtype=float), jnp.asarray(dlps),
                     jnp.asarray(ns), nsmax, lminA, lmaxA, lminB, lmaxB, dL, *args)
