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
    """cl[l-1] lookup with [lmin, lmax] bounds mask (Fortran 1-based convention)."""
    idx = jnp.clip(li - 1, 0, cl.shape[0] - 1)
    ok = (li >= lmin) & (li <= lmax)
    return jnp.where(ok, cl[idx], 0.)


def _wf(k, l1x, l2x, l1y, l2y, l1i, l2i, cltt, clte, clee):
    """QE flat-sky weight functions W^k(l1, l2) (reference: n1f.f90:1-99).

    k is a static 3-char key: source in 'pxsf' + field pair in tt/te/et/tb/bt/ee/eb/be/bb.
    Index arrays l1i/l2i are rounded integer moduli; spectra are (len lmax) arrays.
    """
    ctt = lambda li: _cl_at(cltt, li, 1, cltt.shape[0])
    cte = lambda li: _cl_at(clte, li, 1, clte.shape[0])
    cee = lambda li: _cl_at(clee, li, 1, clee.shape[0])
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


@partial(jax.jit, static_argnums=(1, 2, 3, 4, 5, 6, 9, 13, 14, 15, 16, 17, 18))
def _n1L_core(L, k13, k24, k14, k23, kA, kB, L1s, nphi, nphiH, lps, dlps, ns, nsmax,
              lminA, lmaxA, lminB, lmaxB, dL,
              cl_kI, cltt, clte, clee, clttfid, cltefid, cleefid, fal1, fal2, fal3, fal4):
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
        ok2 = (L2 >= lminA) & (L2 <= lmaxA)
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
        ok34 = (L3 >= lminB) & (L3 <= lmaxB) & (L4 >= lminB) & (L4 <= lmaxB)
        l1xb = jnp.broadcast_to(L1x[:, None, None], L3x.shape)
        l1yb = jnp.broadcast_to(L1y[:, None, None], L3x.shape)
        l2xb = jnp.broadcast_to(L2x[:, None, None], L3x.shape)
        l2yb = jnp.broadcast_to(L2y[:, None, None], L3x.shape)
        l1ib = jnp.broadcast_to(L1i, L3i.shape)  # L1i is scalar within a scan step
        l2ib = jnp.broadcast_to(L2i[:, None, None], L3i.shape)
        w13 = _wf(k13, l1xb, L3x, l1yb, L3y, l1ib, L3i, cltt, clte, clee)
        w24 = _wf(k24, l2xb, L4x, l2yb, L4y, l2ib, L4i, cltt, clte, clee)
        w14 = _wf(k14, l1xb, L3x, l1yb, L3y, l1ib, L3i, cltt, clte, clee)
        w23 = _wf(k23, l2xb, L4x, l2yb, L4y, l2ib, L4i, cltt, clte, clee)
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
