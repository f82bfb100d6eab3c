r"""Exact HEALPix pixel window functions.

Replaces the azimuthally-averaged tophat model (kept as :func:`pixwin_tophat`) with the
exact per-pixel boundary integral, the role of healpy's tabulated ``hp.pixwin`` files
(reference usage: plancklens parfiles multiply the beam by hp.pixwin(nside), e.g. the
smica DX12 config; here params/smica_dx12_planck2018.py:65).

Definition (Gorski et al. 2005): with per-pixel integrals w_lm(p) = int_p Y*_lm dOmega,

    W_l^2 = 4 pi / ((2l+1) Npix Omega_pix^2) * sum_p sum_m |w_lm(p)|^2,

so W_0 = 1 and C_l^pixelized ~= W_l^2 C_l.  The same formula with spin-2 harmonics
(n = +-2 analysis legs) gives the polarisation window (healpy's pixwin(pol=True)).

Method, TPU-shaped rather than per-pixel:
  * HEALPix pixels are congruent diamonds in the equal-area HPX projection
    (equatorial belt |y| <= pi/4: x = phi, y = 3 pi z / 8; polar caps: with
    sigma = sqrt(3 (1 - |z|)), y = +-pi/4 (2 - sigma), x = phi_c + (phi - phi_c) sigma
    about the face centre phi_c).  A pixel is the diamond |x - x_c| + |y - y_c| <= h,
    h = pi / (4 nside).
  * At fixed y the pixel's phi extent is an interval, so the phi part of w_lm is
    analytic: F_m(y) = int e^{-i m phi} dphi = 2 e^{-i m phi_ctr} sin(m phi_hw) / m.
  * The remaining latitude integral is Gauss-Legendre over the (piecewise smooth)
    y-segments, and sum_k c_k lambda_lm(theta_k) F_m(y_k) is exactly the contraction the
    SHT engine's Legendre-scan analysis performs: each ring of pixel shapes becomes one
    batched :func:`core.legendre_anal` call (nodes play the role of rings, F_m the ring
    Fourier data).  All the Wigner-d work rides the existing scan/GEMM kernels.
  * Pixels within a ring are azimuthal rotations / reflections of at most ceil(i/2)
    distinct shapes (exactly 1 in the equatorial belt), and southern rings mirror
    northern ones, so only ~nside^2/4 shape integrals are evaluated, each shape once
    with its multiplicity.

Exactness and scale: the evaluation is exact (to quadrature accuracy ~1e-12) for any
nside, with cost ~ nside^2/4 shapes x nodes x nlm.  Like the HEALPix team's own data
files - which are computed exactly only up to nside = 128 and extrapolated above (see
the HEALPix pixel_window data README) - :func:`pixwin` evaluates exactly for
nside <= 128; above, instead of healpy's plain self-similar rescale (measured at
~1.7e-3 relative error at l = 4 nside: the shape still carries a c(x)/nside
deviation from its limit, c constant to 3 digits across nside 8..64), it Richardson-
extrapolates the 1/nside term away using the exact 64 + 128 tables, ~1e-6 relative
(see :func:`pixwin`).  Precomputed tables for nside 8..128 ship in data/pixwin.
"""
import os
import numpy as np
import jax

from .core import legendre_anal
from .transforms import _facl

_EXACT_NSIDE_MAX = 128     # exact evaluation bound of the shipped scheme (healpy parity)
_TABLE_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))), 'data', 'pixwin')
_MEM_CACHE = {}


def _ring_shapes(nside, i):
    """Distinct pixel shapes of northern ring i (1-based) as (x_offset_index d, mult).

    Cap rings (i <= nside, including the straddling bottom row of the cap faces at
    i = nside): pixel centres sit at x_c = d h off the face centre, d = a - b with
    a + b = i - 1; reflections d -> -d and the 4-fold face symmetry make |d| the shape
    label.  Belt rings: all 4 nside pixels are congruent (x translation only)."""
    if i <= nside:
        return [(d, 4 if d == 0 else 8) for d in range(i - 1, -1, -2)]
    return [(0, 4 * nside)]


def _ring_nodes(nside, i, k):
    """Latitude quadrature nodes shared by all shapes of northern ring i.

    Returns (y, gw, theta): 4 GL segments of k nodes between the diamond's vertices,
    split at the waist y_c (kink of the width function) and at the segment midpoints;
    for the cap-face bottom row (i = nside) the waist coincides with the belt/cap zone
    boundary y = pi/4, so the piecewise projection map never crosses a segment."""
    from ..gauleg import gauleg
    h = np.pi / (4. * nside)
    y_c = np.pi / 2. - i * h
    edges = np.array([y_c - h, y_c - 0.5 * h, y_c, y_c + 0.5 * h, y_c + h])
    xg, wg = gauleg(k)
    y = np.concatenate([(0.5 * (a + b) + 0.5 * (b - a) * xg)
                        for a, b in zip(edges[:-1], edges[1:])])
    gw = np.concatenate([0.5 * (b - a) * wg for a, b in zip(edges[:-1], edges[1:])])
    cap = y > np.pi / 4. + 1e-14
    sigma = np.where(cap, 2. - 4. * y / np.pi, 1.)
    z = np.where(cap, 1. - sigma ** 2 / 3., 8. * y / (3. * np.pi))
    jac = 8. / (3. * np.pi) * np.where(cap, sigma, 1.)
    theta = np.arccos(np.clip(z, -1., 1.))
    return y, y_c, gw * jac, sigma, cap, theta


def _ring_Gm(nside, i, mmax, k=12):
    """Ring Fourier data G (nshapes, nnodes, mmax+1) and theta for northern ring i:
    G[s, j, m] = c_j * int_{pixel s phi-interval at node j} e^{-i m phi} dphi."""
    shapes = _ring_shapes(nside, i)
    y, y_c, cw, sigma, cap, theta = _ring_nodes(nside, i, k)
    h = np.pi / (4. * nside)
    whw = h - np.abs(y - y_c)                       # projection half-width at node
    ms = np.arange(mmax + 1, dtype=np.float64)
    # int_{phi_c-hw}^{phi_c+hw} e^{-im phi} dphi = 2 e^{-im phi_c} sin(m hw)/m: only
    # the phase depends on the shape offset d, so weight x amplitude is hoisted
    phi_hw = whw / sigma                            # sphere half-width (sigma=1 in belt)
    amp = np.where(ms[None, :] > 0,
                   2. * np.sin(ms[None, :] * phi_hw[:, None])
                   / np.where(ms[None, :] > 0, ms[None, :], 1.),
                   2. * phi_hw[:, None])
    wamp = cw[:, None] * amp
    G = np.empty((len(shapes), len(y), mmax + 1), dtype=np.complex128)
    for s, (d, _) in enumerate(shapes):
        phi_c = (d * h) / sigma                     # sphere centre offset (phi_face = 0)
        G[s] = wamp * np.exp(-1j * ms[None, :] * phi_c[:, None])
    return G, theta, np.array([m for _, m in shapes], dtype=np.float64)


def _pad_pow2(n):
    p = 1
    while p < n:
        p *= 2
    return p


def _sum_m_sq(A, n):
    """sum over the full m in [-l, l] of |w_lm|^2 from the m >= 0 analysis outputs.

    For a real integration region, |w_{l,-m}| = |w_lm| at spin 0 (fold m > 0 twice);
    at spin n != 0, |w^{(n)}_{l,-m}| = |w^{(-n)}_{l,m}|, so the caller sums the two
    +-n legs over m >= 1 and the (leg-equal) m = 0 term is halved here to land once."""
    if n == 0:
        return np.abs(A[..., 0]) ** 2 + 2. * np.sum(np.abs(A[..., 1:]) ** 2, axis=-1)
    return 0.5 * np.abs(A[..., 0]) ** 2 + np.sum(np.abs(A[..., 1:]) ** 2, axis=-1)


def pixwin_exact(nside, lmax=None, pol=False, k=12, dtype=np.float64):
    """Exact pixel window by the per-shape boundary integral (see module docstring).

    Cost grows as nside^2 shape integrals; intended for nside <= 128 (like the exact
    regime of healpy's own tables) - :func:`pixwin` handles larger nside by rescaling.

    Returns W_l (lmax+1,) for pol=False, else (W_l^T, W_l^P)."""
    nside = int(nside)
    if lmax is None:
        lmax = 4 * nside
    if not jax.config.jax_enable_x64 and np.dtype(dtype) == np.float64:
        dtype = np.float32
    npix = 12 * nside ** 2
    omega = 4. * np.pi / npix
    legs = (0,) if not pol else (0, 2, -2)
    tot = {n: np.zeros(lmax + 1) for n in legs}
    fac = np.asarray(_facl(lmax))[:, None]
    for i in range(1, 2 * nside + 1):
        G, theta, mult = _ring_Gm(nside, i, lmax, k=k)
        nb = _pad_pow2(G.shape[0])
        if nb != G.shape[0]:
            G = np.concatenate([G, np.zeros((nb - G.shape[0],) + G.shape[1:],
                                            dtype=G.dtype)], axis=0)
        wring = 2. if i < 2 * nside else 1.    # southern mirror rings
        for n in legs:
            A = np.asarray(legendre_anal(G, n, theta, lmax, grid_token=None,
                                         dtype=dtype)) * fac
            S = _sum_m_sq(A[:len(mult)], n)    # (nshapes, lmax+1)
            tot[n] += wring * np.einsum('s,sl->l', mult, S)
    ls = np.arange(lmax + 1, dtype=np.float64)
    norm = 4. * np.pi / ((2. * ls + 1.) * npix) / omega ** 2
    wt = np.sqrt(norm * tot[0])
    if not pol:
        return wt
    wp = np.sqrt(norm * (tot[2] + tot[-2]))
    return wt, wp


def pixwin_tophat(nside, lmax):
    """Closed-form azimuthally-averaged circular-tophat model of the pixel window:
    W_l = (P_{l-1}(x0) - P_{l+1}(x0)) / ((2l+1)(1-x0)), x0 = 1 - Omega_pix / (2 pi).
    Sub-percent for l <~ 2 nside; kept as the dependency-free cross-check of the exact
    evaluation (pre-round-5 behaviour of :func:`pixwin`)."""
    from scipy.special import eval_legendre
    x0 = 1. - (4. * np.pi / (12 * nside ** 2)) / (2. * np.pi)
    ls = np.arange(lmax + 1)
    pm1 = np.where(ls == 0, 1., eval_legendre(np.maximum(ls - 1, 0), x0))
    pp1 = eval_legendre(ls + 1, x0)
    return (pm1 - pp1) / (2. * ls + 1.) / (1. - x0)


def _exact_table(nside, pol=False):
    """Exact W table to lmax = 4 nside, from the shipped file or computed and
    memory-cached (nside <= _EXACT_NSIDE_MAX)."""
    key = (int(nside), bool(pol))
    if key in _MEM_CACHE:
        return _MEM_CACHE[key]
    fn = os.path.join(_TABLE_DIR, 'pixwin_n%04d%s.npy' % (nside, '_pol' if pol else ''))
    if os.path.exists(fn):
        out = np.load(fn)
        out = tuple(out) if pol else out
    else:
        out = pixwin_exact(nside, 4 * nside, pol=pol)
        # write-back so the exact evaluation is paid at most once per install — but
        # only at full precision: without x64 the evaluation ran at f32 (~1e-7), and
        # persisting it would poison later f64 runs with a degraded "exact" table
        if jax.config.jax_enable_x64:
            try:
                os.makedirs(_TABLE_DIR, exist_ok=True)
                # atomic write-back (tmp + rename): a kill mid-save must not leave a
                # truncated .npy that poisons every later pixwin call for this nside
                tmp = fn[:-len('.npy')] + '.tmp%d.npy' % os.getpid()  # np.save appends .npy otherwise
                np.save(tmp, np.stack(out) if pol else out)
                os.replace(tmp, fn)
            except OSError:
                pass
    _MEM_CACHE[key] = out
    return out


def _spline_x(table, nside_tab, x, pol_leg=False):
    """Cubic spline of an exact table onto the self-similar coordinate x = l / nside.

    For a pol table the l < 2 zeros are a mode-counting artifact of the tabulating
    nside, not a shape property (the self-similar x -> 0 limit is 1): spline through
    [x=0: 1] + the l >= 2 entries."""
    from scipy.interpolate import CubicSpline
    xs = np.arange(len(table), dtype=np.float64) / nside_tab
    if pol_leg:
        return CubicSpline(np.concatenate([[0.], xs[2:]]),
                           np.concatenate([[1.], table[2:]]))(x)
    return CubicSpline(xs, table)(x)


def pixwin(nside, lmax, pol=False):
    """HEALPix pixel window W_l (temperature, plus polarisation when pol=True), the
    role of healpy's hp.pixwin.

    nside <= 128: exact boundary-integral evaluation (shipped tables for nside
    8..128, computed-and-cached otherwise).  nside > 128: Richardson extrapolation
    in 1/nside of the exact 64 and 128 tables on the self-similar coordinate
    x = l/nside — the window obeys W_nside(x) = W_inf(x) + c(x)/nside to high
    accuracy (the measured l=4 nside deviation-from-limit coefficient c ~ 0.11 is
    constant to 3 digits from nside 8 to 64), so eliminating the 1/nside term gives
    ~1e-6 relative accuracy where healpy's plain self-similar rescale of its own
    exact-to-128 data leaves ~1e-3 (measured by predicting the exact nside-128 table
    from the 32/64 pair: 6e-6 max; tests/test_pixwin.py pins this).
    lmax must be <= 4 nside (the tabulated band, as for healpy)."""
    nside, lmax = int(nside), int(lmax)
    assert lmax <= 4 * nside, (lmax, nside, 'pixel window tabulated to 4 nside only')
    if nside <= _EXACT_NSIDE_MAX:
        t = _exact_table(nside, pol=pol)
        return tuple(a[:lmax + 1] for a in t) if pol else t[:lmax + 1]
    base, half = _EXACT_NSIDE_MAX, _EXACT_NSIDE_MAX // 2
    tb = _exact_table(base, pol=pol)
    th = _exact_table(half, pol=pol)
    x = np.arange(lmax + 1, dtype=np.float64) / nside

    def _richardson(wb, wh, pol_leg=False):
        fb = _spline_x(wb, base, x, pol_leg=pol_leg)
        fh = _spline_x(wh, half, x, pol_leg=pol_leg)
        cx = (fh - fb) / (1. / half - 1. / base)
        return (fb - cx / base) + cx / nside

    if pol:
        wt = _richardson(tb[0], th[0])
        wp = _richardson(tb[1], th[1], pol_leg=True)
        wp[:min(2, lmax + 1)] = 0.
        return wt, wp
    return _richardson(tb, th)
