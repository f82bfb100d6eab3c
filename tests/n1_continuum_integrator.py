"""Independent continuum evaluation of the flat-sky N1 (Eq. A.3, arXiv:1807.06210),
midpoint-rule quadrature, pure numpy f64, memory-light (scalar outer loop)."""
import numpy as np
import time

LMIN, LMAX = 2., 60.

def cltt(l):
    return 1. / (l * (l + 1.) + 1.)

def clpp(l):
    # smooth bump: the radial weight lp * clpp peaks at lp ~ 30 with width ~ 30, well
    # resolved by the linear lp grid (a 1/l^4 spectrum concentrates all weight at the
    # first grid cell and defeats fixed-grid quadrature)
    return 1e-2 * np.exp(-0.5 * ((l - 30.) / 30.) ** 2) / (l * (l + 1.) + 1.)

def F(l):
    # smooth band window: no discontinuities, so the midpoint rule converges fast; the
    # kernel sees the same function sampled at integer l
    nt = 2e-4
    win = 0.25 * (1. + np.tanh((l - 8.) / 3.)) * (1. - np.tanh((l - 52.) / 3.))
    return win / (cltt(np.maximum(l, 1e-3)) + nt)

def W(key, ax, bx, ay, by):  # note (x1, x2, y1, y2) order, matching all call sites
    La, Lb = ax + bx, ay + by
    dot_a = La * ax + Lb * ay
    dot_b = La * bx + Lb * by
    if key == 'p':
        la2 = ax*ax + ay*ay; lb2 = bx*bx + by*by
        return cltt(np.sqrt(la2)) * dot_a + cltt(np.sqrt(lb2)) * dot_b
    if key == 'x':
        cross_a = -Lb * ax + La * ay
        cross_b = -Lb * bx + La * by
        return cltt(np.sqrt(ax*ax+ay*ay)) * cross_a + cltt(np.sqrt(bx*bx+by*by)) * cross_b
    if key == 's':
        return np.ones_like(ax)
    raise ValueError(key)

def n1_continuum(L, key, n_r, n_phi, np_r, np_phi, lpmax=120.):
    r1 = np.linspace(LMIN, LMAX, n_r + 1); r1 = 0.5*(r1[1:]+r1[:-1]); dr1 = (LMAX-LMIN)/n_r
    p1 = 2.*np.pi*np.arange(n_phi)/n_phi; dp1 = 2.*np.pi/n_phi
    rp = np.linspace(1., lpmax, np_r + 1); rp = 0.5*(rp[1:]+rp[:-1]); drp = (lpmax-1.)/np_r
    pp = 2.*np.pi*np.arange(np_phi)/np_phi; dpp = 2.*np.pi/np_phi
    ppx = (rp[:,None]*np.cos(pp)[None,:]).ravel()
    ppy = (rp[:,None]*np.sin(pp)[None,:]).ravel()
    wlp = ((rp*drp*dpp)[:,None] * clpp(rp)[:,None] * np.ones((1,np_phi))).ravel()
    tot = 0.
    for l1r in r1:
        l1x_v = l1r*np.cos(p1); l1y_v = l1r*np.sin(p1)
        l2x_v = L - l1x_v; l2y_v = -l1y_v
        wA_v = W(key, l1x_v, l2x_v, l1y_v, l2y_v)
        pref_v = wA_v * F(np.full_like(l1x_v, l1r)) * F(np.sqrt(l2x_v**2+l2y_v**2)) * (l1r*dr1*dp1)
        for i in np.flatnonzero(pref_v):
            l1x, l1y, l2x, l2y = l1x_v[i], l1y_v[i], l2x_v[i], l2y_v[i]
            l3x = ppx - l1x; l3y = ppy - l1y
            l4x = -L - l3x; l4y = -l3y
            # trispectrum pairings, both mapped to the lp = (paired momenta sum)
            # parametrization: term1 = C^pp f(l1,l3) f(l2,l4) W^B(l3,l4) F(l3)F(l4);
            # term2 (lp = l1+l4 relabelled) = C^pp f(l1,l3) f(l2,l4) W^B(l4,l3) F(l4)F(l3)
            w13 = W('p', np.full_like(l3x, l1x), l3x, np.full_like(l3y, l1y), l3y)
            w24 = W('p', np.full_like(l3x, l2x), l4x, np.full_like(l3y, l2y), l4y)
            wB1 = W(key, l3x, l4x, l3y, l4y)
            wB2 = W(key, l4x, l3x, l4y, l3y)
            F3, F4 = F(np.sqrt(l3x**2+l3y**2)), F(np.sqrt(l4x**2+l4y**2))
            inner = np.dot(w13*w24*(wB1 + wB2)*F3*F4, wlp)
            tot += pref_v[i] * inner
    return 0.25 * tot / (2.*np.pi)**4

# ---------------------------------------------------------------- general (jtp) version
def clee(l):
    return 0.3 / (l * (l + 1.) + 1.)


def clte(l):
    return 0.15 / (l * (l + 1.) + 1.)


def W_gen(key, ax, bx, ay, by):
    """Flat-sky QE weight W^key(a, b) for key = source + field pair, from the paper's
    lensing response f_(XY) forms (same math as n1f.f90:1-99, written independently).
    Same (x1, x2, y1, y2) argument order as W."""
    La, Lb = ax + bx, ay + by
    dot_a = La * ax + Lb * ay
    dot_b = La * bx + Lb * by
    la = np.sqrt(ax * ax + ay * ay)
    lb = np.sqrt(bx * bx + by * by)
    dot12 = ax * bx + ay * by
    cross12 = -ay * bx + ax * by
    denom = np.maximum(la * la * lb * lb, 1e-30)
    cos2p = 2. * dot12 ** 2 / denom - 1.
    sin2p = 2. * dot12 * cross12 / denom
    if key == 'ptt':
        return cltt(la) * dot_a + cltt(lb) * dot_b
    if key == 'pee':
        return (clee(la) * dot_a + clee(lb) * dot_b) * cos2p
    if key == 'pte':
        return clte(la) * cos2p * dot_a + clte(lb) * dot_b
    if key == 'pet':
        return clte(lb) * cos2p * dot_b + clte(la) * dot_a
    if key == 'peb':
        return clee(la) * dot_a * sin2p
    if key == 'stt':
        return np.ones_like(ax)
    raise ValueError(key)


def n1_jtp_continuum(L, kA, kB, k13, k24, k14, k23, F1, F2, F3, F4,
                     n_r, n_phi, np_r, np_phi, lpmax=120.):
    """General-pairing continuum N1: distinct source-coupling keys and filter functions
    per leg slot (the joint-TP structure of n1f.f90:280-396 / ops/n1kern.n1L_jtp)."""
    r1 = np.linspace(LMIN, LMAX, n_r + 1); r1 = 0.5*(r1[1:]+r1[:-1]); dr1 = (LMAX-LMIN)/n_r
    p1 = 2.*np.pi*np.arange(n_phi)/n_phi; dp1 = 2.*np.pi/n_phi
    rp = np.linspace(1., lpmax, np_r + 1); rp = 0.5*(rp[1:]+rp[:-1]); drp = (lpmax-1.)/np_r
    pp = 2.*np.pi*np.arange(np_phi)/np_phi; dpp = 2.*np.pi/np_phi
    ppx = (rp[:,None]*np.cos(pp)[None,:]).ravel()
    ppy = (rp[:,None]*np.sin(pp)[None,:]).ravel()
    wlp = ((rp*drp*dpp)[:,None] * clpp(rp)[:,None] * np.ones((1,np_phi))).ravel()
    tot = 0.
    for l1r in r1:
        l1x_v = l1r*np.cos(p1); l1y_v = l1r*np.sin(p1)
        l2x_v = L - l1x_v; l2y_v = -l1y_v
        wA_v = W_gen(kA, l1x_v, l2x_v, l1y_v, l2y_v)
        pref_v = wA_v * F1(np.full_like(l1x_v, l1r)) * F2(np.sqrt(l2x_v**2+l2y_v**2)) \
            * (l1r*dr1*dp1)
        for i in np.flatnonzero(pref_v):
            l1x, l1y, l2x, l2y = l1x_v[i], l1y_v[i], l2x_v[i], l2y_v[i]
            l3x = ppx - l1x; l3y = ppy - l1y
            l4x = -L - l3x; l4y = -l3y
            o1x = np.full_like(l3x, l1x); o1y = np.full_like(l3y, l1y)
            o2x = np.full_like(l3x, l2x); o2y = np.full_like(l3y, l2y)
            w13 = W_gen(k13, o1x, l3x, o1y, l3y)
            w24 = W_gen(k24, o2x, l4x, o2y, l4y)
            w14 = W_gen(k14, o1x, l3x, o1y, l3y)
            w23 = W_gen(k23, o2x, l4x, o2y, l4y)
            wB1 = W_gen(kB, l3x, l4x, l3y, l4y)
            wB2 = W_gen(kB, l4x, l3x, l4y, l3y)
            F3a, F4a = F3(np.sqrt(l3x**2+l3y**2)), F4(np.sqrt(l4x**2+l4y**2))
            F3b, F4b = F3(np.sqrt(l4x**2+l4y**2)), F4(np.sqrt(l3x**2+l3y**2))
            inner = np.dot(wB1*w13*w24*F3a*F4a + wB2*w14*w23*F3b*F4b, wlp)
            tot += pref_v[i] * inner
    return 0.25 * tot / (2.*np.pi)**4


if __name__ == '__main__':
    anchors = [(20., 'p'), (40., 'p'), (30., 's'), (30., 'x')]
    for L, key in anchors:
        t0 = time.time()
        lo = n1_continuum(L, key, 60, 72, 60, 72)
        hi = n1_continuum(L, key, 110, 132, 110, 132)
        print('%s L=%d  lo=%.8e  hi=%.8e  conv=%.2e  (%.0fs)'
              % (key, L, lo, hi, abs(lo/hi-1) if hi else 0, time.time()-t0), flush=True)
