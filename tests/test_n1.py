"""N1 kernel: vectorised JAX integrand vs a direct loop transcription of the quadrature
(reference flow: plancklens/n1/n1f.f90:129-277), plus symmetry and physics sanity."""
import numpy as np
import pytest

from plancklens_tpu.ops import n1kern


def _wf_np(k, l1x, l2x, l1y, l2y, l1i, l2i, cltt, clte, clee):
    def at(cl, i):
        return cl[i - 1] if 1 <= i <= len(cl) else 0.
    l1sq, l2sq = l1x ** 2 + l1y ** 2, l2x ** 2 + l2y ** 2
    dot, cross = l1x * l2x + l1y * l2y, -l1y * l2x + l1x * l2y
    cos2p = 2. * dot ** 2 / (l1sq * l2sq) - 1.
    sin2p = 2. * dot * cross / (l1sq * l2sq)
    Lql1 = (l1x + l2x) * l1x + (l1y + l2y) * l1y
    Lql2 = (l1x + l2x) * l2x + (l1y + l2y) * l2y
    Lxl1 = -(l1y + l2y) * l1x + (l1x + l2x) * l1y
    Lxl2 = -(l1y + l2y) * l2x + (l1x + l2x) * l2y
    if k == 'ptt':
        return at(cltt, l1i) * Lql1 + at(cltt, l2i) * Lql2
    if k == 'pee':
        return (at(clee, l1i) * Lql1 + at(clee, l2i) * Lql2) * cos2p
    if k == 'peb':
        return at(clee, l1i) * Lql1 * sin2p
    if k == 'pbe':
        return at(clee, l2i) * Lql2 * (-sin2p)
    if k == 'pte':
        return at(clte, l1i) * cos2p * Lql1 + at(clte, l2i) * Lql2
    if k == 'pet':
        return at(clte, l2i) * cos2p * Lql2 + at(clte, l1i) * Lql1
    if k == 'ptb':
        return at(clte, l1i) * Lql1 * sin2p
    if k == 'pbt':
        return at(clte, l2i) * Lql2 * (-sin2p)
    if k == 'xtt':
        return at(cltt, l1i) * Lxl1 + at(cltt, l2i) * Lxl2
    if k == 'stt':
        return 1.
    if k == 'ftt':
        return at(cltt, l1i) + at(cltt, l2i)
    if k in ('pbb', 'see', 'ste', 'set', 'stb', 'sbt', 'seb', 'sbe'):
        return 0.
    raise ValueError(k)


def _n1L_loop(L, kA, kB, kI, cl_kI, cltt, clte, clee, clttf, cltef, cleef,
              ftlA, felA, fblA, ftlB, felB, fblB, lminA, lminB, dL, lps):
    lmaxA, lmaxB = len(ftlA), len(ftlB)
    falA = {'t': ftlA, 'e': felA, 'b': fblA}
    falB = {'t': ftlB, 'e': felB, 'b': fblB}
    fal1, fal2 = falA[kA[1]], falA[kA[2]]
    fal3, fal4 = falB[kB[1]], falB[kB[2]]
    k13, k24 = kI + kA[1] + kB[1], kI + kA[2] + kB[2]
    k14, k23 = kI + kA[1] + kB[2], kI + kA[2] + kB[1]
    lps = np.asarray(lps, dtype=int)
    dlps = np.empty(len(lps))
    dlps[0] = lps[1] - lps[0]
    dlps[1:-1] = 0.5 * (lps[2:] - lps[:-2])
    dlps[-1] = lps[-1] - lps[-2]
    Lx, Ly = float(L), 0.
    tot = 0.
    for L1i in range(max(lminA, dL // 2), lmaxA + 1, dL):
        L1 = float(L1i)
        nphi = 2 * L1i + 1
        if L1i > 3 * dL:
            nphi = 2 * int(np.rint(0.5 * L1i / dL)) + 1
        dphi = 2. * np.pi / nphi
        for px in range(0, (nphi - 1) // 2 + 1):
            phi = dphi * px
            L1x, L1y = L1 * np.cos(phi), L1 * np.sin(phi)
            L2x, L2y = Lx - L1x, Ly - L1y
            L2 = np.hypot(L2x, L2y)
            if not (lminA <= L2 <= lmaxA):
                continue
            L2i = int(np.rint(L2))
            for ip, PhiLi in enumerate(lps):
                dPh = dlps[ip]
                nps = 2 * PhiLi + 1
                if PhiLi > 20:
                    nps = 2 * int(np.rint(0.5 * nps / dPh)) + 1
                dps = 2. * np.pi / nps
                fac = (dps * PhiLi * dPh) * (dphi * L1 * dL) / (2. * np.pi) ** 4 * 0.25
                if px != 0:
                    fac *= 2.
                fac *= _wf_np(kA, L1x, L2x, L1y, L2y, L1i, L2i, clttf, cltef, cleef)
                fac *= fal1[L1i - 1] * fal2[L2i - 1]
                for jx in range(-(nps - 1) // 2, (nps - 1) // 2 + 1):
                    pp = dps * jx
                    PhiLx, PhiLy = PhiLi * np.cos(pp), PhiLi * np.sin(pp)
                    L3x, L3y = PhiLx - L1x, PhiLy - L1y
                    L3 = np.hypot(L3x, L3y)
                    if not (lminB <= L3 <= lmaxB):
                        continue
                    L3i = int(np.rint(L3))
                    L4x, L4y = -Lx - L3x, -Ly - L3y
                    L4 = np.hypot(L4x, L4y)
                    if not (lminB <= L4 <= lmaxB):
                        continue
                    L4i = int(np.rint(L4))
                    t1 = (_wf_np(kB, L3x, L4x, L3y, L4y, L3i, L4i, clttf, cltef, cleef)
                          * _wf_np(k13, L1x, L3x, L1y, L3y, L1i, L3i, cltt, clte, clee)
                          * _wf_np(k24, L2x, L4x, L2y, L4y, L2i, L4i, cltt, clte, clee)
                          * fal3[L3i - 1] * fal4[L4i - 1])
                    t2 = (_wf_np(kB, L4x, L3x, L4y, L3y, L4i, L3i, clttf, cltef, cleef)
                          * _wf_np(k14, L1x, L3x, L1y, L3y, L1i, L3i, cltt, clte, clee)
                          * _wf_np(k23, L2x, L4x, L2y, L4y, L2i, L4i, cltt, clte, clee)
                          * fal3[L4i - 1] * fal4[L3i - 1])
                    tot += (t1 + t2) * fac * cl_kI[PhiLi - 1]
    return tot


@pytest.mark.parametrize('keys', [('ptt', 'ptt', 'p'), ('pee', 'pee', 'p'),
                                  ('peb', 'peb', 'p'), ('ptt', 'pee', 'p'),
                                  ('stt', 'stt', 'p'), ('ftt', 'ftt', 'p')])
def test_n1_vectorized_vs_loop(keys):
    kA, kB, kI = keys
    lmax = 120
    rng = np.random.RandomState(0)
    ls = np.arange(1, lmax + 1, dtype=float)
    cltt = 1e3 / ls ** 2
    clee = 1e2 / ls ** 2
    clte = 3e2 / ls ** 2
    clpp = 1e-8 / ls ** 4
    ftl = 1. / (cltt + 1e-3)
    fel = 1. / (clee + 2e-3)
    fbl = 1. / (0 * clee + 2e-3)
    lps = np.array([1, 2, 12, 22, 42, 62, 82, 102])
    args = (clpp, cltt, clte, clee, cltt, clte, clee,
            ftl, fel, fbl, ftl, fel, fbl, 2, 2, 20, lps)
    for L in [10, 57]:
        ref = _n1L_loop(L, kA, kB, kI, *args)
        got = float(n1kern.n1L(L, kA, kB, kI, *args))
        assert np.isclose(got, ref, rtol=1e-10, atol=1e-30), (keys, L, got, ref)


def test_n1_symmetry():
    lmax = 100
    ls = np.arange(1, lmax + 1, dtype=float)
    cltt = 1e3 / ls ** 2
    clee, clte = 1e2 / ls ** 2, 3e2 / ls ** 2
    clpp = 1e-8 / ls ** 4
    ftl = 1. / (cltt + 1e-3)
    fel = 1. / (clee + 2e-3)
    fbl = 1. / (0 * clee + 2e-3)
    lps = np.array([1, 2, 12, 32, 62, 92])
    args = dict(cl_kI=clpp, cltt=cltt, clte=clte, clee=clee, clttfid=cltt, cltefid=clte,
                cleefid=clee, ftlA=ftl, felA=fel, fblA=fbl, ftlB=ftl, felB=fel, fblB=fbl,
                lminA=2, lminB=2, dL=20, lps=lps)
    # kA<->kB is only symmetric in the continuum limit; the discretisation follows the
    # A-legs, which is why the reference canonicalises the key order
    # (reference: plancklens/n1/n1.py:187-189). Check the swapped call against the loop.
    a = float(n1kern.n1L(40, 'pee', 'ptt', 'p', **args))
    b = _n1L_loop(40, 'pee', 'ptt', 'p', args['cl_kI'], args['cltt'], args['clte'],
                  args['clee'], args['clttfid'], args['cltefid'], args['cleefid'],
                  args['ftlA'], args['felA'], args['fblA'], args['ftlB'], args['felB'],
                  args['fblB'], args['lminA'], args['lminB'], args['dL'], args['lps'])
    assert np.isclose(a, b, rtol=1e-10), (a, b)


def test_n1_jtp_diagonal_limit_matches_sep():
    """get_n1_jtp with a diagonal filtering matrix must reproduce the sep-TP get_n1
    exactly (same kernel calls select only the unprimed-field combinations), and adding a
    TE coupling must change the answer (the joint path actually activates)."""
    from plancklens_tpu.models.n1 import N1Lib
    lmax = 120
    ls = np.arange(1, lmax + 1, dtype=float)
    cltt = 1e3 / ls ** 2
    clee = 1e2 / ls ** 2
    clte = 3e2 / ls ** 2
    clpp = 1e-8 / ls ** 4
    ftl = 1. / (cltt + 1e-3)
    fel = 1. / (clee + 2e-3)
    zeros = np.zeros(lmax)
    lps = np.array([1, 2, 12, 22, 42, 62, 82, 102])
    lib = N1Lib(cltt, clte, clee, lmaxphi=lmax, dL=20, lps=lps)
    Lmax = 60
    for key, fal, sep_f in [('ptt', {'tt': ftl}, (ftl, zeros, zeros)),
                            ('pee', {'ee': fel}, (zeros, fel, zeros)),
                            ('p_p', {'ee': fel, 'bb': fel}, (zeros, fel, fel))]:
        sep = lib.get_n1(key, 'p', clpp, *sep_f, Lmax)
        jtp = lib.get_n1_jtp(key, 'p', clpp, fal, Lmax)
        assert np.allclose(jtp, sep, rtol=1e-12, atol=0), key
    # TE-coupled filter changes the TT estimator's N1
    jtp_diag = lib.get_n1_jtp('ptt', 'p', clpp, {'tt': ftl}, Lmax)
    jtp_te = lib.get_n1_jtp('ptt', 'p', clpp, {'tt': ftl, 'te': 0.3 * ftl}, Lmax)
    assert not np.allclose(jtp_te, jtp_diag)


def test_wf_coded_matches_static():
    """The data-driven coefficient-coded weight evaluator must reproduce the static-key
    weight functions bit-for-bit for every source x field-pair key (this is what makes
    the jtp combination batch one vmappable XLA program)."""
    import jax.numpy as jnp
    rng = np.random.RandomState(0)
    shp = (7, 5)
    l1x, l2x, l1y, l2y = [jnp.asarray(rng.uniform(-300, 300, shp)) for _ in range(4)]
    l1i = jnp.asarray(rng.randint(1, 400, shp))
    l2i = jnp.asarray(rng.randint(1, 400, shp))
    cltt, clte, clee = [jnp.asarray(rng.standard_normal(400)) for _ in range(3)]
    for src in 'pxsf':
        for pair in ('tt', 'te', 'et', 'tb', 'bt', 'ee', 'eb', 'be', 'bb'):
            k = src + pair
            a = np.asarray(n1kern._wf(k, l1x, l2x, l1y, l2y, l1i, l2i,
                                      cltt, clte, clee))
            b = np.asarray(n1kern._wf_coded(jnp.asarray(n1kern.wf_code(k)),
                                            l1x, l2x, l1y, l2y, l1i, l2i,
                                            cltt, clte, clee))
            assert np.allclose(a, b, rtol=1e-12, atol=1e-12), k


def test_n1L_batch_matches_per_L():
    """The one-program chunk-vmapped knot vector must equal the per-L kernel calls."""
    rng = np.random.RandomState(0)
    lmax, dL = 120, 20
    cl = np.abs(rng.standard_normal(lmax)) + .1
    clte = rng.standard_normal(lmax) * .1
    f = 1. / (np.abs(rng.standard_normal(lmax)) + .5)
    lps = np.array([1, 10, 30, 60, 120])
    Ls = np.array([2., 10., 40., 80., 110., 120.])
    for kA, kB in (('ptt', 'ptt'), ('peb', 'pee'), ('xtt', 'ptt'), ('stt', 'stt')):
        ref = np.array([float(n1kern.n1L(
            L, kA, kB, 'p', cl, cl, clte, cl, cl, clte, cl,
            f, f, f, f, f, f, 2, 2, dL, lps)) for L in Ls])
        bat = n1kern.n1L_batch(Ls, kA, kB, 'p', cl, cl, clte, cl, cl, clte, cl,
                               f, f, f, f, f, f, 2, 2, dL, lps, chunk=4)
        assert np.allclose(ref, bat, rtol=1e-10, atol=1e-30), (kA, kB)


def test_n1L_jtp_batch_matches_per_L():
    """The spec-batched all-combinations program must equal the per-combination,
    per-L jtp kernel calls, including legs of unequal band limits (zero-padding)."""
    rng = np.random.RandomState(1)
    lmax, dL = 100, 20
    cl = np.abs(rng.standard_normal(lmax)) + .1
    clte = rng.standard_normal(lmax) * .1
    lps = np.array([1, 10, 30, 60, 100])
    Ls = np.array([2., 20., 60., 100.])
    combos = []
    for i, fields in enumerate(('ttee', 'tetb', 'ebte', 'bbtt')):
        n = lmax if i != 1 else lmax - 30   # one combo with a shorter A-side leg
        fs = [1. / (np.abs(rng.standard_normal(n)) + .5) for _ in range(2)] \
            + [1. / (np.abs(rng.standard_normal(lmax)) + .5) for _ in range(2)]
        if i == 2:                          # and one with UNEQUAL B-side legs:
            fs[3] = fs[3][:lmax - 25]       # len(fJ) < len(fI) = lmaxB, so the single-
            # call path must read the missing fJ band as zero (not a clamped last
            # entry) to agree with the batch kernel's explicit zero-padding
        combos.append((fields,) + tuple(fs))
    bat = n1kern.n1L_jtp_batch(Ls, 'ptt', 'ptt', combos, 'p', cl, cl, clte, cl,
                               cl, clte, cl, 1, 1, dL, lps)
    for i, (fields, fX, fY, fI, fJ) in enumerate(combos):
        Xp, Yp, Ip, Jp = fields
        ref = np.array([float(n1kern.n1L_jtp(
            L, 'ptt', 'ptt', Xp, Yp, Ip, Jp, 'p', cl, cl, clte, cl, cl, clte, cl,
            fX, fY, fI, fJ, 1, 1, dL, lps)) for L in Ls])
        assert np.allclose(ref, bat[i], rtol=1e-9, atol=1e-30), fields
