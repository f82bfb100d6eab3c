"""Property tests for the batched spectral-algebra layer.

Covers: the stacked Wigner contraction engine against per-call wignerc; the basis-matrix
spin algebra against hand-derived spin-basis identities; QE term-algebra invariants
(simplify preserves the symbolic bilinear form); stats helpers (chi^2 / PTE / rebin).
"""
import numpy as np
import pytest

from plancklens_tpu.ops.wigner import wignerc, wignerc_stack
from plancklens_tpu.models import spin as uspin
from plancklens_tpu.models.qe import qeleg, qe, qe_simplify, qe_compress
from plancklens_tpu.models.qecl import stats


def test_wignerc_stack_matches_percall():
    rng = np.random.RandomState(0)
    lmax_out = 40
    specs, refs = [], []
    for (sp1, s1, sp2, s2) in [(0, 0, 0, 0), (1, 0, 1, 0), (2, 2, -1, 0),
                               (1, -2, 2, 2), (0, 0, 3, 2)]:
        cl1 = rng.standard_normal(rng.randint(10, 30) + 1)
        cl2 = rng.standard_normal(rng.randint(10, 30) + 1)
        specs.append((cl1, (sp1, s1), cl2, (sp2, s2)))
        refs.append(wignerc(cl1, cl2, sp1, s1, sp2, s2, lmax_out=lmax_out))
    specs.append((np.zeros(11), (0, 0), np.ones(11), (0, 0)))  # dead row stays zero
    refs.append(np.zeros(lmax_out + 1))
    cl1 = rng.standard_normal(21) + 1j * rng.standard_normal(21)
    cl2 = rng.standard_normal(16)
    specs.append((cl1, (2, 0), cl2, (1, 0)))
    refs.append(wignerc(cl1, cl2, 2, 0, 1, 0, lmax_out=lmax_out))

    got = wignerc_stack(specs, lmax_out)
    assert got.shape == (len(specs), lmax_out + 1)
    for row, ref in zip(got, refs):
        scale = max(np.max(np.abs(ref)), 1e-30)
        assert np.max(np.abs(row - ref)) / scale < 1e-10


def _random_cls(lmax, rng, keys=('tt', 'te', 'ee', 'bb')):
    return {k: rng.standard_normal(lmax + 1) for k in keys}


def test_spin_cls_hand_derived():
    """spin_cls against the spin-basis definitions _0X = T, _pm2 X = -(E pm iB)."""
    rng = np.random.RandomState(1)
    cls = _random_cls(12, rng, keys=('tt', 'te', 'ee', 'bb', 'tb', 'eb'))
    tt, te, ee, bb = cls['tt'], cls['te'], cls['ee'], cls['bb']
    tb, eb = cls['tb'], cls['eb']
    assert np.allclose(uspin.spin_cls(0, 0, cls), tt)
    assert np.allclose(uspin.spin_cls(0, 2, cls), -te + 1j * tb)
    assert np.allclose(uspin.spin_cls(0, -2, cls), -te - 1j * tb)
    assert np.allclose(uspin.spin_cls(2, 0, cls), -te - 1j * tb)
    assert np.allclose(uspin.spin_cls(2, 2, cls), ee + bb)
    assert np.allclose(uspin.spin_cls(2, -2, cls), ee - bb + 2j * eb)
    # reflection property: <_-s1 X _-s2 X*> = (-1)^(s1+s2) conj(<_s1 X _s2 X*>)
    for s1 in (0, 2, -2):
        for s2 in (0, 2, -2):
            lhs = uspin.spin_cls(-s1, -s2, cls)
            rhs = (-1) ** (s1 + s2) * np.conj(uspin.spin_cls(s1, s2, cls))
            assert np.allclose(lhs, rhs), (s1, s2)


def test_spin_matrix_algebra():
    """get_spin_matrix is a similarity transform: it must be multiplicative in the TEB
    matrix, and diagonal TEB input must give the hand-derived entries."""
    rng = np.random.RandomState(2)
    lmax = 10
    fal = {'tt': rng.rand(lmax + 1) + 1., 'ee': rng.rand(lmax + 1) + 1.,
           'bb': rng.rand(lmax + 1) + 1.}
    # diagonal entries
    assert np.allclose(uspin.get_spin_matrix(0, 0, fal), fal['tt'])
    assert np.allclose(uspin.get_spin_matrix(2, 2, fal), 0.5 * (fal['ee'] + fal['bb']))
    assert np.allclose(uspin.get_spin_matrix(2, -2, fal), 0.5 * (fal['ee'] - fal['bb']))
    assert not np.any(uspin.get_spin_matrix(2, 0, fal))
    # multiplicativity: M(F . G) = M(F) M(G) for diagonal F, G (per-l 3x3 products)
    gal = {'tt': rng.rand(lmax + 1), 'ee': rng.rand(lmax + 1), 'bb': rng.rand(lmax + 1)}
    fg = {k: fal[k] * gal[k] for k in fal}
    spins = (0, 2, -2)
    for so in spins:
        for si in spins:
            direct = uspin.get_spin_matrix(so, si, fg)
            composed = sum(np.asarray(uspin.get_spin_matrix(so, s, fal))
                           * np.asarray(uspin.get_spin_matrix(s, si, gal)) for s in spins)
            direct, composed = np.broadcast_arrays(direct, composed)
            assert np.allclose(direct, composed), (so, si)
    # single-letter diagonal keys accepted
    assert np.allclose(uspin.get_spin_matrix(0, 0, {'t': fal['tt']}), fal['tt'])


def _bilinear_form(qes, lmax, Ls):
    """Symbolic value of a QE list: sum over terms of cL(L) x outer(leg_a.cl, leg_b.cl),
    keyed by the four spins. Invariant under any valid term-algebra rewrite."""
    forms = {}
    for q in qes:
        key = (q.leg_a.spin_in, q.leg_a.spin_ou, q.leg_b.spin_in, q.leg_b.spin_ou)
        cla = np.zeros(lmax + 1)
        cla[:len(q.leg_a.cl)] = q.leg_a.cl
        clb = np.zeros(lmax + 1)
        clb[:len(q.leg_b.cl)] = q.leg_b.cl
        contrib = np.einsum('i,j,k->ijk', cla, clb, q.cL(Ls))
        forms[key] = forms.get(key, 0.) + contrib
    return forms


def test_qe_simplify_preserves_bilinear_form():
    rng = np.random.RandomState(3)
    lmax = 6
    Ls = np.arange(4)
    shared = rng.standard_normal(lmax + 1)
    cL1 = lambda L: np.ones(len(L))
    cL2 = lambda L: L * 1.
    qes = [
        qe(qeleg(0, 0, shared.copy()), qeleg(0, 0, rng.standard_normal(lmax + 1)), cL1),
        qe(qeleg(0, 0, shared.copy()), qeleg(0, 0, rng.standard_normal(lmax - 1)), cL1),
        qe(qeleg(0, 0, shared.copy()), qeleg(0, 0, rng.standard_normal(lmax + 1)), cL2),
        qe(qeleg(2, 2, shared.copy()), qeleg(-2, 0, rng.standard_normal(lmax + 1)), cL1),
        qe(qeleg(0, 0, rng.standard_normal(lmax + 1)), qeleg(0, 0, np.zeros(lmax + 1)), cL1),
    ]
    simplified = qe_simplify(qes)
    assert len(simplified) < len(qes)  # terms 1+2 merge, zero term drops
    f0 = _bilinear_form(qes, lmax, Ls)
    f1 = _bilinear_form(simplified, lmax, Ls)
    for key in set(f0) | set(f1):
        a = f0.get(key, np.zeros((lmax + 1, lmax + 1, len(Ls))))
        b = f1.get(key, np.zeros((lmax + 1, lmax + 1, len(Ls))))
        assert np.allclose(a, b), key


def test_qe_compress_groups_shared_first_leg():
    rng = np.random.RandomState(4)
    lmax = 5
    shared = rng.standard_normal(lmax + 1)
    cL = lambda L: np.ones(len(L))
    qes = [qe(qeleg(0, 0, shared.copy()), qeleg(0, 0, rng.standard_normal(lmax + 1)), cL),
           qe(qeleg(0, 0, shared.copy()), qeleg(0, 0, rng.standard_normal(lmax + 1)), cL),
           qe(qeleg(2, 2, shared.copy()), qeleg(-2, 0, rng.standard_normal(lmax + 1)), cL)]
    groups = qe_compress(qes)
    assert len(groups) == 2
    first, fused, _ = groups[0]
    assert len(fused.cls) == 2 and len(first.cls) == 1


def test_stats_chisq_pte_rebin():
    rng = np.random.RandomState(5)
    size, nsamp = 4, 200
    st = stats(size)
    samples = rng.standard_normal((nsamp, size))
    for s in samples:
        st.add(s)
    # unbiased covariance matches numpy's
    assert np.allclose(st.cov(), np.cov(samples.T, ddof=1))
    # chi2 of the mean vector itself is ~0, PTE ~1
    assert st.get_chisq(st.mean()) < 1e-20
    assert st.get_chisq_pte(st.mean()) > 0.999
    # a wildly discrepant point has a tiny PTE
    assert st.get_chisq_pte(st.mean() + 50.) < 1e-6
    # rebin: two bins, unit weights -> bin means of the mean
    coord = np.arange(size)
    rb = st.rebin_that_nooverlap(coord, np.array([0, 2]), np.array([1, 3]))
    assert np.allclose(rb.mean(), [st.mean()[:2].mean(), st.mean()[2:].mean()])
    # rebinned covariance equals covariance of rebinned samples
    reb_samples = np.stack([samples[:, :2].mean(axis=1), samples[:, 2:].mean(axis=1)], axis=1)
    assert np.allclose(rb.cov(), np.cov(reb_samples.T, ddof=1))


def test_binner_bil_parity():
    """_get_bil row extraction agrees with the binning matrix application."""
    pytest.importorskip('jax')
    # covered implicitly by test_bandpowers; here just the pure bin-edge helper
    from plancklens_tpu.models.bandpowers import get_blbubc
    bl, bu, bc = get_blbubc('consext8')
    assert bl[0] == 8 and bu[-1] == 400 and len(bl) == len(bu) == len(bc) == 9
    bl, bu, bc = get_blbubc('10_20_40')
    assert np.all(bl == [10, 20]) and np.all(bu == [19, 40])


def test_mf_resp_consistency():
    """get_mf_resp bookkeeping and scaling: the returned GL must equal the sum of its
    reported terms, the constant-deflection gauge condition must hold (CL * fac vanishes
    at L = 1), and the connected family must scale linearly in the ivf spectra while the
    Fisher family scales quadratically."""
    import os
    import plancklens_tpu
    from plancklens_tpu.utils.cls import camb_clfile, cli
    from plancklens_tpu.models.qresp import get_mf_resp
    lmax_qe, lmax_out = 80, 100
    cls = camb_clfile(os.path.join(plancklens_tpu.DATAPATH, 'cls',
                                   'FFP10_wdipole_lensedCls.dat'), lmax=160)
    nt2 = (35. / 60. / 180. * np.pi) ** 2
    for key, diag in [('ptt', ['tt']), ('p_p', ['ee', 'bb'])]:
        ivfs = {k: cli(cls[k][:lmax_qe + 1] + nt2) for k in diag}
        GL, CL, terms = get_mf_resp(key, cls, ivfs, lmax_qe, lmax_out, retterms=True)
        assert np.all(np.isfinite(GL)) and np.all(np.isfinite(CL))
        total = terms['GK'] + terms['GxiK'] + terms['Gcons']
        assert np.allclose(GL, total, rtol=1e-12), key
        assert abs(CL[1]) <= 1e-10 * max(np.abs(CL).max(), 1e-300), key
        # scaling structure: GL(eps * ivfs) = eps * linear + eps^2 * quadratic
        eps = 1e-3
        GL1 = get_mf_resp(key, cls, {k: eps * v for k, v in ivfs.items()},
                          lmax_qe, lmax_out)[0]
        GL2 = get_mf_resp(key, cls, {k: 2 * eps * v for k, v in ivfs.items()},
                          lmax_qe, lmax_out)[0]
        sel = slice(2, lmax_out)
        ratio = GL2[sel] / GL1[sel]
        assert np.all(np.abs(ratio - 2.) < 0.05), (key, ratio[:5])


def test_dresponse_linearity():
    """The response is linear in the CMB covariance, so the per-multipole log-derivatives
    must sum back to the full response: sum_l dR/dlnC_l^tt == R for a TT-only covariance."""
    import os
    import plancklens_tpu
    from plancklens_tpu.utils.cls import camb_clfile, cli
    from plancklens_tpu.models.qresp import get_response, get_dresponse_dlncl
    lmax = 24
    cls = camb_clfile(os.path.join(plancklens_tpu.DATAPATH, 'cls',
                                   'FFP10_wdipole_lensedCls.dat'), lmax=lmax)
    cls_tt = {'tt': cls['tt'][:lmax + 1]}
    fal = {'tt': cli(cls_tt['tt'] + 1e-4)}
    R = get_response('ptt', lmax, 'p', cls_tt, cls_tt, fal, lmax_qlm=lmax)[0]
    acc = np.zeros(lmax + 1)
    for l in range(lmax + 1):
        acc += get_dresponse_dlncl('ptt', l, 'tt', lmax, 'p', cls_tt, cls_tt, fal,
                                   lmax_out=lmax)[0]
    assert np.allclose(acc[2:], R[2:], rtol=1e-9), np.max(np.abs(acc[2:] / R[2:] - 1))


def test_fundamental_key_grammar_parity():
    """Every fundamental estimator key of the reference grammar (reference:
    plancklens/qest.py:109-111) builds through get_qes, with the pab sub-block
    term counts matching the reference's qe_proj + qe_simplify exactly (verified
    against the reference package run side by side, 2026-08-18) — including the
    physically-empty 'ptb'/'xtb' blocks: the B-projection of the TE-sourced
    second leg cancels in that leg ordering (the T x B information lives in
    'pbt'/'xbt'), and the reference returns the empty list there too."""
    import os
    import plancklens_tpu
    from plancklens_tpu.models import qresp
    from plancklens_tpu.utils import camb_clfile
    lmax = 64
    cls = camb_clfile(os.path.join(plancklens_tpu.DATAPATH, 'cls',
                                   'FFP10_wdipole_lensedCls.dat'), lmax=lmax)
    keys_fund = ['ptt', 'xtt', 'p_p', 'x_p', 'p', 'x', 'stt', 's', 'ftt', 'f_p',
                 'f', 'dtt', 'ntt', 'a_p',
                 'pte', 'pet', 'ptb', 'pbt', 'pee', 'peb', 'pbe', 'pbb',
                 'xte', 'xet', 'xtb', 'xbt', 'xee', 'xeb', 'xbe', 'xbb']
    empty_by_parity = {'ptb', 'xtb'}
    tr = np.ones(lmax + 1)
    for k in keys_fund:
        qes = qresp.get_qes(k, lmax, cls, transf=tr)
        if k in empty_by_parity:
            assert len(qes) == 0, k
        else:
            assert len(qes) > 0, k
    # reference-matched sub-block term counts (same-cls side-by-side run)
    ref_counts = {'ptb': 0, 'pbt': 4, 'pte': 2, 'pet': 4,
                  'peb': 8, 'pbe': 8, 'pbb': 8}
    for k, n in ref_counts.items():
        assert len(qresp.get_qes(k, lmax, cls)) == n, k
