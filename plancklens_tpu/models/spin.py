r"""Spin-weight algebra for CMB fields.

Conventions (same physics as the reference, cf. plancklens/utils_spin.py:1-16):
:math:`_{\pm|s|}X_{lm} = -(\pm)^{|s|}(G_{lm} \pm i C_{lm})` with
:math:`G^0_{lm} = -T_{lm}`, :math:`G^2_{lm} = E_{lm}`, :math:`C^2_{lm} = B_{lm}`, i.e.

.. math::
    {}_0X = T, \qquad {}_{+2}X = -(E + iB), \qquad {}_{-2}X = -(E - iB).

Everything in this module is linear algebra with the single constant matrix ``B`` encoding
that change of basis, applied per multipole to the (T, E, B) spectral matrix:

* ``spin_cls(s1, s2)``  = congruence transform  :math:`(B\,C\,B^\dagger)_{s_1 s_2}` of the
  TEB covariance C — the cross-spectrum :math:`\langle {}_{s_1}X\, {}_{s_2}X^*\rangle`;
* ``get_spin_matrix(sout, sin)`` = similarity transform :math:`(B\,F\,B^{-1})_{s_{\rm out}
  s_{\rm in}}` of a TEB-basis filtering matrix F.

Functional parity with reference plancklens/utils_spin.py:96-196; the implementation is a
3x3 contraction over stacked spectra instead of a per-case ladder.
"""
import numpy as np

# spin components are ordered (0, +2, -2) in all 3x3 matrices below
_SLOT = {0: 0, 2: 1, -2: 2}

# B maps (T, E, B) onto (_0X, _+2X, _-2X); rows follow _SLOT
_B = np.array([[1., 0., 0.],
               [0., -1., -1j],
               [0., -1., +1j]], dtype=complex)
# closed-form inverse: T = _0X, E = -(_+2X + _-2X)/2, B = i(_+2X - _-2X)/2
_BINV = np.array([[1., 0., 0.],
                  [0., -0.5, -0.5],
                  [0., 0.5j, -0.5j]], dtype=complex)


def get_spin_raise(s, lmax):
    r"""Eigenvalue :math:`\sqrt{(l-s)(l+s+1)}` of the spin-raising operator on spin-s
    harmonics, zero below l = \|s\|."""
    ret = np.zeros(lmax + 1, dtype=float)
    ls = np.arange(abs(s), lmax + 1, dtype=float)
    ret[abs(s):] = np.sqrt((ls - s) * (ls + s + 1.))
    return ret


def get_spin_lower(s, lmax):
    r"""Eigenvalue :math:`-\sqrt{(l+s)(l-s+1)}` of the spin-lowering operator."""
    ret = np.zeros(lmax + 1, dtype=float)
    ls = np.arange(abs(s), lmax + 1, dtype=float)
    ret[abs(s):] = -np.sqrt((ls + s) * (ls - s + 1.))
    return ret


def _teb_stack(cls, diag_letters=False):
    """(3, 3, nl) complex stack of the TEB spectral matrix from a cls dict.

    Entry (a, b) is cls['ab'], falling back to the transposed key 'ba' (physical spectra
    are symmetric; dicts usually carry one of the two), then to zero. With `diag_letters`,
    single-letter keys 't'/'e'/'b' are accepted for the diagonal. Returns None when the
    dict carries no TEB content at all.
    """
    fields = 'teb'
    nl = 0
    for k, v in cls.items():
        if all(c in fields for c in k) and len(k) in (1, 2):
            nl = max(nl, np.atleast_1d(np.asarray(v)).shape[-1])
    if nl == 0:
        return None
    out = np.zeros((3, 3, nl), dtype=complex)
    for i, a in enumerate(fields):
        for j, b in enumerate(fields):
            v = cls.get(a + b, cls.get(b + a) if i != j else None)
            if v is None and i == j and diag_letters:
                v = cls.get(a)
            if v is not None:
                v = np.atleast_1d(np.asarray(v))
                out[i, j, :v.shape[-1]] = v
    return out


def _as_real_if_real(arr):
    # Drop the imaginary part only when it is negligible *relative to the array's own
    # scale*: an absolute tolerance would silently zero physically tiny parity-odd
    # spectra (e.g. C_l^EB ~ 1e-10 from birefringence) carried through the spin algebra.
    scale = np.max(np.abs(arr)) if arr.size else 0.
    if np.max(np.abs(arr.imag), initial=0.) <= 1e-13 * max(scale, np.finfo(float).tiny):
        return arr.real.copy()
    return arr


def spin_cls(s1, s2, cls):
    r"""Spin-weighted cross-spectrum :math:`\langle {}_{s_1}X_{lm}\,{}_{s_2}X^*_{lm}\rangle`
    from TEB spectra: row s1 of B times the TEB covariance times the conjugate of row s2.

    Output is real unless TB/EB parity-odd spectra make it complex.
    """
    assert s1 in _SLOT and s2 in _SLOT, (s1, s2, 'not implemented')
    C = _teb_stack(cls)
    assert C is not None, 'no TEB spectra in dict: %s' % list(cls.keys())
    row = _B[_SLOT[s1]]
    col = np.conj(_B[_SLOT[s2]])
    return _as_real_if_real(np.einsum('a,abl,b->l', row, C, col))


def get_spin_matrix(sout, sin, cls):
    r"""Spin-space filtering matrix element: the TEB-basis matrix `cls` conjugated into the
    spin basis, :math:`(B\,F\,B^{-1})_{s_{\rm out} s_{\rm in}}`.

    Missing keys mean zero spectra; single-letter keys 't', 'e', 'b' are accepted for the
    diagonal. Scalar 0. is returned when the dict has no TEB content (so callers can cheaply
    test `np.any`).
    """
    assert sout in _SLOT and sin in _SLOT, (sout, sin)
    F = _teb_stack(cls, diag_letters=True)
    if F is None:
        return 0.
    row = _B[_SLOT[sout]]
    col = _BINV[:, _SLOT[sin]]
    return _as_real_if_real(np.einsum('a,abl,b->l', row, F, col))
