r"""Spin-weight algebra for CMB fields.

Conventions (identical to the reference, cf. plancklens/utils_spin.py:1-16):
:math:`_{\pm|s|}X_{lm} = -(\pm)^{|s|}(G_{lm} \pm i C_{lm})`, so that
:math:`G^0_{lm} = -T_{lm}`, :math:`G^2_{lm} = E_{lm}`, :math:`C^2_{lm} = B_{lm}`.

Behaviour matched to reference plancklens/utils_spin.py:96-196 (get_spin_raise/lower,
spin_cls, get_spin_matrix).
"""
import numpy as np


def get_spin_raise(s, lmax):
    r"""Eigenvalue :math:`\sqrt{(l-s)(l+s+1)}` of the spin-raising operator on spin-s
    harmonics, zero below l = \|s\|."""
    ret = np.zeros(lmax + 1, dtype=float)
    ret[abs(s):] = np.sqrt(np.arange(abs(s) - s, lmax - s + 1, dtype=float)
                           * np.arange(abs(s) + s + 1, lmax + s + 2, dtype=float))
    return ret


def get_spin_lower(s, lmax):
    r"""Eigenvalue :math:`-\sqrt{(l+s)(l-s+1)}` of the spin-lowering operator."""
    ret = np.zeros(lmax + 1, dtype=float)
    ret[abs(s):] = -np.sqrt(np.arange(s + abs(s), lmax + s + 1, dtype=float)
                            * np.arange(abs(s) - s + 1, lmax - s + 2, dtype=float))
    return ret


def _dict_transpose(cls):
    ret = {}
    for k in cls.keys():
        if len(k) == 1:
            ret[k + k] = np.copy(cls[k])
        else:
            assert len(k) == 2
            ret[k[1] + k[0]] = np.copy(cls[k])
    return ret


def spin_cls(s1, s2, cls):
    r"""Spin-weighted cross-spectrum :math:`_{s1}X_{lm}\, _{s2}X^*_{lm}` from TEB spectra.

    Output real unless TB/EB make it complex.
    """
    if s1 < 0:
        return (-1) ** (s1 + s2) * np.conjugate(spin_cls(-s1, -s2, _dict_transpose(cls)))
    assert s1 in [0, 2] and s2 in [0, -2, 2], (s1, s2, 'not implemented')
    if s1 == 0:
        if s2 == 0:
            return cls['tt']
        tb = cls.get('tb', None)
        te = cls.get('te', cls.get('et'))
        return -te if tb is None else -te + 1j * np.sign(s2) * tb
    elif s1 == 2:
        if s2 == 0:
            tb = cls.get('bt', cls.get('tb', None))
            et = cls.get('et', cls.get('te'))
            return -et if tb is None else -et - 1j * tb
        elif s2 == 2:
            return cls['ee'] + cls['bb']
        elif s2 == -2:
            eb = cls.get('be', cls.get('eb', None))
            return cls['ee'] - cls['bb'] if eb is None else cls['ee'] - cls['bb'] + 2j * eb
    assert 0, (s1, s2)


def get_spin_matrix(sout, sin, cls):
    r"""Spin-space filtering matrix :math:`R^{-1}\,{\rm cls}[T,E,B]\,R`, where R maps
    :math:`_{0,\pm2}X` onto (T, E, B). Missing keys mean zero spectra; single-letter keys
    't','e','b' are accepted for the diagonals."""
    assert sin in [0, 2, -2] and sout in [0, 2, -2], (sin, sout)
    if sin == 0:
        if sout == 0:
            return cls.get('tt', cls.get('t', 0.))
        tb = cls.get('tb', None)
        return (-cls.get('te', 0.) - 1j * np.sign(sout) * tb) if tb is not None \
            else -cls.get('te', 0.)
    if sin == 2:
        if sout == 0:
            te = cls.get('te', 0.)
            tb = cls.get('tb', None)
            return -0.5 * (te - 1j * tb) if tb is not None else -0.5 * te
        if sout == 2:
            return 0.5 * (cls.get('ee', cls.get('e', 0.)) + cls.get('bb', cls.get('b', 0.)))
        if sout == -2:
            ret = 0.5 * (cls.get('ee', cls.get('e', 0.)) - cls.get('bb', cls.get('b', 0.)))
            eb = cls.get('eb', None)
            return ret - 1j * eb if eb is not None else ret
    if sin == -2:
        if sout == 0:
            te = cls.get('te', 0.)
            tb = cls.get('tb', None)
            return -0.5 * (te + 1j * tb) if tb is not None else -0.5 * te
        if sout == 2:
            ret = 0.5 * (cls.get('ee', cls.get('e', 0.)) - cls.get('bb', cls.get('b', 0.)))
            eb = cls.get('eb', None)
            return ret + 1j * eb if eb is not None else ret
        if sout == -2:
            return 0.5 * (cls.get('ee', cls.get('e', 0.)) + cls.get('bb', cls.get('b', 0.)))
    assert 0, (sin, sout)
