r"""Symbolic quadratic-estimator representation.

A QE is a sum of terms; each term is a pair of *legs* acting on the inverse-variance
filtered spin-weighted CMB fields, multiplied pointwise on the sphere, analysed at spin
(spin_out_a + spin_out_b), and scaled by an output weight cL. This mirrors the reference's
symbolic layer (reference: plancklens/utils_qe.py:5-226) — the evaluation backend here is the
TPU SHT engine instead of healpy.
"""
import numpy as np


class qeleg:
    """One QE leg: acts on the spin-`spin_in` filtered field with multipole weights `cl`,
    producing a spin-`spin_ou` position-space field."""

    def __init__(self, spin_in, spin_out, cl):
        self.spin_in = spin_in
        self.spin_ou = spin_out
        self.cl = np.asarray(cl)

    def __eq__(self, other):
        if self.spin_in != other.spin_in or self.spin_ou != other.spin_ou \
                or self.get_lmax() != other.get_lmax():
            return False
        return np.all(self.cl == other.cl)

    def __mul__(self, other):
        return qeleg(self.spin_in, self.spin_ou, self.cl * other)

    def __add__(self, other):
        assert self.spin_in == other.spin_in and self.spin_ou == other.spin_ou
        lmax = max(self.get_lmax(), other.get_lmax())
        cl = np.zeros(lmax + 1, dtype=np.promote_types(self.cl.dtype, other.cl.dtype))
        cl[:len(self.cl)] += self.cl
        cl[:len(other.cl)] += other.cl
        return qeleg(self.spin_in, self.spin_ou, cl)

    def copy(self):
        return qeleg(self.spin_in, self.spin_ou, np.copy(self.cl))

    def get_lmax(self):
        return len(self.cl) - 1

    def __repr__(self):
        return f"qeleg(s_in={self.spin_in}, s_out={self.spin_ou}, lmax={self.get_lmax()})"


class qeleg_multi:
    """Several legs sharing one output spin, fused so a single spin transform evaluates
    their sum (reference: plancklens/utils_qe.py:34-77)."""

    def __init__(self, spins_in, spin_out, cls):
        assert isinstance(spins_in, list) and isinstance(cls, list) and len(spins_in) == len(cls)
        self.spins_in = spins_in
        self.cls = cls
        self.spin_ou = spin_out

    def __iadd__(self, leg):
        assert leg.spin_ou == self.spin_ou, (leg.spin_ou, self.spin_ou)
        self.spins_in.append(leg.spin_in)
        self.cls.append(np.copy(leg.cl))
        return self

    def get_lmax(self):
        return np.max([len(cl) for cl in self.cls]) - 1


class qe:
    """One QE term: leg pair + output multipole scaling cL (callable of L array)."""

    def __init__(self, leg_a, leg_b, cL):
        assert leg_a.spin_ou + leg_b.spin_ou >= 0
        self.leg_a = leg_a
        self.leg_b = leg_b
        self.cL = cL

    def get_lmax_a(self):
        return self.leg_a.get_lmax()

    def get_lmax_b(self):
        return self.leg_b.get_lmax()


def qe_simplify(qe_list, _swap=False, verbose=False):
    """Co-add terms with identical first legs and compatible second legs; drop zero terms
    (reference behaviour: plancklens/utils_qe.py:179-204)."""
    skip = []
    qes_ret = []
    qes = [qe(q.leg_b.copy(), q.leg_a.copy(), q.cL) for q in qe_list] if _swap else qe_list
    for i, qe1 in enumerate(qes):
        if i in skip:
            continue
        leg_a = qe1.leg_a.copy()
        leg_b = qe1.leg_b.copy()
        for j, qe2 in enumerate(qes[i + 1:]):
            if qe2.leg_a == leg_a and qe2.leg_b.spin_in == qe1.leg_b.spin_in \
                    and qe2.leg_b.spin_ou == qe1.leg_b.spin_ou:
                Ls = np.arange(max(qe1.leg_b.get_lmax(), qe2.leg_b.get_lmax()) + 1)
                if np.all(qe1.cL(Ls) == qe2.cL(Ls)):
                    leg_b = leg_b + qe2.leg_b
                    skip.append(j + i + 1)
        if np.any(leg_a.cl) and np.any(leg_b.cl):
            qes_ret.append(qe(leg_a, leg_b, qe1.cL))
    if verbose and len(skip) > 0:
        print("qe_simplify: %s terms down from %s" % (len(qes_ret), len(qes)))
    if not _swap:
        return qe_simplify(qes_ret, _swap=True, verbose=verbose)
    return [qe(q.leg_b.copy(), q.leg_a.copy(), q.cL) for q in qes_ret]


def qe_proj(qe_list, a, b):
    """Restrict a QE list so the first leg only sees field `a` and the second only `b`
    (a, b in 't','e','b'); spin-+-2 legs split into (+2, -2) pairs with E/B parity signs
    (reference behaviour: plancklens/utils_qe.py:135-176)."""
    assert a in ['t', 'e', 'b'] and b in ['t', 'e', 'b']
    l_in = [0] if a == 't' else [-2, 2]
    r_in = [0] if b == 't' else [-2, 2]
    qes_ret = []
    for q in qe_list:
        si, ri = (q.leg_a.spin_in, q.leg_b.spin_in)
        if si not in l_in or ri not in r_in:
            continue
        leg_a = q.leg_a.copy()
        leg_b = q.leg_b.copy()
        if si == 0 and ri == 0:
            qes_ret.append(qe(leg_a, leg_b, q.cL))
        elif si == 0 and abs(ri) > 0:
            sgn = 1 if b == 'e' else -1
            qes_ret.append(qe(leg_a, leg_b * 0.5, q.cL))
            leg_b.spin_in *= -1
            qes_ret.append(qe(leg_a, leg_b * 0.5 * sgn, q.cL))
        elif ri == 0 and abs(si) > 0:
            sgn = 1 if a == 'e' else -1
            qes_ret.append(qe(leg_a * 0.5, leg_b, q.cL))
            leg_a.spin_in *= -1
            qes_ret.append(qe(leg_a * 0.5 * sgn, leg_b, q.cL))
        else:
            sgna = 1 if a == 'e' else -1
            sgnb = 1 if b == 'e' else -1
            qes_ret.append(qe(leg_a * 0.5, leg_b * 0.5, q.cL))
            leg_b.spin_in *= -1
            qes_ret.append(qe(leg_a * 0.5, leg_b * 0.5 * sgnb, q.cL))
            leg_a.spin_in *= -1
            qes_ret.append(qe(leg_a * 0.5 * sgna, leg_b * 0.5 * sgnb, q.cL))
            leg_b.spin_in *= -1
            qes_ret.append(qe(leg_a * 0.5 * sgna, leg_b * 0.5, q.cL))
    return qe_simplify(qes_ret)


def qe_compress(qes, verbose=False):
    """Group terms sharing a first leg so evaluation minimises spin transforms
    (reference behaviour: plancklens/utils_qe.py:207-226)."""
    skip = []
    qes_compressed = []
    for i, qi in enumerate(qes):
        if i in skip:
            continue
        lega = qi.leg_a
        lega_m = qeleg_multi([qi.leg_a.spin_in], qi.leg_a.spin_ou, [qi.leg_a.cl])
        legb_m = qeleg_multi([qi.leg_b.spin_in], qi.leg_b.spin_ou, [qi.leg_b.cl])
        for j, qj in enumerate(qes[i + 1:]):
            if qj.leg_a == lega and legb_m.spin_ou == qj.leg_b.spin_ou:
                legb_m += qj.leg_b
                skip.append(i + 1 + j)
        qes_compressed.append((lega_m, legb_m, qi.cL))
    if len(skip) > 0 and verbose:
        print("qe_compress: %s spin transforms, down from %s"
              % (2 * (len(qes) - len(skip)), 2 * len(qes)))
    return qes_compressed
