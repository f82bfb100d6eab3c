r"""Symbolic quadratic-estimator representation.

A QE is a sum of terms; each term is a pair of *legs* acting on the inverse-variance
filtered spin-weighted CMB fields, multiplied pointwise on the sphere, analysed at spin
(spin_out_a + spin_out_b), and scaled by an output weight cL. Same capability surface as the
reference's symbolic layer (reference: plancklens/utils_qe.py:5-226); term algebra here is
hash-grouping over canonical leg keys (one pass) rather than pairwise scans, and evaluation
is backed by the TPU SHT engine.
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


def _leg_key(leg):
    """Hashable identity of a leg (spins + exact weight array)."""
    cl = np.ascontiguousarray(leg.cl)
    return (leg.spin_in, leg.spin_ou, cl.shape[-1], cl.dtype.str, cl.tobytes())


def _cl_key(cL, lcmp):
    """Hashable identity of an output-scaling callable, by its values on 0..lcmp.

    Two distinct functions agreeing on the grid are treated as equal — the grid spans every
    multipole any merged term can produce, so this is exact for the merge's purposes.
    """
    vals = np.ascontiguousarray(np.asarray(cL(np.arange(lcmp + 1)), dtype=float))
    return vals.tobytes()


def qe_simplify(qe_list, verbose=False):
    """Co-add terms sharing one leg and the output scaling; drop identically-zero terms.

    Single pass per side with a dict keyed on (kept-leg identity, merged-leg spins, cL
    values): terms in the same bucket have their free legs summed. Equivalent output to the
    reference's pairwise merge (plancklens/utils_qe.py:179-204); first-seen term order is
    preserved.
    """
    lcmp = 0
    for q in qe_list:
        lcmp = max(lcmp, q.get_lmax_a() + q.get_lmax_b())

    def _merge_side(qes, merge_b):
        buckets = {}
        order = []
        for q in qes:
            kept, free = (q.leg_a, q.leg_b) if merge_b else (q.leg_b, q.leg_a)
            key = (_leg_key(kept), free.spin_in, free.spin_ou, _cl_key(q.cL, lcmp))
            if key in buckets:
                i = buckets[key]
                if merge_b:
                    order[i] = qe(order[i].leg_a, order[i].leg_b + free, order[i].cL)
                else:
                    order[i] = qe(order[i].leg_a + free, order[i].leg_b, order[i].cL)
            else:
                buckets[key] = len(order)
                order.append(qe(q.leg_a.copy(), q.leg_b.copy(), q.cL))
        return order

    merged = _merge_side(_merge_side(qe_list, True), False)
    out = [q for q in merged if np.any(q.leg_a.cl) and np.any(q.leg_b.cl)]
    if verbose and len(out) != len(qe_list):
        print("qe_simplify: %s terms down from %s" % (len(out), len(qe_list)))
    return out


def _field_pieces(field, spin):
    """Decomposition of a spin-`spin` leg onto the single field `field`.

    A spin-0 leg sees only T. A spin-(+-2) leg sees (E +- iB)-type combinations, so
    restricting it to E keeps the even combination ((s) + (-s))/2 and restricting to B the
    odd one ((s) - (-s))/2 up to the parity sign. Returns [(new_spin, coeff), ...]
    (same decomposition as reference plancklens/utils_qe.py:135-176).
    """
    if spin == 0:
        return [(0, 1.)] if field == 't' else []
    if field == 't':
        return []
    return [(spin, 0.5), (-spin, 0.5 if field == 'e' else -0.5)]


def qe_proj(qe_list, a, b):
    """Restrict a QE list so the first leg only sees field `a` and the second only `b`
    (a, b in 't','e','b')."""
    assert a in 'teb' and b in 'teb'
    out = []
    for q in qe_list:
        for sa, wa in _field_pieces(a, q.leg_a.spin_in):
            for sb, wb in _field_pieces(b, q.leg_b.spin_in):
                la = qeleg(sa, q.leg_a.spin_ou, q.leg_a.cl * wa)
                lb = qeleg(sb, q.leg_b.spin_ou, q.leg_b.cl * wb)
                out.append(qe(la, lb, q.cL))
    return qe_simplify(out)


def qe_compress(qes, verbose=False):
    """Group terms sharing a first leg and output spin, so evaluation spends one spin
    transform on the shared leg and one on the fused sum of second legs
    (reference behaviour: plancklens/utils_qe.py:207-226).

    Returns [(qeleg_multi first, qeleg_multi fused second, cL), ...].
    """
    lcmp = max([q.get_lmax_a() + q.get_lmax_b() for q in qes], default=0)
    buckets = {}
    out = []
    for q in qes:
        key = (_leg_key(q.leg_a), q.leg_b.spin_ou, _cl_key(q.cL, lcmp))
        if key in buckets:
            first, fused, _ = out[buckets[key]]
            fused += q.leg_b
        else:
            buckets[key] = len(out)
            out.append((qeleg_multi([q.leg_a.spin_in], q.leg_a.spin_ou, [q.leg_a.cl]),
                        qeleg_multi([q.leg_b.spin_in], q.leg_b.spin_ou, [np.copy(q.leg_b.cl)]),
                        q.cL))
    if verbose and len(out) != len(qes):
        print("qe_compress: %s spin transforms, down from %s" % (2 * len(out), 2 * len(qes)))
    return out
