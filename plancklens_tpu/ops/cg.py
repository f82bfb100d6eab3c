r"""Preconditioned conjugate-gradient solver, jittable.

Replaces the reference's conjugate-directions loop (reference:
plancklens/qcinv/cd_solve.py:35-107) with a fixed-shape `lax.while_loop` PCG: under jit the
entire solve — dozens to hundreds of forward ops, each two SHTs — is one XLA program, and
batches of right-hand sides (sims) run as a leading array axis with a per-item
convergence criterion (the loop runs until every item is converged; items already
converged keep taking harmless refinement steps — the batch is lockstep anyway, so
masking them would save nothing). The reference's multi-preconditioner search panels reduce, for the production
tr_cg policy, to PCG with a composite (split low-l / high-l) preconditioner.
"""
from functools import partial

import jax
import jax.numpy as jnp


def dot_alm(alm1, alm2, ms):
    """Scalar product sum_lm (2 - delta_m0) Re(a1 a2*) == sum_l (2l+1) cl_l(a1, a2)
    (reference: plancklens/qcinv/opfilt_tt.py:43-51). ms: m of each triangular entry.

    Accumulated at f64 where the backend allows it (CPU/x64): the f32 CG is otherwise
    limited by round-off in these reductions near rel. resid ~1e-5."""
    w = jnp.where(ms == 0, 1., 2.)
    prod = (alm1 * jnp.conj(alm2)).real
    acc = prod.astype(jnp.float64) if jax.config.jax_enable_x64 else prod
    return jnp.sum(w * acc, axis=-1).astype(prod.dtype)


def _posguard(x):
    """max(x, tiny) with a dtype-appropriate tiny. The former literal 1e-300
    underflows to exactly 0.0 in float32, guarding nothing precisely where the f32
    engine needs it: an all-zero RHS row (or a row converging to exact-zero residual)
    would give 0/0 = NaN and poison that row of the batch."""
    return jnp.maximum(x, jnp.finfo(x.dtype).tiny)


def _pcg_loop(fwd_op, pre_op, b, x0, iter_max, eps_min, ms, roundoff=25):
    """Traceable PCG while_loop (shared by :func:`pcg` and :func:`pcg_ir`)."""
    b = jnp.atleast_2d(b)
    x0 = jnp.broadcast_to(jnp.atleast_2d(x0), b.shape)
    b0 = _posguard(dot_alm(b, b, ms))

    r = b - fwd_op(x0)
    z = pre_op(r)
    p = z
    rz = dot_alm(r, z, ms)

    def cond(state):
        x, r, p, rz, it = state
        rr = dot_alm(r, r, ms)
        return jnp.logical_and(it < iter_max,
                               jnp.any(jnp.sqrt(rr / b0) > eps_min))

    def body(state):
        x, r, p, rz, it = state
        Ap = fwd_op(p)
        pAp = dot_alm(p, Ap, ms)
        alpha = (rz / _posguard(pAp)).astype(b.real.dtype)
        x = x + alpha[:, None] * p
        # roundoff is a static python int: guard the modulo so roundoff=0 (inner IR
        # solves, which never refresh) does not emit an integer rem-by-zero
        refresh = jnp.asarray(False) if roundoff <= 0 else ((it + 1) % roundoff == 0)
        # residual replacement only: the conjugate direction is kept (a full restart
        # destroys the Krylov history and measurably slows convergence)
        r = jax.lax.cond(refresh, lambda: b - fwd_op(x),
                         lambda: r - alpha[:, None] * Ap)
        z = pre_op(r)
        rz_new = dot_alm(r, z, ms)
        beta = (rz_new / _posguard(rz)).astype(b.real.dtype)
        p = z + beta[:, None] * p
        return x, r, p, rz_new, it + 1

    x, r, p, rz, it = jax.lax.while_loop(cond, body,
                                         (x0, r, p, rz, jnp.zeros((), jnp.int32)))
    rel = jnp.sqrt(dot_alm(r, r, ms) / b0)
    return x, it, rel


@partial(jax.jit, static_argnums=(0, 1, 4, 5, 7))
def pcg(fwd_op, pre_op, b, x0, iter_max, eps_min, ms, roundoff=25):
    """Solve fwd_op(x) = b by PCG. Returns (x, n_iter, rel_residual).

    fwd_op, pre_op: callables on (batch, nalm) complex arrays (traced once).
    Convergence: sqrt(<r,r>/<b,b>) < eps_min on every batch element.

    Every `roundoff` iterations the true residual r = b - A x is recomputed (residual
    replacement, the reference's round-off policy, cd_solve.py:82-86) so the recurred
    residual cannot drift from the true one; the conjugate direction is kept.
    """
    return _pcg_loop(fwd_op, pre_op, b, x0, iter_max, eps_min, ms, roundoff=roundoff)


@partial(jax.jit, static_argnums=(0, 1, 4, 5, 7, 8))
def pcg_ir(fwd_op, pre_op, b, x0, iter_max, eps_min, ms, inner_dec=3e-2, inner_cap=80):
    """PCG with iterative-refinement restarts — the single-precision production solver.

    A single long f32 CG stalls far above its operator's round-off floor: the recurred
    search directions lose conjugacy to accumulated rounding long before the residual
    reaches the ~1e-6 forward-operator noise level (measured: 774 f32 iterations
    limping to 9.9e-6 on the masked lmax-192 system, vs 60-80 in f64; docs/PERF.md).
    Restarting sidesteps this: each outer step recomputes the true residual
    r = b - A x and solves the *correction* equation A e = r with a fresh Krylov space
    to a fixed relative reduction `inner_dec`, so every inner solve operates in a
    regime where f32 CG is still healthy.  The iteration converges linearly at rate
    `inner_dec` per outer step down to the f32 residual-evaluation floor (~1e-7
    relative), comfortably below the 1e-5 production tolerance.

    One jitted program: outer `while_loop` over (true residual -> inner `while_loop`
    PCG).  Costs one extra forward apply per outer step for the exact residual.
    Returns (x, total_forward_applies, rel_residual).
    """
    b = jnp.atleast_2d(b)
    x0 = jnp.broadcast_to(jnp.atleast_2d(x0), b.shape)
    b0 = _posguard(dot_alm(b, b, ms))
    rdt = b.real.dtype

    def cond(state):
        x, it_tot, rel, done = state
        return jnp.logical_and(~done, it_tot < iter_max)

    def body(state):
        x, it_tot, _, _ = state
        r = b - fwd_op(x)
        rel = jnp.sqrt(dot_alm(r, r, ms) / b0)
        done = jnp.all(rel <= eps_min)

        def solve_correction():
            e, it_in, _ = _pcg_loop(fwd_op, pre_op, r, jnp.zeros_like(r),
                                    inner_cap, inner_dec, ms, roundoff=0)
            return e, it_in

        e, it_in = jax.lax.cond(
            done, lambda: (jnp.zeros_like(r), jnp.zeros((), jnp.int32)),
            solve_correction)
        return x + e, it_tot + it_in + 1, rel.astype(rdt), done

    st0 = (x0, jnp.zeros((), jnp.int32), jnp.full((b.shape[0],), jnp.inf, dtype=rdt),
           jnp.zeros((), bool))
    x, it, rel, done = jax.lax.while_loop(cond, body, st0)
    return x, it, rel


def solve(fwd_op, pre_op, b, x0, iter_max, eps_min, ms, force_ir=None):
    """Production linear-system driver: plain PCG in double precision, IR-restarted PCG
    (:func:`pcg_ir`) when the working dtype is single — the TPU path, where plain f32
    CG cannot reach the 1e-5 production tolerance efficiently."""
    use_ir = force_ir if force_ir is not None else \
        jnp.asarray(b).real.dtype == jnp.float32
    if use_ir:
        return pcg_ir(fwd_op, pre_op, b, x0, iter_max, eps_min, ms)
    return pcg(fwd_op, pre_op, b, x0, iter_max, eps_min, ms)


class monitor_basic:
    """Convergence monitor for the host-driven solver (role of reference
    plancklens/qcinv/cd_monitors.py monitor_basic): records per-iteration relative
    residuals, optionally printing and/or appending to a log file."""

    def __init__(self, eps_min, iter_max=1000, verbose=False, logfile=None):
        self.eps_min = eps_min
        self.iter_max = iter_max
        self.verbose = verbose
        self.logfile = logfile
        self.history = []
        self._t0 = None

    def __call__(self, it, rel):
        import time as _time
        if self._t0 is None:
            self._t0 = _time.time()
        rel = float(max(rel)) if hasattr(rel, '__len__') else float(rel)
        self.history.append(rel)
        line = '[%8.2fs] iter %4d  rel resid %.3e' % (_time.time() - self._t0, it, rel)
        if self.verbose:
            print(line)
        if self.logfile is not None:
            with open(self.logfile, 'a') as f:
                f.write(line + '\n')
        return rel < self.eps_min or it >= self.iter_max


def pcg_monitored(fwd_op, pre_op, b, x0, ms, monitor):
    """Host-driven PCG with a per-iteration monitor callback (diagnostics/logging path;
    the production path is the jitted `pcg`). `monitor(it, rel_per_batch)` returns True
    to stop. Returns (x, n_iter, rel_residual)."""
    b = jnp.atleast_2d(b)
    x = jnp.broadcast_to(jnp.atleast_2d(x0), b.shape)
    b0 = _posguard(dot_alm(b, b, ms))
    r = b - fwd_op(x)
    z = pre_op(r)
    p = z
    rz = dot_alm(r, z, ms)
    it = 0
    import numpy as np
    rel = np.sqrt(np.asarray(dot_alm(r, r, ms) / b0))
    while not monitor(it, rel):
        Ap = fwd_op(p)
        alpha = (rz / _posguard(dot_alm(p, Ap, ms))).astype(b.real.dtype)
        x = x + alpha[:, None] * p
        r = r - alpha[:, None] * Ap
        z = pre_op(r)
        rz_new = dot_alm(r, z, ms)
        beta = (rz_new / _posguard(rz)).astype(b.real.dtype)
        p = z + beta[:, None] * p
        rz = rz_new
        it += 1
        rel = np.sqrt(np.asarray(dot_alm(r, r, ms) / b0))
    return x, it, rel


def pcg_fixed(fwd_op, pre_op, b, x0, n_iter, ms):
    """Fixed-iteration PCG (fori_loop) — used for inner multigrid-stage solves where the
    iteration count is part of the chain descriptor (reference:
    plancklens/qcinv/multigrid.py:185-215)."""
    b = jnp.atleast_2d(b)
    x0 = jnp.broadcast_to(jnp.atleast_2d(x0), b.shape)
    r = b - fwd_op(x0)
    z = pre_op(r)
    p = z
    rz = dot_alm(r, z, ms)

    def body(_, state):
        x, r, p, rz = state
        Ap = fwd_op(p)
        pAp = dot_alm(p, Ap, ms)
        alpha = (rz / _posguard(pAp)).astype(b.real.dtype)
        x = x + alpha[:, None] * p
        r = r - alpha[:, None] * Ap
        z = pre_op(r)
        rz_new = dot_alm(r, z, ms)
        beta = (rz_new / _posguard(rz)).astype(b.real.dtype)
        p = z + beta[:, None] * p
        return x, r, p, rz_new

    x, r, p, rz = jax.lax.fori_loop(0, n_iter, body, (x0, r, p, rz))
    return x
