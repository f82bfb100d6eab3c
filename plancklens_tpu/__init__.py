"""plancklens_tpu — a TPU-native (JAX/XLA/Pallas) CMB lensing reconstruction framework.

Capability target: the Planck 2018 lensing pipeline (quadratic estimators, inverse-variance
filtering, responses, N0/N1 biases, mean-fields, band-powers), re-designed TPU-first:

 - spherical harmonic transforms and Wigner transforms are batched matmul/FFT kernels on the MXU,
   not per-ring OpenMP loops (reference: plancklens/shts.py, plancklens/wigners/wigners.f90);
 - simulation indices become a batched, mesh-sharded array axis instead of MPI rank striding
   (reference: plancklens/helpers/mpi.py, examples/run_qlms.py);
 - conjugate-gradient filtering is a jittable lax.while_loop (reference: plancklens/qcinv/).

The reference implementation being rebuilt is carronj/plancklens; file:line citations in
docstrings throughout point at the behaviour being matched, not code being copied.
"""

import os

__version__ = '0.1.0'

DATAPATH = os.path.join(os.path.dirname(os.path.abspath(__file__)), 'data')


def enable_x64():
    """Enable float64 in JAX. The spectral layer (Wigner kernels, responses, N0) requires it
    for the reference's 1e-6 consistency targets (reference: tests/test_w.py:61-62)."""
    import jax
    jax.config.update('jax_enable_x64', True)
