"""Device-mesh parallelism helpers.

The reference's only distribution mechanism is MPI rank striding over simulation indices
with filesystem rendezvous (reference: plancklens/helpers/mpi.py, examples/run_qlms.py:57).
Here the sims axis is a sharded array dimension on a jax Mesh: `jobs[rank::size]` becomes
`jax.device_put(batch, sims_sharding(mesh))`, barriers become XLA collectives, and the
per-stage "exchange through disk" disappears — stages are one jitted program.

Axes:
  'sims' — data parallelism over simulation indices (the dominant axis, 300+ sims)
  'm'    — intra-transform parallelism: the (rings x m) work of the Legendre phase and the
           m-bins of the ring FFTs shard over 'm' (the lmax >~ 4096 scaling axis)
"""
import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_sims=None, n_m=1, devices=None):
    """Mesh over ('sims', 'm'). Defaults to all devices on the sims axis."""
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    if n_sims is None:
        n_sims = n // n_m
    assert n_sims * n_m == n, (n_sims, n_m, n)
    dev = np.asarray(devices).reshape(n_sims, n_m)
    return Mesh(dev, ('sims', 'm'))


def sims_sharding(mesh, ndim=2):
    """Sharding placing the leading sims axis across the 'sims' mesh axis."""
    return NamedSharding(mesh, P('sims', *([None] * (ndim - 1))))


def maps_sharding(mesh):
    """Sharding for (sims, nrings, nphi) ring maps: sims x ring blocks.

    Rings (not phi) shard over the 'm' mesh axis so the longitude FFTs stay whole-ring
    local; the m columns of the Legendre phase shard over the same axis, with one
    all-to-all between the phases (see shard_sht)."""
    return NamedSharding(mesh, P('sims', 'm', None))


def shard_sht(sht, mesh):
    """A copy of `sht` whose transforms run with the full two-phase mesh sharding.

    Legendre phase: (batch, l/rings, m) arrays partition their m columns over the 'm'
    mesh axis (the lmax-scaling axis — the recursion work splits).  Longitude phase:
    (batch, rings, nphi) maps partition their rings over the same axis (each device FFTs
    whole rings).  The transpose between the phases is an explicit resharding
    P(sims, None, 'm') -> P(sims, 'm', None), which XLA lowers to an all-to-all over the
    'm' axis.  This is SURVEY §5's lmax-scaling design (the ring-attention analog: ring
    blocks x m blocks with an all-to-all between the Legendre and FFT phases).

    The returned object must be used under `jit` within the mesh context."""
    import copy
    s = copy.copy(sht)
    s.shard = {'mesh': mesh,
               'lm_m': P('sims', None, 'm'),      # (batch, l, m) harmonic grids
               'theta_m': P('sims', None, 'm'),   # (batch, rings, m), Legendre layout
               'theta_r': P('sims', 'm', None),   # (batch, rings, m), FFT layout
               'map': P('sims', 'm', None),       # (batch, rings, nphi) ring maps
               'alm': P('sims', None)}            # (batch, nalm) triangular alms
    return s


def shard_batch(mesh, arr):
    """Place a batched array with its leading axis sharded over 'sims'."""
    return jax.device_put(arr, sims_sharding(mesh, np.ndim(arr)))


class ShardedIVFS:
    """ivfs adapter whose batched outputs are placed sims-sharded on a mesh, so every
    downstream batched stage (QE evaluation, spectra) runs distributed — the driver's
    --mesh mechanism (role of the reference's `jobs[rank::size]` striding,
    examples/run_qlms.py:57)."""

    def __init__(self, ivfs, mesh):
        self._ivfs = ivfs
        self._mesh = mesh

    def __getattr__(self, name):
        # The batch accessor must only exist when the wrapped filter has one: drivers
        # probe `hasattr(ivfs, 'get_sim_teblm_batch')` to pick batch vs per-index paths
        # (examples/run_qlms.py, models/qest.py), so a plain method here would advertise
        # a batch interface the inner library cannot serve (same contract as
        # IVFShuffle.__getattr__, models/filt.py).
        if name == 'get_sim_teblm_batch':
            inner = getattr(self._ivfs, name)  # AttributeError propagates to hasattr

            def _sharded_batch(idxs):
                t, e, b = inner(idxs)
                n_sims = self._mesh.shape['sims']
                if t.shape[0] % n_sims:  # e.g. small mean-field splits: leave replicated
                    return t, e, b
                return (shard_batch(self._mesh, t), shard_batch(self._mesh, e),
                        shard_batch(self._mesh, b))
            return _sharded_batch
        return getattr(self._ivfs, name)

    def hashdict(self):
        return self._ivfs.hashdict()
