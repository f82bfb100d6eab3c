"""Multi-process (multi-host) distribution entry.

The reference's cross-host backend is mpi4py, auto-enabled under srun/mpirun with
filesystem rendezvous and no-op single-process fallbacks (reference:
plancklens/helpers/mpi.py:12-55).  The TPU-native equivalent is `jax.distributed`: one
JAX process per host joins a coordinator, `jax.devices()` becomes the *global* device
set, mesh axes may span hosts, and data exchange is XLA collectives over ICI/DCN instead
of the shared filesystem.  Exactly like the reference shim, everything here degrades to
single-process no-ops when no launcher environment is detected, so the identical code
path runs serially.

Launcher environments recognised (first match wins):
  * explicit:  PLK_COORD=host:port  PLK_NPROC=<n>  PLK_PROCID=<i>
  * SLURM / OpenMPI / cloud TPU pods: `jax.distributed.initialize()` auto-detection
  * none: single-process fallback (rank 0 of 1), nothing initialised
"""
import os

_state = {'initialized': False, 'rank': 0, 'size': 1}


def init_distributed(coordinator_address=None, num_processes=None, process_id=None,
                     local_device_ids=None):
    """Join (or create) the multi-process JAX runtime; returns (rank, size).

    Call once, before any other jax API touches the backend.  With explicit arguments or
    a PLK_COORD-style environment this connects to the coordination service; under a
    recognised cluster launcher (SLURM, OpenMPI, TPU pods) `jax.distributed.initialize`
    auto-detects everything; otherwise this is a single-process no-op returning (0, 1) —
    the reference's `mpi.py:17` fallback semantics."""
    import jax
    if _state['initialized']:
        return _state['rank'], _state['size']
    if coordinator_address is None and 'PLK_COORD' in os.environ:
        coordinator_address = os.environ['PLK_COORD']
        num_processes = int(os.environ['PLK_NPROC'])
        process_id = int(os.environ['PLK_PROCID'])
    auto_env = any(v in os.environ for v in
                   ('SLURM_NTASKS', 'OMPI_COMM_WORLD_SIZE', 'TPU_WORKER_HOSTNAMES'))
    if coordinator_address is None and not (auto_env and _env_nproc() > 1):
        return 0, 1  # single process: nothing to initialise
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes, process_id=process_id,
                               local_device_ids=local_device_ids)
    _state.update(initialized=True, rank=jax.process_index(),
                  size=jax.process_count())
    return _state['rank'], _state['size']


def _env_nproc():
    for v in ('SLURM_NTASKS', 'OMPI_COMM_WORLD_SIZE'):
        if v in os.environ:
            try:
                return int(os.environ[v])
            except ValueError:
                pass
    if 'TPU_WORKER_HOSTNAMES' in os.environ:  # cloud TPU pod: one process per host
        return len([h for h in os.environ['TPU_WORKER_HOSTNAMES'].split(',') if h])
    return 1


def rank():
    return _state['rank']


def size():
    return _state['size']


def barrier(name='plk_barrier'):
    """Cross-process synchronisation point (reference mpi.barrier role); no-op when
    single-process."""
    if not _state['initialized']:
        return
    from jax.experimental import multihost_utils
    multihost_utils.sync_global_devices(name)


def local_jobs(jobs):
    """This process's share of a job list — the reference's `jobs[rank::size]` striding
    (reference: examples/run_qlms.py:57) against the distributed rank."""
    return list(jobs)[_state['rank']::_state['size']]


def global_mesh(n_m=1):
    """('sims', 'm') Mesh over the *global* device set (all processes)."""
    import jax
    from .mesh import make_mesh
    devs = jax.devices()
    return make_mesh(n_sims=len(devs) // n_m, n_m=n_m, devices=devs)


def host_array_to_global(arr, mesh, spec=None):
    """Assemble a process-local batch shard into a global sims-sharded array
    (the in-memory replacement for the reference's per-rank FITS writes)."""
    from jax.experimental import multihost_utils
    from jax.sharding import NamedSharding, PartitionSpec as P
    if spec is None:
        spec = P('sims', *([None] * (arr.ndim - 1)))
    return multihost_utils.host_local_array_to_global_array(arr, mesh, spec)
