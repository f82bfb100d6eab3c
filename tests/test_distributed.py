"""Multi-process distribution tests: two spawned CPU processes join a jax.distributed
coordinator, build a global mesh, and check a cross-process collective — the analogue of
the reference's mpi4py backend under srun (reference: plancklens/helpers/mpi.py:34-55).
"""
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

_WORKER = r"""
import os, sys
import jax
jax.config.update('jax_platforms', 'cpu')
sys.path.insert(0, os.environ['PLK_REPO'])
from plancklens_tpu.parallel import distributed as dist

rank, size = dist.init_distributed()
assert size == 2, size
assert rank == int(os.environ['PLK_PROCID']), (rank, os.environ['PLK_PROCID'])

import numpy as np
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

devs = jax.devices()
assert len(devs) == 2, devs  # one CPU device per process, globally visible
mesh = dist.global_mesh()
assert mesh.shape['sims'] == 2

# every process contributes a distinct local shard; a global sum must see both
local = np.full((1, 4), float(rank + 1))
garr = dist.host_array_to_global(local, mesh, P('sims', None))
with mesh:
    tot = jax.jit(lambda x: jnp.sum(x) * jnp.ones((2, 1)),
                  in_shardings=NamedSharding(mesh, P('sims', None)),
                  out_shardings=NamedSharding(mesh, P('sims', None)))(garr)
local_shard = np.asarray(tot.addressable_shards[0].data)
assert float(np.ravel(local_shard)[0]) == 12.0, local_shard  # (1+2)*4, on every process
dist.barrier('test')
print('DIST_OK rank %d' % rank, flush=True)
"""


def test_single_process_fallback():
    """Without a launcher environment the entry is a no-op returning rank 0 of 1
    (the reference mpi.py:17 fallback)."""
    from plancklens_tpu.parallel import distributed as dist
    for v in ('PLK_COORD', 'SLURM_NTASKS', 'OMPI_COMM_WORLD_SIZE'):
        assert v not in os.environ or v == 'SLURM_NTASKS'
    r, s = dist.init_distributed()
    assert (r, s) == (0, 1) or s >= 1
    assert dist.local_jobs(range(5)) == [0, 1, 2, 3, 4] or s > 1
    dist.barrier()  # no-op


def test_two_process_cpu_mesh_psum():
    """Spawn 2 CPU processes, global 2-device mesh, cross-process reduction."""
    with socket.socket() as s:
        s.bind(('127.0.0.1', 0))
        port = s.getsockname()[1]
    env_base = {k: v for k, v in os.environ.items()
                if k not in ('PYTHONPATH', 'XLA_FLAGS', 'JAX_PLATFORMS')}
    procs = []
    for pid in range(2):
        env = dict(env_base, PLK_COORD='127.0.0.1:%d' % port, PLK_NPROC='2',
                   PLK_PROCID=str(pid), JAX_PLATFORMS='cpu',
                   PLK_REPO=os.path.join(os.path.dirname(__file__), '..'))
        procs.append(subprocess.Popen([sys.executable, '-c', _WORKER], env=env,
                                      stdout=subprocess.PIPE, stderr=subprocess.PIPE,
                                      text=True))
    outs = []
    for p in procs:
        try:
            out, err = p.communicate(timeout=300)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail('distributed worker timed out')
        outs.append((p.returncode, out, err))
    for rc, out, err in outs:
        assert rc == 0, (rc, out[-2000:], err[-2000:])
        assert 'DIST_OK' in out, (out, err)
