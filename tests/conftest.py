"""Test configuration: run the suite on a virtual 8-device CPU mesh with float64 enabled.

Note: in the axon environment, jax is already imported at interpreter startup
(sitecustomize), so the platform must be forced via jax.config, not env vars. The XLA flag
for virtual host devices still applies because backend initialisation is lazy.
"""
import os

flags = os.environ.get('XLA_FLAGS', '')
if '--xla_force_host_platform_device_count' not in flags:
    os.environ['XLA_FLAGS'] = (flags + ' --xla_force_host_platform_device_count=8').strip()
os.environ['JAX_PLATFORMS'] = 'cpu'

import jax

jax.config.update('jax_platforms', 'cpu')
jax.config.update('jax_enable_x64', True)

import pytest


def pytest_addoption(parser):
    parser.addoption('--runslow', action='store_true', default=False,
                     help='run tests marked slow (also enabled by PLK_SLOW=1)')


def pytest_configure(config):
    config.addinivalue_line(
        'markers', 'slow: heavy end-to-end tests (several minutes); run with --runslow '
                   'or PLK_SLOW=1. Measured on one CPU core: default tier ~8 min, '
                   'full suite ~25 min (2026-08-18; PLK_CACHE_DIR makes slow-tier '
                   're-runs much cheaper).')


def pytest_collection_modifyitems(config, items):
    if config.getoption('--runslow') or os.environ.get('PLK_SLOW') == '1':
        return
    skip = pytest.mark.skip(reason='slow tier: pass --runslow or set PLK_SLOW=1')
    for item in items:
        if 'slow' in item.keywords:
            item.add_marker(skip)


@pytest.fixture(autouse=True, scope='module')
def _bound_xla_compiler_state():
    """Clear jax's compilation caches between test modules: the XLA CPU compiler
    segfaults after many hundreds of compilations accumulate in one process (observed
    twice at ~50% of the full --runslow suite, in whatever test compiles next; each
    crashing test passes standalone). Costs some recompiles across modules."""
    yield
    jax.clear_caches()

