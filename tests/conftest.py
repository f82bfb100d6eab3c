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

