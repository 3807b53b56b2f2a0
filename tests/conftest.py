"""Test configuration: CPU backend, float64, 8 virtual devices.

Oracle comparisons follow the reference's strategy (float64 throughout,
tests/test_mpc.py seeds + tolerances); the virtual 8-device CPU mesh
exercises the multi-chip sharding path without TPU hardware.
"""

import os

# must be set before jax initializes its backends
flags = os.environ.get('XLA_FLAGS', '')
if 'xla_force_host_platform_device_count' not in flags:
    os.environ['XLA_FLAGS'] = (
        flags + ' --xla_force_host_platform_device_count=8').strip()

import jax  # noqa: E402

# The sandbox's sitecustomize pins JAX_PLATFORMS to the TPU platform and
# overrides the env var, so force CPU through jax.config after import.
jax.config.update('jax_platforms', 'cpu')
jax.config.update('jax_enable_x64', True)

# Persistent compilation cache: the interpret-mode Pallas kernels and the
# f64 solver graphs take minutes of XLA CPU compile time; cache them so
# repeat suite runs skip the compiles.  The dir is keyed by a host CPU
# fingerprint: the repo (and its cache) persists across machines, and
# XLA:CPU AOT results compiled for another host's CPU features load
# with "could lead to SIGILL" warnings, wrong results, and - for one
# truncated entry written by a killed process - a segfault in the
# cache read (round 4).
import hashlib
import platform


def _host_fingerprint():
    try:
        with open('/proc/cpuinfo') as fh:
            for line in fh:
                if line.startswith('flags'):
                    return hashlib.sha1(
                        (platform.machine() + line).encode()).hexdigest()[:10]
    except OSError:
        pass
    return platform.machine() or 'unknown'


jax.config.update('jax_compilation_cache_dir',
                  os.path.join(os.path.dirname(__file__), '..',
                               f'.jax_cache-{_host_fingerprint()}'))
jax.config.update('jax_persistent_cache_min_compile_time_secs', 5.0)
