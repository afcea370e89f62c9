"""Test configuration: run everything on an 8-device virtual CPU mesh.

Must set env vars before jax is imported anywhere, so this sits at the top of
conftest (pytest imports conftest before test modules).
"""

import os
import sys

os.environ.setdefault('JAX_PLATFORMS', 'cpu')
flags = os.environ.get('XLA_FLAGS', '')
if '--xla_force_host_platform_device_count' not in flags:
    os.environ['XLA_FLAGS'] = (
        flags + ' --xla_force_host_platform_device_count=8').strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update('jax_default_matmul_precision', 'highest')

import pytest  # noqa: E402


@pytest.fixture(scope='session')
def eight_devices():
    devs = jax.devices()
    assert len(devs) == 8, f'expected 8 virtual cpu devices, got {len(devs)}'
    return devs
