"""Test configuration: run everything on an 8-device virtual CPU mesh.

The axon sitecustomize force-sets jax_platforms='axon,cpu' via jax.config
(overriding the JAX_PLATFORMS env var), so we must override back through
jax.config AFTER importing jax. XLA_FLAGS still must be set before the CPU
backend initializes.
"""

import os
import sys

flags = os.environ.get('XLA_FLAGS', '')
if '--xla_force_host_platform_device_count' not in flags:
    os.environ['XLA_FLAGS'] = (
        flags + ' --xla_force_host_platform_device_count=8').strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update('jax_platforms', 'cpu')
jax.config.update('jax_default_matmul_precision', 'highest')

import pytest  # noqa: E402


@pytest.fixture(scope='session', autouse=True)
def eight_devices():
    devs = jax.devices()
    assert devs[0].platform == 'cpu', f'tests must run on CPU, got {devs[0]}'
    assert len(devs) == 8, f'expected 8 virtual cpu devices, got {len(devs)}'
    return devs


def pytest_addoption(parser):
    parser.addoption(
        '--slow', action='store_true', default=False,
        help='also run tests marked slow (the full tier; see README)')


def pytest_collection_modifyitems(config, items):
    """Two test tiers: `pytest tests/` = fast tier (<10 min, gates work);
    `pytest tests/ --slow` = full tier (adds the heavy e2e/scale goldens)."""
    if config.getoption('--slow'):
        return
    skip = pytest.mark.skip(reason='slow tier: pass --slow to run')
    for item in items:
        if 'slow' in item.keywords:
            item.add_marker(skip)


@pytest.fixture(scope='module', autouse=True)
def _clear_jax_caches_per_module():
    """Bound compile-cache/memory growth so the FULL suite survives one
    process (round-1 ran `pytest tests/` into an XLA SIGSEGV at ~46% from
    accumulated compiled executables; sharding was the workaround). Clearing
    per module keeps within-module caching (fast) while capping the
    process-wide footprint."""
    yield
    jax.clear_caches()
