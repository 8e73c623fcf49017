"""Test harness: force CPU with 8 virtual devices so multi-chip sharding logic
(mesh/pjit/shard_map, cross-replica BN) is exercised without TPU hardware —
this is the multi-host test strategy from SURVEY.md §4.

Note: the environment pre-imports jax (sitecustomize) pinned to the TPU
platform; the backend is created lazily, so switching via jax.config before
the first computation is safe and required — plain env vars in conftest are
too late.
"""
import os

os.environ['XLA_FLAGS'] = (os.environ.get('XLA_FLAGS', '')
                           + ' --xla_force_host_platform_device_count=8').strip()

import jax

jax.config.update('jax_platforms', 'cpu')

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.RandomState(0)


@pytest.fixture(scope='session')
def cpu_mesh_devices():
    devices = jax.devices()
    assert len(devices) == 8, devices
    return devices
