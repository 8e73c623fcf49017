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


def stub_reference_deps():
    """Make /root/reference importable: stub the dependencies that only its
    unused code paths touch (kornia, pytorch_lightning, easydict,
    torchvision, skimage). Used by the reference-parity test modules."""
    import sys
    import types

    import torch

    for name in ['kornia', 'kornia.geometry', 'kornia.geometry.transform']:
        sys.modules.setdefault(name, types.ModuleType(name))
    sys.modules['kornia.geometry.transform'].rotate = None
    if 'pytorch_lightning' not in sys.modules:
        pl = types.ModuleType('pytorch_lightning')
        pl.seed_everything = lambda *a, **k: None
        sys.modules['pytorch_lightning'] = pl
    if 'easydict' not in sys.modules:
        ed = types.ModuleType('easydict')

        class EasyDict(dict):
            __getattr__ = dict.get
        ed.EasyDict = EasyDict
        sys.modules['easydict'] = ed
    if 'torchvision' not in sys.modules:
        import types as _t
        tv = types.ModuleType('torchvision')
        tv.models = types.ModuleType('torchvision.models')
        tv.models.inception = _t.SimpleNamespace(
            InceptionOutputs=tuple, InceptionA=torch.nn.Module,
            InceptionB=torch.nn.Module, InceptionC=torch.nn.Module,
            InceptionD=torch.nn.Module, InceptionE=torch.nn.Module,
            InceptionAux=torch.nn.Module)
        tv.models.utils = _t.SimpleNamespace(load_state_dict_from_url=None)
        sys.modules['torchvision'] = tv
        sys.modules['torchvision.models'] = tv.models
    for name in ['skimage', 'skimage.metrics', 'skimage.transform',
                 'skimage.segmentation']:
        sys.modules.setdefault(name, types.ModuleType(name))
    sys.modules['skimage'].img_as_ubyte = None
    sys.modules['skimage.metrics'].structural_similarity = None
    sys.modules['skimage.transform'].rescale = None
    sys.modules['skimage.transform'].resize = None
    sys.modules['skimage.segmentation'].mark_boundaries = None
    if '/root/reference' not in sys.path:
        sys.path.insert(0, '/root/reference')


def pytest_configure(config):
    config.addinivalue_line('markers', 'slow: slow end-to-end tests')
