"""THE parity gate: run the actual reference PyTorch modules
(/root/reference, read-only) next to our JAX re-implementation with
CONVERTED WEIGHTS and compare outputs element-wise.

This validates three things at once: the architecture graph, the checkpoint
converter's key-space/layout mapping, and the numerics — exactly what
bit-compatible big-lama loading requires (SURVEY §5.4/§7 step 2), without
needing the (unavailable, zero-egress) pretrained weights.

The reference imports kornia / pytorch_lightning, which only unused code
paths touch; they are stubbed.
"""
import os
import sys
import types

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

REFERENCE = '/root/reference'
pytestmark = pytest.mark.skipif(not os.path.isdir(REFERENCE),
                                reason='reference checkout not available')


@pytest.fixture(scope='module')
def reference_modules():
    from conftest import stub_reference_deps
    stub_reference_deps()
    from saicinpainting.training.modules import ffc as ref_ffc
    from saicinpainting.training.modules import pix2pixhd as ref_p2p
    return ref_ffc, ref_p2p
