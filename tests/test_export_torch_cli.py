"""bin/export_torch_checkpoint.py round trip: a flax checkpoint exported to
torch format must drive the ACTUAL reference FFCResNetGenerator to the same
outputs as the flax generator (inverse of the torch->flax parity tests)."""
import os
import subprocess
import sys

import numpy as np
import pytest
import torch
import yaml

import jax
import jax.numpy as jnp

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

GEN_KW = dict(
    input_nc=4, output_nc=3, ngf=8, n_downsampling=2, n_blocks=2,
    add_out_act='sigmoid',
    init_conv_kwargs=dict(ratio_gin=0, ratio_gout=0, enable_lfu=False),
    downsample_conv_kwargs=dict(ratio_gin=0, ratio_gout=0, enable_lfu=False),
    resnet_conv_kwargs=dict(ratio_gin=0.75, ratio_gout=0.75, enable_lfu=False),
)


def test_export_torch_checkpoint_roundtrip(tmp_path, rng):
    from conftest import stub_reference_deps
    stub_reference_deps()
    sys.path.insert(0, '/root/reference')
    from saicinpainting.training.modules import ffc as ref_ffc

    from lama_tpu.models import make_generator
    from lama_tpu.training.checkpoint import save_pytree

    # build + save a randomly-initialised flax generator as a model dir
    model_dir = tmp_path / 'model'
    (model_dir / 'models').mkdir(parents=True)
    with open(model_dir / 'config.yaml', 'w') as f:
        yaml.safe_dump({'generator': dict(kind='ffc_resnet', **GEN_KW)}, f)
    gen = make_generator('ffc_resnet', **GEN_KW)
    variables = gen.init(jax.random.PRNGKey(7), jnp.zeros((1, 64, 64, 4)),
                         train=False)
    save_pytree(str(model_dir / 'models' / 'best'), variables)

    out_ckpt = tmp_path / 'export.ckpt'
    env = dict(os.environ, JAX_PLATFORMS='cpu')
    res = subprocess.run(
        [sys.executable, os.path.join(REPO, 'bin', 'export_torch_checkpoint.py'),
         str(model_dir), str(out_ckpt)],
        capture_output=True, text=True, env=env, cwd=REPO, timeout=600)
    assert res.returncode == 0, res.stderr[-2000:]
    assert out_ckpt.exists()

    # load into the ACTUAL reference module (as its load_checkpoint does)
    state = torch.load(str(out_ckpt), map_location='cpu', weights_only=False)
    sd = {k[len('generator.'):]: v for k, v in state['state_dict'].items()
          if k.startswith('generator.')}
    ref_gen = ref_ffc.FFCResNetGenerator(**GEN_KW).eval()
    missing, unexpected = ref_gen.load_state_dict(sd, strict=True), None
    x = rng.rand(2, 4, 64, 64).astype(np.float32)
    with torch.no_grad():
        ref_out = ref_gen(torch.from_numpy(x)).numpy()
    out = gen.apply(variables, jnp.asarray(np.transpose(x, (0, 2, 3, 1))),
                    train=False)
    out = np.transpose(np.asarray(out), (0, 3, 1, 2))
    np.testing.assert_allclose(out, ref_out, rtol=1e-3, atol=2e-4)
