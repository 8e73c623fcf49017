"""Config system tests: composition, packages, interpolation, overrides —
against the real configs/ tree."""
import os

import pytest

from lama_tpu.config import compose, parse_overrides
from lama_tpu.config.node import ConfigNode, resolve_interpolations

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
TRAIN_CFG = os.path.join(REPO, 'configs', 'training')


def test_compose_big_lama(monkeypatch):
    monkeypatch.setenv('TORCH_HOME', '/tmp/torch_home')
    cfg = compose(TRAIN_CFG, 'big-lama')
    assert cfg.generator.kind == 'ffc_resnet'
    assert cfg.generator.n_blocks == 18
    # interpolation chains resolved
    assert cfg.generator.downsample_conv_kwargs.ratio_gin == 0
    assert cfg.generator.resnet_conv_kwargs.ratio_gout == 0.75
    # groups landed under their keys
    assert cfg.discriminator.kind == 'pix2pixhd_nlayer'
    assert cfg.optimizers.generator.lr == 0.001
    assert cfg.data.batch_size == 10
    assert cfg.trainer.checkpoint_kwargs.monitor == 'val_ssim_fid100_f1_total_mean'
    # env interpolation
    assert cfg.losses.resnet_pl.weights_path == '/tmp/torch_home'
    # nested reference through group file
    assert cfg.data.train.mask_gen_kwargs.irregular_kwargs.max_len == 200


def test_compose_lama_fourier_generator_group():
    cfg = compose(TRAIN_CFG, 'lama-fourier')
    assert cfg.generator.n_blocks == 9
    assert cfg.generator.resnet_conv_kwargs.ratio_gin == 0.75


def test_overrides_and_group_swap():
    cfg = compose(TRAIN_CFG, 'big-lama',
                  ['data.batch_size=4', 'generator.n_blocks=3',
                   'losses.adversarial.weight=20'])
    assert cfg.data.batch_size == 4
    assert cfg.generator.n_blocks == 3
    assert cfg.losses.adversarial.weight == 20


def test_parse_overrides_types():
    ov = parse_overrides(['a.b=1', 'a.c=1.5', 'a.d=true', 'a.e=hello', 'a.f=[1,2]'])
    assert ov['a.b'] == 1 and ov['a.c'] == 1.5 and ov['a.d'] is True
    assert ov['a.e'] == 'hello' and ov['a.f'] == [1, 2]


def test_interpolation_self_reference():
    node = ConfigNode({'x': {'a': 5, 'b': '${x.a}'}, 'y': '${x.b}'})
    resolve_interpolations(node)
    assert node.y == 5 and node.x.b == 5


def test_dotted_set_and_select():
    node = ConfigNode()
    node.set_path('a.b.c', 42)
    assert node.select('a.b.c') == 42
    assert node.select('a.missing', default='d') == 'd'


def test_delete_and_append_overrides():
    """Hydra's `~key` deletion and `+key=value` append syntaxes
    (hydra 1.1 basic override grammar, used e.g. to drop a loss term from
    the CLI without editing yamls)."""
    import pytest

    cfg = compose(TRAIN_CFG, 'big-lama',
                  ['~losses.resnet_pl', '+losses.new_term.weight=2'])
    assert 'resnet_pl' not in cfg.losses
    assert cfg.losses.new_term.weight == 2

    with pytest.raises(ValueError, match='missing config key'):
        compose(TRAIN_CFG, 'big-lama', ['~losses.nope'])
