"""Model factories (mirror reference saicinpainting/training/modules/__init__.py:7-31)."""
import logging

from .ffc import FFCResNetGenerator, FFCNLayerDiscriminator
from .pix2pixhd import (GlobalGenerator, MultiDilatedGlobalGenerator,
                        MultidilatedNLayerDiscriminator, NLayerDiscriminator)
from .pix2pixhd_extra import (ConfigGlobalGenerator,
                              GlobalGeneratorFromSuperChannels,
                              NLayerDiscriminatorAsGen)

LOGGER = logging.getLogger(__name__)


def make_generator(kind, serving_mode=None, **kwargs):
    """serving_mode: optional ops.serving_mode.ServingMode — static serving
    configuration (int8/zero-pad/bf16-store/s2d) attached to the module tree;
    None = the all-off default (training and reference-numerics paths)."""
    LOGGER.info(f'Make generator {kind}')
    if serving_mode is not None:
        kwargs['mode'] = serving_mode
    if kind == 'pix2pixhd_multidilated':
        return MultiDilatedGlobalGenerator(**kwargs)
    if kind == 'pix2pixhd_global':
        return GlobalGenerator(**kwargs)
    if kind == 'ffc_resnet':
        return FFCResNetGenerator(**kwargs)
    if kind == 'config_global':
        return ConfigGlobalGenerator(**kwargs)
    if kind == 'super_channels':
        return GlobalGeneratorFromSuperChannels(**kwargs)
    raise ValueError(f'Unknown generator kind {kind}')


def make_discriminator(kind, **kwargs):
    LOGGER.info(f'Make discriminator {kind}')
    if kind == 'pix2pixhd_nlayer_multidilated':
        return MultidilatedNLayerDiscriminator(**kwargs)
    if kind == 'pix2pixhd_nlayer':
        return NLayerDiscriminator(**kwargs)
    if kind == 'ffc_nlayer':
        return FFCNLayerDiscriminator(**kwargs)
    raise ValueError(f'Unknown discriminator kind {kind}')
