"""ADE20k semantic segmentation: ResNet50-dilated encoder + PPM-deepsup
decoder (reference models/ade20k/base.py: ModelBuilder/SegmentationModule/
PPMDeepsup). Used by segmentation-aware metrics and segmentation-guided
ablation losses. NHWC flax; weights convert from
ade20k-resnet50dilated-ppm_deepsup {encoder,decoder}_epoch_20.pth when
provided, random init (loudly flagged) otherwise.
"""
import logging
import os
from typing import Any, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ...ops.conv import Conv2d
from ...ops.norm import BatchNorm
from ...ops.resize import interpolate
from .resnet import ResNetDilatedEncoder
from .vgg import imagenet_normalize

LOGGER = logging.getLogger(__name__)

NUM_CLASS = 150


def adaptive_avg_pool2d_torch(x, output_size: int):
    """torch AdaptiveAvgPool2d with variable windows: bin i spans
    [floor(i*H/out), ceil((i+1)*H/out)). Output sizes here are tiny (1..6)."""
    _, h, w, _ = x.shape
    rows = []
    for i in range(output_size):
        r0, r1 = (i * h) // output_size, -(-((i + 1) * h) // output_size)
        cols = []
        for j in range(output_size):
            c0, c1 = (j * w) // output_size, -(-((j + 1) * w) // output_size)
            cols.append(jnp.mean(x[:, r0:r1, c0:c1, :], axis=(1, 2)))
        rows.append(jnp.stack(cols, axis=1))
    return jnp.stack(rows, axis=1)  # (B, out, out, C)


class PPMDeepsup(nn.Module):
    """Pyramid pooling decoder head (reference base.py:290-345)."""
    num_class: int = NUM_CLASS
    fc_dim: int = 2048
    pool_scales: Sequence[int] = (1, 2, 3, 6)
    drop_last_conv: bool = False
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, conv_out: List[jnp.ndarray], seg_size=None, train: bool = False):
        conv5 = conv_out[-1]
        input_size = conv5.shape[1:3]
        ppm_out = [conv5]
        for i, scale in enumerate(self.pool_scales):
            pooled = adaptive_avg_pool2d_torch(conv5, scale)
            pooled = Conv2d(512, kernel_size=1, use_bias=False, name=f'ppm_{i}_1',
                            dtype=self.dtype)(pooled)
            pooled = BatchNorm(name=f'ppm_{i}_2')(pooled, use_running_average=not train)
            pooled = jax.nn.relu(pooled)
            ppm_out.append(interpolate(pooled, size=input_size, mode='bilinear',
                                       align_corners=False))
        ppm_out = jnp.concatenate(ppm_out, axis=-1)
        if self.drop_last_conv:
            return ppm_out

        x = Conv2d(512, kernel_size=3, padding=1, use_bias=False, name='conv_last_0',
                   dtype=self.dtype)(ppm_out)
        x = BatchNorm(name='conv_last_1')(x, use_running_average=not train)
        x = jax.nn.relu(x)
        # dropout (p=0.1) omitted at inference; decoder is frozen here
        x = Conv2d(self.num_class, kernel_size=1, name='conv_last_4',
                   dtype=self.dtype)(x)

        if seg_size is not None:  # inference: upscale + softmax (base.py:339-343)
            x = interpolate(x, size=seg_size, mode='bilinear', align_corners=False)
            x = jax.nn.softmax(x.astype(jnp.float32), axis=-1)
        else:
            x = jax.nn.log_softmax(x.astype(jnp.float32), axis=-1)
        return x


class C1DeepSup(nn.Module):
    """Last-conv decoder with deep supervision (reference base.py:515-552);
    pairs with the mobilenetv2dilated encoder (fc_dim=320)."""
    num_class: int = NUM_CLASS
    fc_dim: int = 320
    drop_last_conv: bool = False
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, conv_out: List[jnp.ndarray], seg_size=None, train: bool = False):
        conv5 = conv_out[-1]
        x = Conv2d(self.fc_dim // 4, kernel_size=3, padding=1, use_bias=False,
                   name='cbr_0', dtype=self.dtype)(conv5)
        x = BatchNorm(name='cbr_1')(x, use_running_average=not train)
        x = jax.nn.relu(x)
        if self.drop_last_conv:
            return x
        x = Conv2d(self.num_class, kernel_size=1, name='conv_last',
                   dtype=self.dtype)(x)
        if seg_size is not None:
            x = interpolate(x, size=seg_size, mode='bilinear', align_corners=False)
            return jax.nn.softmax(x.astype(jnp.float32), axis=-1)
        return jax.nn.log_softmax(x.astype(jnp.float32), axis=-1)


class SegmentationModuleNet(nn.Module):
    """encoder + decoder as one module (apply-once). arch_encoder:
    resnet50dilated (+ppm_deepsup) | mobilenetv2dilated (+c1_deepsup),
    matching the reference ModelBuilder pairs (base.py:166-173)."""
    arch_encoder: str = 'resnet50dilated'
    drop_last_conv: bool = False
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x, seg_size=None, train: bool = False,
                 return_feature_maps: bool = False):
        if self.arch_encoder == 'resnet50dilated':
            fmaps = ResNetDilatedEncoder(name='encoder', dtype=self.dtype)(x, train=train)
            if return_feature_maps:
                return fmaps
            return PPMDeepsup(drop_last_conv=self.drop_last_conv, name='decoder',
                              dtype=self.dtype)(fmaps, seg_size=seg_size, train=train)
        if self.arch_encoder == 'mobilenetv2dilated':
            from .mobilenet import MobileNetV2DilatedEncoder
            fmaps = MobileNetV2DilatedEncoder(name='encoder', dtype=self.dtype)(x, train=train)
            if return_feature_maps:
                return fmaps
            return C1DeepSup(fc_dim=320, drop_last_conv=self.drop_last_conv,
                             name='decoder', dtype=self.dtype)(fmaps, seg_size=seg_size,
                                                               train=train)
        raise NotImplementedError(f'No such arch_encoder={self.arch_encoder}')


def resolve_ade20k_weight_paths(weights_path: Optional[str],
                                arch_encoder: str = 'resnet50dilated'):
    """Resolve the (encoder, decoder) .pth pair under a TORCH_HOME-style root
    (single owner of the on-disk layout — the reference hardcodes it in
    models/ade20k/base.py:152-158). Returns (None, None) unless BOTH files
    exist: a partial download would otherwise silently mix real and random
    weights."""
    if not weights_path:
        return None, None
    enc = weights_path if weights_path.endswith('.pth') else os.path.join(
        weights_path, 'ade20k', f'ade20k-{arch_encoder}-ppm_deepsup',
        'encoder_epoch_20.pth')
    dec = enc.replace('encoder_', 'decoder_')
    if not (os.path.exists(enc) and os.path.exists(dec)):
        if os.path.exists(enc) != os.path.exists(dec):
            LOGGER.warning(
                f'Partial ADE20k weights: only one of {enc} / {dec} exists; '
                'ignoring both (encoder and decoder must be fetched together)')
        return None, None
    return enc, dec


class SegmentationModule:
    """Frozen inference wrapper (reference base.py:147-287): [0,1] RGB NHWC
    in, per-pixel ADE20k label map out."""

    def __init__(self, weights_path: Optional[str] = None, variables=None,
                 arch_encoder: str = 'resnet50dilated',
                 use_default_normalization: bool = True, dtype=None):
        self.model = SegmentationModuleNet(arch_encoder=arch_encoder, dtype=dtype)
        self.use_default_normalization = use_default_normalization
        if variables is None:
            variables = self.model.init(jax.random.PRNGKey(0),
                                        jnp.zeros((1, 64, 64, 3)), train=False)
            loaded = False
            enc, dec = resolve_ade20k_weight_paths(weights_path, arch_encoder)
            if enc is not None:
                import torch
                from ...training.convert import torch_to_flax
                for part, path in (('encoder', enc), ('decoder', dec)):
                    state = torch.load(path, map_location='cpu',
                                       weights_only=False)
                    template = {'params': variables['params'][part],
                                'batch_stats': variables['batch_stats'][part]}
                    part_vars = torch_to_flax(state, template, strict=False)
                    variables['params'][part] = part_vars['params']
                    variables['batch_stats'][part] = part_vars['batch_stats']
                loaded = True
            if not loaded:
                LOGGER.warning('SegmentationModule weights unavailable '
                               f'({weights_path}); RANDOM weights — segmentation '
                               'outputs are only self-consistent.')
        self.variables = jax.tree.map(jax.lax.stop_gradient, variables)
        self._predict = jax.jit(self._predict_impl, static_argnames=('seg_size',))

    def _predict_impl(self, variables, x, seg_size):
        if self.use_default_normalization:
            x = imagenet_normalize(x)
        scores = self.model.apply(variables, x, seg_size=seg_size, train=False)
        return jnp.argmax(scores, axis=-1), scores

    def predict(self, images, seg_size=None) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """images: NHWC [0,1]. Returns (label map (B,H,W), class scores)."""
        seg_size = tuple(seg_size) if seg_size is not None else tuple(images.shape[1:3])
        return self._predict(self.variables, images, seg_size)

    def get_feature_maps(self, images, train=False):
        if self.use_default_normalization:
            images = imagenet_normalize(images)
        return self.model.apply(self.variables, images, train=train,
                                return_feature_maps=True)
