"""BatchNorm with torch-parity semantics plus optional cross-replica sync.

torch BatchNorm2d (the norm used everywhere in the reference: ffc.py:60,131,
modules/base.py:33-40): eps=1e-5, momentum=0.1, normalisation uses *biased*
batch variance, running_var is updated with the *unbiased* variance. Under DDP
the reference keeps per-device statistics (SURVEY §2.9); we default to the same
(axis_name=None) and expose `axis_name='data'` for pmean-synchronised stats —
the TPU-idiomatic SyncBN that replaces the vendored segm_lib SynchronizedBatchNorm.

Stats are stored in the 'batch_stats' mutable collection (mean, var) in fp32;
compute happens in fp32 regardless of activation dtype (BN is
bandwidth-bound, not MXU-bound, and bf16 variance accumulation drifts).
"""
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn


class BatchNorm(nn.Module):
    use_running_average: Optional[bool] = None
    momentum: float = 0.1  # torch convention: new = (1-m)*old + m*batch
    epsilon: float = 1e-5
    use_scale: bool = True
    use_bias: bool = True
    axis_name: Optional[str] = None  # set to mesh axis for cross-replica stats
    dtype: Optional[Any] = None
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, use_running_average: Optional[bool] = None):
        use_running_average = nn.merge_param(
            'use_running_average', self.use_running_average, use_running_average)
        features = x.shape[-1]
        reduction_axes = tuple(range(x.ndim - 1))

        ra_mean = self.variable('batch_stats', 'mean',
                                lambda: jnp.zeros((features,), jnp.float32))
        ra_var = self.variable('batch_stats', 'var',
                               lambda: jnp.ones((features,), jnp.float32))

        # note: pre-folding running stats into a scale/shift pair (both bf16
        # and fp32 variants) was measured SLOWER end-to-end on v5e (128.6 ->
        # ~113 img/s) than this direct formulation — XLA's fusion prefers it;
        # do not "optimise" this without re-benchmarking.
        x32 = x.astype(jnp.float32)
        if use_running_average:
            mean, var = ra_mean.value, ra_var.value
        else:
            # training: batch statistics in fp32 (bf16 accumulation drifts)
            mean = jnp.mean(x32, axis=reduction_axes)
            mean2 = jnp.mean(jnp.square(x32), axis=reduction_axes)
            if self.axis_name is not None:
                mean = jax.lax.pmean(mean, axis_name=self.axis_name)
                mean2 = jax.lax.pmean(mean2, axis_name=self.axis_name)
            var = jnp.maximum(mean2 - jnp.square(mean), 0.0)
            if not self.is_initializing():
                n = x32.size / features
                if self.axis_name is not None:
                    n = n * jax.lax.psum(1, axis_name=self.axis_name)
                unbiased = var * (n / max(n - 1, 1))
                ra_mean.value = (1 - self.momentum) * ra_mean.value + self.momentum * mean
                ra_var.value = (1 - self.momentum) * ra_var.value + self.momentum * unbiased

        y = (x32 - mean) * jax.lax.rsqrt(var + self.epsilon)
        if self.use_scale:
            scale = self.param('scale', nn.initializers.ones, (features,), self.param_dtype)
            y = y * scale
        if self.use_bias:
            bias = self.param('bias', nn.initializers.zeros, (features,), self.param_dtype)
            y = y + bias
        return y.astype(self.dtype or x.dtype)


class PermutedBatchNorm(nn.Module):
    """BatchNorm whose STORED params/stats live in a permuted channel order
    relative to the activations it normalises: reads gather with `perm`
    (activation channel j corresponds to stored channel perm[j]), running-stat
    writes scatter back with the inverse permutation. Variable names/shapes
    are identical to `BatchNorm`, so it can be dropped onto an existing 'bn'
    scope without touching checkpoints.

    Used by FourierUnit's concat-layout spectral path (models/ffc.py): the
    reference stores spectral BN channels per-channel interleaved
    ([re_0, im_0, re_1, ...]); the TPU-fast activation layout is channel
    halves ([re_*, im_*]). Channel-vector gathers are free next to the
    full-tensor shuffle they replace.
    """
    perm: Any  # tuple of ints, len == features
    momentum: float = 0.1
    epsilon: float = 1e-5
    axis_name: Optional[str] = None
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, use_running_average: bool = True):
        features = x.shape[-1]
        perm = np.asarray(self.perm)
        assert perm.shape == (features,), (perm.shape, features)
        inv = np.argsort(perm)
        reduction_axes = tuple(range(x.ndim - 1))

        ra_mean = self.variable('batch_stats', 'mean',
                                lambda: jnp.zeros((features,), jnp.float32))
        ra_var = self.variable('batch_stats', 'var',
                               lambda: jnp.ones((features,), jnp.float32))

        x32 = x.astype(jnp.float32)
        if use_running_average:
            mean, var = ra_mean.value[perm], ra_var.value[perm]
        else:
            mean = jnp.mean(x32, axis=reduction_axes)
            mean2 = jnp.mean(jnp.square(x32), axis=reduction_axes)
            if self.axis_name is not None:
                mean = jax.lax.pmean(mean, axis_name=self.axis_name)
                mean2 = jax.lax.pmean(mean2, axis_name=self.axis_name)
            var = jnp.maximum(mean2 - jnp.square(mean), 0.0)
            if not self.is_initializing():
                n = x32.size / features
                if self.axis_name is not None:
                    n = n * jax.lax.psum(1, axis_name=self.axis_name)
                unbiased = var * (n / max(n - 1, 1))
                ra_mean.value = ((1 - self.momentum) * ra_mean.value
                                 + self.momentum * mean[inv])
                ra_var.value = ((1 - self.momentum) * ra_var.value
                                + self.momentum * unbiased[inv])

        y = (x32 - mean) * jax.lax.rsqrt(var + self.epsilon)
        scale = self.param('scale', nn.initializers.ones, (features,),
                           self.param_dtype)
        bias = self.param('bias', nn.initializers.zeros, (features,),
                          self.param_dtype)
        y = y * scale[perm] + bias[perm]
        return y.astype(x.dtype)
