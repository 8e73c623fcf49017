"""Training state: one pytree holding both GAN players, their optimizers,
BN statistics and the generator EMA.

Replaces the reference's LightningModule attribute soup (trainers/base.py:57-123)
with an explicit functional state. Checkpointing (orbax) serialises this pytree
directly — the analogue of Lightning's {'state_dict', 'optimizer_states'}
(SURVEY §5.4).
"""
from typing import Any, Optional

import jax
import jax.numpy as jnp
import optax
from flax import struct


def make_optimizer(kind='adamw', lr=1e-3, beta1=0.9, beta2=0.999, eps=1e-8,
                   weight_decay=0.01, clip_grad_norm=None, **kwargs):
    """Optimizer factory (reference trainers/base.py:24-31 + Lightning
    gradient_clip_val). torch Adam/AdamW defaults."""
    if kind == 'adam':
        tx = optax.adam(lr, b1=beta1, b2=beta2, eps=eps)
    elif kind == 'adamw':
        tx = optax.adamw(lr, b1=beta1, b2=beta2, eps=eps, weight_decay=weight_decay)
    elif kind == 'sgd':
        tx = optax.sgd(lr, **kwargs)
    else:
        raise ValueError(f'Unknown optimizer kind {kind}')
    if clip_grad_norm is not None:
        tx = optax.chain(optax.clip_by_global_norm(clip_grad_norm), tx)
    return tx


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    g_params: Any
    g_stats: Any
    d_params: Any
    d_stats: Any
    g_opt_state: Any
    d_opt_state: Any
    ema_params: Any  # generator EMA (reference base.py:92-97, decay .999)

    def replace_step(self, step):
        return self.replace(step=step)


def create_train_state(rng, generator, discriminator, sample_batch,
                       g_tx, d_tx, use_ema: bool = True, gen_input_fn=None):
    """Initialise all parameters/stats/optimizer states from a sample batch
    dict with NHWC 'image' (B,H,W,3) and 'mask' (B,H,W,1). `gen_input_fn`
    overrides the default masked+mask-concat input construction (needed when
    add_noise_kwargs widens the generator input)."""
    img, mask = sample_batch['image'], sample_batch['mask']
    if gen_input_fn is not None:
        masked = gen_input_fn(img, mask)
    else:
        masked = jnp.concatenate([img * (1 - mask), mask], axis=-1)
    g_rng, d_rng = jax.random.split(rng)
    g_vars = generator.init(g_rng, masked, train=False)
    d_vars = discriminator.init(d_rng, img, train=False)
    g_params = g_vars['params']
    d_params = d_vars['params']
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        g_params=g_params,
        g_stats=g_vars.get('batch_stats', {}),
        d_params=d_params,
        d_stats=d_vars.get('batch_stats', {}),
        g_opt_state=g_tx.init(g_params),
        d_opt_state=d_tx.init(d_params),
        ema_params=jax.tree.map(jnp.copy, g_params) if use_ema else None,
    )
