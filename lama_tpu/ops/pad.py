"""Spatial padding for NHWC tensors with torch-compatible modes.

torch `padding_mode='reflect'` == jnp.pad 'reflect' (no edge repeat);
'replicate' == 'edge'; 'zeros' == 'constant'. Used wherever the reference uses
nn.ReflectionPad2d / Conv2d(padding_mode=...) (reference ffc.py:190,315,360).
"""
import jax.numpy as jnp

_TORCH_TO_JNP_MODE = {
    'reflect': 'reflect',
    'replicate': 'edge',
    'zeros': 'constant',
    'zero': 'constant',
    'constant': 'constant',
}


def pad2d(x, padding, mode='constant'):
    """Pad H and W of an NHWC tensor.

    padding: int or (pad_h, pad_w) or ((top, bottom), (left, right)).
    """
    if isinstance(padding, int):
        padding = ((padding, padding), (padding, padding))
    elif len(padding) == 2 and isinstance(padding[0], int):
        padding = ((padding[0], padding[0]), (padding[1], padding[1]))
    if all(p == 0 for pair in padding for p in pair):
        return x
    jmode = _TORCH_TO_JNP_MODE[mode]
    cfg = ((0, 0), tuple(padding[0]), tuple(padding[1]), (0, 0))
    if jmode == 'constant':
        return jnp.pad(x, cfg, mode='constant', constant_values=0)
    return jnp.pad(x, cfg, mode=jmode)


def reflection_pad2d(x, padding):
    return pad2d(x, padding, mode='reflect')
