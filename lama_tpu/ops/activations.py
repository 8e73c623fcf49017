"""Activation registry matching the reference's get_activation (modules/base.py:43-50)."""
import jax
import jax.numpy as jnp


def identity(x):
    return x


def leaky_relu_02(x):
    return jax.nn.leaky_relu(x, negative_slope=0.2)


_ACTIVATIONS = {
    'tanh': jnp.tanh,
    'sigmoid': jax.nn.sigmoid,
    'relu': jax.nn.relu,
    'leaky_relu': leaky_relu_02,
    False: identity,
    'identity': identity,
    'none': identity,
}


def get_activation(kind='tanh'):
    if callable(kind):
        return kind
    if kind in _ACTIVATIONS:
        return _ACTIVATIONS[kind]
    raise ValueError(f'Unknown activation kind {kind}')
