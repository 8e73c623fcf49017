"""Evaluation utilities (reference saicinpainting/evaluation/utils.py)."""
import enum

import jax
import yaml


def load_yaml(path):
    from ..config.node import ConfigNode
    with open(path) as f:
        return ConfigNode(yaml.safe_load(f))


def move_to_device(obj, device):
    """Recursively jax.device_put dict/list/tuple structures of arrays
    (reference evaluation/utils.py:14-23)."""
    if isinstance(obj, dict):
        return {k: move_to_device(v, device) for k, v in obj.items()}
    if isinstance(obj, (list, tuple)):
        return type(obj)(move_to_device(v, device) for v in obj)
    if hasattr(obj, 'shape'):
        return jax.device_put(obj, device)
    return obj


class SmallMode(enum.Enum):
    DROP = 'drop'
    UPSCALE = 'upscale'
