"""Small host-side helpers (dict flattening, metric averaging, debug signals).

Mirrors the utility surface of the reference saicinpainting/utils.py:27-118 in a
framework-neutral way: values may be python floats, numpy scalars or jax arrays.
"""
import logging
import numbers
import os
import signal
import sys
import traceback

LOGGER = logging.getLogger(__name__)


def check_and_warn_input_range(tensor, min_value, max_value, name):
    actual_min = float(tensor.min())
    actual_max = float(tensor.max())
    if actual_min < min_value or actual_max > max_value:
        LOGGER.warning(f"{name} must be in {min_value}..{max_value} range, but it ranges {actual_min}..{actual_max}")


def sum_dict_with_prefix(target, cur_dict, prefix, default=0):
    for k, v in cur_dict.items():
        target_key = prefix + k
        target[target_key] = target.get(target_key, default) + v


def average_dicts(dict_list):
    result = {}
    norm = 1e-3
    for dct in dict_list:
        sum_dict_with_prefix(result, dct, '')
        norm += 1
    for k in list(result):
        result[k] = result[k] / norm
    return result


def add_prefix_to_keys(dct, prefix):
    return {prefix + k: v for k, v in dct.items()}


def set_requires_grad(module, value):  # kept for API familiarity; no-op in functional JAX
    del module, value


def flatten_dict(dct):
    result = {}
    for k, v in dct.items():
        if isinstance(k, tuple):
            k = '_'.join(k)
        if isinstance(v, dict):
            for sub_k, sub_v in flatten_dict(v).items():
                result[f'{k}_{sub_k}'] = sub_v
        else:
            result[k] = v
    return result


def handle_deterministic_config(config):
    seed = dict(config).get('seed', None) if hasattr(config, 'get') else getattr(config, 'seed', None)
    if seed is None:
        return False
    import random

    import numpy as np
    random.seed(seed)
    np.random.seed(seed)
    return True


def print_traceback_handler(sig, frame):
    LOGGER.warning(f'Received signal {sig}')
    bt = ''.join(traceback.format_stack())
    LOGGER.warning(f'Requested stack trace:\n{bt}')


def register_debug_signal_handlers(sig=None, handler=print_traceback_handler):
    if sig is None:
        sig = getattr(signal, 'SIGUSR1', None)
    if sig is None:  # windows
        return
    LOGGER.warning(f'Setting signal {sig} handler {handler}')
    signal.signal(sig, handler)


def get_shape(t):
    if hasattr(t, 'shape'):
        return t.shape
    if isinstance(t, dict):
        return {n: get_shape(q) for n, q in t.items()}
    if isinstance(t, (list, tuple)):
        return [get_shape(q) for q in t]
    if isinstance(t, numbers.Number):
        return type(t)
    raise ValueError(f'unexpected type {type(t)}')


def handle_ddp_subprocess():  # decorator kept for CLI-compat; multi-host JAX needs no cwd pinning
    def main_decorator(main_func):
        return main_func
    return main_decorator


def enable_compilation_cache(cache_dir=None):
    """Wire jax's persistent compilation cache (VERDICT r2 item 3: cold-start
    compiles through the axon relay cost 316-1558 s per program with no cache).

    Dir precedence: explicit arg > $LAMA_COMPILATION_CACHE > ~/.cache/lama_tpu/jax.
    Set LAMA_COMPILATION_CACHE=off to disable. Safe to call multiple times and
    before/after backend init (jax reads the config at compile time)."""
    import jax

    env = os.environ.get('LAMA_COMPILATION_CACHE', '')
    if env.lower() in ('off', '0', 'none', 'disable'):
        return None
    cache_dir = cache_dir or env or os.path.join(
        os.path.expanduser('~'), '.cache', 'lama_tpu', 'jax')
    try:
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update('jax_compilation_cache_dir', cache_dir)
        # cache everything: tiny eager programs through the relay still cost
        # seconds to compile, and disk is cheap
        jax.config.update('jax_persistent_cache_min_entry_size_bytes', -1)
        jax.config.update('jax_persistent_cache_min_compile_time_secs', 0.0)
        # the cache backend initialises lazily ONCE per process; if compiles
        # already happened with no dir configured, reset so the new dir takes
        from jax._src import compilation_cache as _cc
        _cc.reset_cache()
    except Exception as ex:  # unsupported jax version / read-only fs
        LOGGER.warning(f'persistent compilation cache unavailable: {ex}')
        return None
    return cache_dir
