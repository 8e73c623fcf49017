"""Tracing/profiling utilities — the TPU upgrade of the reference's minimal
observability (SURVEY §5.1: SIGUSR1 stack dumps + tqdm). Keeps the signal
trick (utils/misc.py) and adds jax.profiler integration.
"""
import contextlib
import logging
import time

import jax
import numpy as np

LOGGER = logging.getLogger(__name__)


def start_trace_server(port: int = 9999):
    """Start the jax.profiler trace server (connect with TensorBoard's
    profile plugin or xprof)."""
    jax.profiler.start_server(port)
    LOGGER.info(f'jax.profiler trace server listening on :{port}')


@contextlib.contextmanager
def trace(logdir: str):
    """Capture a profiler trace of the enclosed block into `logdir`."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
        LOGGER.info(f'profiler trace written to {logdir}')


@contextlib.contextmanager
def annotate(name: str):
    with jax.profiler.TraceAnnotation(name):
        yield


class StepTimer:
    """block_until_ready-based step timing with a warmup discard."""

    def __init__(self, warmup: int = 2):
        self.warmup = warmup
        self.times = []
        self._count = 0

    @contextlib.contextmanager
    def step(self, result_to_block=None):
        t0 = time.perf_counter()
        yield
        if result_to_block is not None:
            jax.block_until_ready(result_to_block)
        self._count += 1
        if self._count > self.warmup:
            self.times.append(time.perf_counter() - t0)

    def summary(self):
        if not self.times:
            return {}
        arr = np.asarray(self.times)
        return {'mean_s': float(arr.mean()), 'median_s': float(np.median(arr)),
                'p90_s': float(np.percentile(arr, 90)), 'n': len(arr)}
