"""Multi-host runtime initialisation — the TPU-native replacement for the
reference's DDP env handshake (saicinpainting/utils.py:134-177: MASTER_PORT /
NODE_RANK / WORLD_SIZE parsing + subprocess cwd pinning).

On TPU pods `jax.distributed.initialize()` discovers the topology from the
environment; on GPU/CPU clusters pass coordinator/process info explicitly or
via JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID. After
initialisation all jit/pjit programs are SPMD across every host's devices;
per-host input sharding comes from BatchLoader(shard_id=process_index).
"""
import logging
import os
from typing import Optional

import jax

LOGGER = logging.getLogger(__name__)


def maybe_initialize_distributed(coordinator_address: Optional[str] = None,
                                 num_processes: Optional[int] = None,
                                 process_id: Optional[int] = None) -> bool:
    """Initialise the multi-host runtime when the environment asks for it.
    Returns True if distributed mode is active."""
    coordinator_address = coordinator_address or os.environ.get('JAX_COORDINATOR_ADDRESS')
    num_processes = num_processes if num_processes is not None else \
        _int_env('JAX_NUM_PROCESSES')
    process_id = process_id if process_id is not None else _int_env('JAX_PROCESS_ID')

    if coordinator_address is None and num_processes is None:
        if os.environ.get('TPU_WORKER_HOSTNAMES') and _looks_like_pod():
            jax.distributed.initialize()
            LOGGER.info(f'TPU pod runtime: process {jax.process_index()} '
                        f'of {jax.process_count()}')
            return True
        return False

    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id)
    LOGGER.info(f'distributed runtime: process {jax.process_index()} '
                f'of {jax.process_count()} via {coordinator_address}')
    return True


def _int_env(name):
    v = os.environ.get(name)
    return int(v) if v else None


def _looks_like_pod() -> bool:
    hostnames = os.environ.get('TPU_WORKER_HOSTNAMES', '')
    return ',' in hostnames


def is_main_process() -> bool:
    """rank-0 gating for logging/checkpoints (reference base.py:290-291)."""
    return jax.process_index() == 0


def allgather_pyobj(obj):
    """Gather one arbitrary picklable object per process; returns the list in
    process-rank order (single process: `[obj]`).

    The TPU-native analogue of torch.distributed.all_gather_object, used to
    merge per-host evaluator states at validation end (reference
    trainers/base.py:189-209 relies on Lightning's DDP state gathering).
    Objects are pickled to uint8 payloads, zero-padded to the max payload
    length (multihost allgather needs equal shapes per process), gathered
    through the ICI/DCN fabric, and unpickled per rank. Collective: every
    process must call it the same number of times."""
    if jax.process_count() == 1:
        return [obj]
    import pickle

    import numpy as np
    from jax.experimental import multihost_utils

    payload = np.frombuffer(pickle.dumps(obj), dtype=np.uint8)
    lengths = np.asarray(multihost_utils.process_allgather(
        np.asarray([payload.size], np.int32))).reshape(-1)
    padded = np.zeros((int(lengths.max()),), np.uint8)
    padded[:payload.size] = payload
    gathered = np.asarray(multihost_utils.process_allgather(padded))
    return [pickle.loads(gathered[i, :int(lengths[i])].tobytes())
            for i in range(jax.process_count())]
