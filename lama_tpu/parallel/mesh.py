"""Mesh construction and sharding rules — the TPU-native replacement for the
reference's Lightning DDP plumbing (SURVEY §2.9, §5.8).

Design: a 1-D ('data',) mesh for training (gradients psum over ICI implicitly
via pjit), optionally 2-D ('data', 'space') for high-resolution inference where
the H axis of activations is sharded (the "sequence-parallel analogue" for
resolution scaling, SURVEY §5.7). Parameters are replicated; batches are
sharded along 'data'. No NCCL-analogue code exists — XLA inserts collectives.
"""
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(axes: Sequence[str] = ('data',), shape: Optional[Sequence[int]] = None,
              devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if shape is None:
        shape = (n,) if len(axes) == 1 else (n // 1, 1)[:len(axes)]
        if len(axes) == 2:
            shape = (n, 1)
    assert int(np.prod(shape)) == n, (shape, n)
    dev_array = np.asarray(devices).reshape(shape)
    return Mesh(dev_array, axis_names=tuple(axes))


def batch_sharding(mesh: Mesh, axis: str = 'data') -> NamedSharding:
    """Shard the leading (batch) dimension over the data axis."""
    return NamedSharding(mesh, P(axis))


def replicate_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def spatial_sharding(mesh: Mesh, data_axis: str = 'data', space_axis: str = 'space') -> NamedSharding:
    """(B, H, W, C) with B over data and H over space — for >2k inference."""
    return NamedSharding(mesh, P(data_axis, space_axis))


def shard_predict(predict_fn, mesh: Mesh, data_axis: str = 'data',
                  space_axis: Optional[str] = 'space'):
    """jit a `predict_fn(variables, image, mask) -> image` for 2-D
    (data, space) sharding: batch over `data_axis`, image H over
    `space_axis` — the resolution-scaling analogue of sequence parallelism
    (SURVEY §5.7). GSPMD inserts halo exchanges for the reflect-padded convs
    and collectives for the H-axis DFT matmuls automatically; no manual
    pipeline split (unlike the reference refiner's multi-GPU rears,
    refinement.py:266-289)."""
    spec = P(data_axis, space_axis) if space_axis in mesh.axis_names else P(data_axis)
    img_sharding = NamedSharding(mesh, spec)
    repl = NamedSharding(mesh, P())
    return jax.jit(predict_fn,
                   in_shardings=(None, img_sharding, img_sharding),
                   out_shardings=img_sharding), img_sharding, repl


def put_replicated(tree, mesh: Mesh):
    """Place a host-local pytree fully replicated over the (possibly
    multi-process) mesh. Single process: plain device_put. Multi-process:
    every process must pass the SAME values (deterministic init);
    make_array_from_process_local_data assembles the global arrays."""
    repl = replicate_sharding(mesh)
    if jax.process_count() == 1:
        return jax.device_put(tree, repl)
    return jax.tree.map(
        lambda x: jax.make_array_from_process_local_data(repl, np.asarray(x)),
        tree)


def put_batch(tree, mesh: Mesh, axis: str = 'data'):
    """Place per-host batch shards onto the mesh's data axis. Single process:
    the tree IS the global batch. Multi-process: each process passes its own
    BatchLoader shard (shard_id=process_index) and the global batch is the
    concatenation over processes — the per-host input sharding the reference's
    DDP sampler never actually did (SURVEY §2.2 quirk)."""
    bsh = batch_sharding(mesh, axis)
    if jax.process_count() == 1:
        return jax.device_put(tree, bsh)
    return jax.tree.map(
        lambda x: jax.make_array_from_process_local_data(bsh, np.asarray(x)),
        tree)


def shard_train_step(step_fn, mesh: Mesh, state, batch_axis: str = 'data'):
    """jit `step_fn(state, batch, rng)` with params replicated and the batch
    sharded along `batch_axis`. Returns (jitted_fn, sharded_state).
    Multi-host safe: state placement goes through put_replicated."""
    repl = replicate_sharding(mesh)
    bsh = batch_sharding(mesh, batch_axis)

    state_sharding = jax.tree.map(lambda _: repl, state)
    batch_sharding_tree = {'image': bsh, 'mask': bsh}

    fn = jax.jit(step_fn,
                 in_shardings=(state_sharding, batch_sharding_tree, repl),
                 out_shardings=(state_sharding, None),
                 donate_argnums=(0,))
    sharded_state = put_replicated(state, mesh)
    return fn, sharded_state


def shard_train_scan(step_fn, mesh: Mesh, state, batch_axis: str = 'data'):
    """jit a `lax.scan` of `step_fn(state, batch, rng)` over a
    (K, batch, ...)-stacked batch and a (K, 2) PRNGKey stack — K optimizer
    steps in ONE XLA program per dispatch (`trainer.kwargs.steps_per_dispatch`).

    Per-step semantics are identical to `shard_train_step` (same batches in
    the same order, the same per-step PRNG keys, the same donated-state
    threading through the optimizer/EMA updates); only the host↔device
    dispatch cadence changes. Bit-identity with the K=1 program is NOT
    guaranteed: XLA fuses the scanned body independently, so expect
    float-jitter-level (~1e-7) divergence that Adam can amplify on
    near-zero-gradient weights — loss trajectories agree to ~1e-7 relative
    (tests/test_trainer.py::test_trainer_steps_per_dispatch_matches_single). This amortizes per-dispatch overhead — host
    Python, transfer setup, and on remote-dispatch links (the axon relay's
    ~140 ms round trip) the wire latency — across K steps, trading it for a
    K-step loss-logging granularity. The stacked metrics for ALL K steps are
    returned so observability (per-step logs, NaN screens) is preserved.

    The leading K axis is unsharded; the batch axis stays on `batch_axis`.
    No reference counterpart — pytorch-lightning dispatches one optimizer
    step per `training_step` call by construction."""
    repl = replicate_sharding(mesh)
    bsh = NamedSharding(mesh, P(None, batch_axis))

    state_sharding = jax.tree.map(lambda _: repl, state)
    batch_sharding_tree = {'image': bsh, 'mask': bsh}

    def scan_fn(state, batches, keys):
        def body(s, batch_key):
            batch, key = batch_key
            return step_fn(s, batch, key)
        return jax.lax.scan(body, state, (batches, keys))

    return jax.jit(scan_fn,
                   in_shardings=(state_sharding, batch_sharding_tree, repl),
                   out_shardings=(state_sharding, None),
                   donate_argnums=(0,))


def put_step_stack(tree, mesh: Mesh, axis: str = 'data'):
    """Place a (K, batch, ...) step-stacked batch: K unsharded, batch on
    `axis`. Multi-process: each host passes its own (K, local_batch, ...)
    stack and the global batch axis is the concatenation over hosts (same
    contract as put_batch, one axis deeper)."""
    bsh = NamedSharding(mesh, P(None, axis))
    if jax.process_count() == 1:
        return jax.device_put(tree, bsh)
    return jax.tree.map(
        lambda x: jax.make_array_from_process_local_data(bsh, np.asarray(x)),
        tree)
