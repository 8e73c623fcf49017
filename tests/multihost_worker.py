"""One process of the 2-process multi-host rehearsal (run by
test_multihost.py): jax.distributed over a local coordinator, 4 forced CPU
devices per process, disjoint BatchLoader shards, one data-parallel GAN step
over the 8-device global mesh. Writes its observations as JSON for the parent
test to assert on. Replaces the reference's untested Lightning DDP handshake
(saicinpainting/utils.py:134-177)."""
import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument('--process-id', type=int, required=True)
    parser.add_argument('--num-processes', type=int, default=2)
    parser.add_argument('--coordinator', required=True)
    parser.add_argument('--outdir', required=True)
    args = parser.parse_args()

    import jax  # XLA_FLAGS (4 virtual CPU devices) set by the parent
    # the interpreter pre-imports jax pinned to the axon TPU platform; switch
    # to CPU before the backend initialises (see .claude/skills/verify)
    jax.config.update('jax_platforms', 'cpu')
    jax.distributed.initialize(coordinator_address=args.coordinator,
                               num_processes=args.num_processes,
                               process_id=args.process_id)
    assert jax.process_index() == args.process_id
    assert jax.local_device_count() == 4, jax.local_devices()
    assert jax.device_count() == 4 * args.num_processes

    import numpy as np
    import jax.numpy as jnp

    # ---- 1. per-host BatchLoader shards must be disjoint and equal-sized
    from lama_tpu.data.datasets import BatchLoader

    accessed = []

    class RecordingDataset:
        def __len__(self):
            return 16

        def __getitem__(self, i):
            accessed.append(int(i))
            rng = np.random.RandomState(i)
            img = rng.rand(16, 16, 3).astype(np.float32)
            mask = np.zeros((16, 16, 1), np.float32)
            mask[4:10, 4:10] = 1
            return {'image': img, 'mask': mask}

    loader = BatchLoader(RecordingDataset(), batch_size=4, shuffle=True,
                         drop_last=True, shard_id=args.process_id,
                         num_shards=args.num_processes, seed=0)
    loader.set_epoch(0)
    n_batches = sum(1 for _ in loader)

    # ---- 2. one fused GAN step over the global mesh; params must stay
    # identical across hosts (XLA psum over the data axis)
    from lama_tpu.losses.adversarial import make_discrim_loss
    from lama_tpu.models.ffc import FFCResNetGenerator
    from lama_tpu.models.pix2pixhd import NLayerDiscriminator
    from lama_tpu.parallel.mesh import make_mesh, put_batch, shard_train_step
    from lama_tpu.training.state import create_train_state, make_optimizer
    from lama_tpu.training.step import EMAConfig, InpaintingTrainStep, LossConfig

    gen = FFCResNetGenerator(
        input_nc=4, output_nc=3, ngf=8, n_downsampling=2, n_blocks=1,
        add_out_act='sigmoid',
        init_conv_kwargs=dict(ratio_gin=0, ratio_gout=0, enable_lfu=False),
        downsample_conv_kwargs=dict(ratio_gin=0, ratio_gout=0, enable_lfu=False),
        resnet_conv_kwargs=dict(ratio_gin=0.75, ratio_gout=0.75, enable_lfu=False))
    disc = NLayerDiscriminator(input_nc=3, ndf=8, n_layers=2)
    adv = make_discrim_loss('r1', weight=10, gp_coef=0.001,
                            mask_as_fake_target=True, allow_scale_mask=True)
    g_tx = make_optimizer('adam', lr=1e-3, clip_grad_norm=1.0)
    d_tx = make_optimizer('adam', lr=1e-4, clip_grad_norm=1.0)
    step = InpaintingTrainStep(gen, disc, adv, g_tx, d_tx,
                               loss_config=LossConfig(resnet_pl_weight=0.0),
                               ema=EMAConfig(enabled=False))

    # the same deterministic GLOBAL batch on every host; this host feeds its
    # contiguous slice (what BatchLoader sharding does in production)
    grng = np.random.RandomState(0)
    g_img = grng.rand(8, 32, 32, 3).astype(np.float32)
    g_mask = (grng.rand(8, 32, 32, 1) > 0.7).astype(np.float32)
    lo = args.process_id * 4
    local = {'image': g_img[lo:lo + 4], 'mask': g_mask[lo:lo + 4]}

    init_batch = {'image': jnp.asarray(g_img[:2]), 'mask': jnp.asarray(g_mask[:2])}
    state = create_train_state(jax.random.PRNGKey(0), gen, disc, init_batch,
                               g_tx, d_tx)

    mesh = make_mesh(('data',), devices=jax.devices())
    fn, sharded_state = shard_train_step(step, mesh, state)
    sharded_batch = put_batch(local, mesh)
    new_state, metrics = fn(sharded_state, sharded_batch, jax.random.PRNGKey(0))

    @jax.jit
    def param_fingerprint(params):
        return sum(jnp.sum(jnp.abs(l.astype(jnp.float64)))
                   for l in jax.tree.leaves(params))

    fp = float(param_fingerprint(new_state.g_params))
    out = {
        'process_id': args.process_id,
        'accessed_indices': sorted(accessed),
        'n_batches': n_batches,
        'g_param_fingerprint': repr(fp),
        'gen_total': float(metrics['gen_total']),
        'discr_total': float(metrics['discr_total']),
    }
    with open(os.path.join(args.outdir, f'worker{args.process_id}.json'), 'w') as f:
        json.dump(out, f)
    print(f'worker {args.process_id}: OK', flush=True)


if __name__ == '__main__':
    main()
