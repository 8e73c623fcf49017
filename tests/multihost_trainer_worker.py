"""One process of the 2-process FULL-TRAINER multi-host rehearsal (run by
test_multihost.py): jax.distributed + 4 virtual CPU devices per process, a
short `InpaintingTrainer.fit` over the 8-device global mesh — train steps,
one validation epoch, rank-0-only checkpoint writes — followed by a resume
from the rank-0 checkpoint. Replaces the reference's untested Lightning DDP
fit loop (bin/train.py:57-64 + saicinpainting/utils.py:134-177)."""
import argparse
import glob
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

OVERRIDES = [
    'generator.ngf=8', 'generator.n_blocks=1', 'generator.n_downsampling=2',
    'discriminator.ndf=8', 'discriminator.n_layers=2',
    # data.batch_size is the PER-HOST batch (global = batch_size * n_hosts)
    'data.batch_size=8', 'data.val_batch_size=2', 'data.train.out_size=32',
    'data.train.transform_variant=no_augs',
    'data.train.mask_gen_kwargs.irregular_kwargs.max_len=10',
    'data.train.mask_gen_kwargs.irregular_kwargs.max_width=4',
    'data.train.mask_gen_kwargs.box_kwargs.margin=2',
    'data.train.mask_gen_kwargs.box_kwargs.bbox_min_size=5',
    'data.train.mask_gen_kwargs.box_kwargs.bbox_max_size=12',
    'losses.resnet_pl.weight=0',
    'evaluator.lpips=false', 'evaluator.fid=false', 'evaluator.integral_kind=null',
    'trainer.kwargs.max_epochs=1', 'trainer.kwargs.limit_train_batches=2',
    'trainer.kwargs.log_every_n_steps=1', 'trainer.kwargs.precision=fp32',
    'trainer.checkpoint_kwargs.monitor=val_ssim_total_mean',
]


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument('--process-id', type=int, required=True)
    parser.add_argument('--num-processes', type=int, default=2)
    parser.add_argument('--local-devices', type=int, default=4)
    parser.add_argument('--skip-resume', action='store_true')
    parser.add_argument('--coordinator', required=True)
    parser.add_argument('--outdir', required=True)
    args = parser.parse_args()

    import jax
    jax.config.update('jax_platforms', 'cpu')
    jax.distributed.initialize(coordinator_address=args.coordinator,
                               num_processes=args.num_processes,
                               process_id=args.process_id)
    assert jax.local_device_count() == args.local_devices
    assert jax.device_count() == args.local_devices * args.num_processes

    import numpy as np
    import jax.numpy as jnp
    from lama_tpu.config import compose
    from lama_tpu.training.trainer import InpaintingTrainer

    os.environ['LAMA_DATA_ROOT'] = args.outdir
    os.environ.setdefault('TORCH_HOME', '/tmp/th')
    config = compose(os.path.join(REPO, 'configs', 'training'), 'lama-fourier',
                     OVERRIDES)
    # separate run dirs so the test can prove only rank 0 writes checkpoints
    run_dir = os.path.join(args.outdir, f'run{args.process_id}')
    trainer = InpaintingTrainer(config, run_dir)
    assert trainer.num_devices == 8, trainer.num_devices
    state = trainer.fit()
    step_after_fit = int(np.asarray(state.step))

    @jax.jit
    def param_fingerprint(params):
        return sum(jnp.sum(jnp.abs(l.astype(jnp.float64)))
                   for l in jax.tree.leaves(params))

    fp = float(param_fingerprint(state.g_params))

    if args.skip_resume:
        step_after_resume, fp2 = None, None
    else:
        # ---- resume from the RANK-0 checkpoint (shared filesystem); barrier
        # so rank 1 doesn't race ahead of rank 0's save (production resumes
        # are fresh launches, where the launcher provides this
        # synchronisation)
        from jax.experimental import multihost_utils
        multihost_utils.sync_global_devices('after_first_fit')
        rank0_last = os.path.join(args.outdir, 'run0', 'models', 'last')
        trainer2 = InpaintingTrainer(
            config, os.path.join(args.outdir, f'resume{args.process_id}'))
        trainer2.max_epochs = 2  # epoch numbering continues after resume
        state2 = trainer2.fit(resume_from=rank0_last)
        step_after_resume = int(np.asarray(state2.step))
        fp2 = float(param_fingerprint(state2.g_params))

    out = {
        'process_id': args.process_id,
        'step_after_fit': step_after_fit,
        'step_after_resume': step_after_resume,
        'g_param_fingerprint': repr(fp),
        'g_param_fingerprint_resumed': None if fp2 is None else repr(fp2),
        'own_checkpoints': sorted(os.path.basename(p) for p in
                                  glob.glob(os.path.join(run_dir, 'models', '*'))
                                  if os.path.isdir(p)),
    }
    with open(os.path.join(args.outdir, f'trainer_worker{args.process_id}.json'),
              'w') as f:
        json.dump(out, f)
    print(f'trainer worker {args.process_id}: OK', flush=True)


if __name__ == '__main__':
    main()
