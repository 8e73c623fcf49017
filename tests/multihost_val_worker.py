"""One process of the multi-host VALIDATION-MERGE rehearsal (run by
test_multihost.py::test_multihost_validation_merge): jax.distributed + N
virtual CPU devices per process. Each host evaluates a DISJOINT contiguous
shard of the val set and the trainer allgathers the per-host evaluator
states — the merged metrics must equal a single-process full-set pass
(reference trainers/base.py:189-209 evaluation-state gathering)."""
import argparse
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

# shared with the in-pytest single-process reference pass (test_multihost.py)
OVERRIDES = [
    'generator.ngf=8', 'generator.n_blocks=1', 'generator.n_downsampling=2',
    'discriminator.ndf=8', 'discriminator.n_layers=2',
    'data.batch_size=8', 'data.val_batch_size=2',
    'losses.resnet_pl.weight=0',
    'evaluator.lpips=false', 'evaluator.fid=false',
    'evaluator.integral_kind=null',
    'trainer.kwargs.precision=fp32',
    'visualizer.kind=noop',
]


def build_trainer_and_validate(config, run_dir):
    """Deterministic (seeded) trainer init + one validation epoch — shared by
    the workers and the single-process reference so both paths run literally
    the same code."""
    import numpy as np
    from lama_tpu.training.trainer import InpaintingTrainer

    trainer = InpaintingTrainer(config, run_dir)
    sample = {'image': np.zeros((8, 32, 32, 3), np.float32),
              'mask': np.zeros((8, 32, 32, 1), np.float32)}
    trainer.init_state(sample, seed=int(config.get('seed', 0) or 0))
    return trainer.validate(epoch=0)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument('--process-id', type=int, required=True)
    parser.add_argument('--num-processes', type=int, default=2)
    parser.add_argument('--local-devices', type=int, default=4)
    parser.add_argument('--coordinator', required=True)
    parser.add_argument('--outdir', required=True)
    args = parser.parse_args()

    import jax
    jax.config.update('jax_platforms', 'cpu')
    jax.distributed.initialize(coordinator_address=args.coordinator,
                               num_processes=args.num_processes,
                               process_id=args.process_id)
    assert jax.local_device_count() == args.local_devices

    from lama_tpu.config import compose

    os.environ['LAMA_DATA_ROOT'] = args.outdir
    os.environ.setdefault('TORCH_HOME', '/tmp/th')
    config = compose(os.path.join(REPO, 'configs', 'training'), 'lama-fourier',
                     OVERRIDES)
    # count the batches THIS host actually evaluated (disjoint shard proof)
    from lama_tpu.training import trainer as trainer_mod
    seen = []
    orig_loop = trainer_mod.InpaintingTrainer._run_eval_loop

    def counting_loop(self, epoch, data_key, evaluator, prefix,
                      visualize_all=False):
        try:
            loader = self.val_dataloader(data_key)
            seen.append([data_key, sum(1 for _ in loader)])
        except Exception:
            pass
        return orig_loop(self, epoch, data_key, evaluator, prefix,
                         visualize_all)

    trainer_mod.InpaintingTrainer._run_eval_loop = counting_loop
    metrics = build_trainer_and_validate(
        config, os.path.join(args.outdir, f'val_run{args.process_id}'))

    out = {'process_id': args.process_id, 'metrics': metrics,
           'local_val_batches': seen}
    with open(os.path.join(args.outdir,
                           f'val_worker{args.process_id}.json'), 'w') as f:
        json.dump(out, f)
    print(f'val worker {args.process_id}: OK', flush=True)


if __name__ == '__main__':
    main()
