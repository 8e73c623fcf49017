#!/usr/bin/env python3
"""Training CLI — analogue of reference bin/train.py.

Usage:
  python bin/train.py -cn big-lama location=local data.batch_size=8 \
      [trainer.kwargs.max_epochs=40] [run_dir=/path/to/run] \
      [trainer.resume_from_checkpoint=/path/to/ckpt]

Composes configs/training/<name>.yaml, freezes the resolved config to
<run_dir>/config.yaml (consumed later by bin/predict.py), builds the
InpaintingTrainer and fits. Multi-host: call jax.distributed.initialize()
upstream (JAX_COORDINATOR_ADDRESS etc.); per-host data sharding and rank-0
gating are handled by the trainer.
"""
import argparse
import datetime
import getpass
import logging
import os
import sys
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

LOGGER = logging.getLogger(__name__)


def main(config_name, overrides):
    from lama_tpu.config import compose, save_config
    from lama_tpu.training.trainer import InpaintingTrainer
    from lama_tpu.utils import (enable_compilation_cache,
                                handle_deterministic_config,
                                register_debug_signal_handlers)

    logging.basicConfig(level=logging.INFO, force=True)  # jax pre-configures the root logger
    register_debug_signal_handlers()
    enable_compilation_cache()

    config_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                              'configs', 'training')
    config = compose(config_dir, config_name, overrides)
    handle_deterministic_config(config)

    if str(config.get('device', '')) == 'cpu':
        import jax
        jax.config.update('jax_platforms', 'cpu')

    from lama_tpu.parallel.multihost import maybe_initialize_distributed
    maybe_initialize_distributed()

    run_dir = config.get('run_dir')
    if not run_dir:
        template = config.select('hydra.run.dir')
        if template:
            # hydra-group run-dir templating (reference
            # configs/training/hydra/overrides.yaml): ${env:}/${location.*}/
            # ${run_title} were resolved at compose time; resolve the
            # hydra-runtime placeholders here
            import re as _re
            run_dir = _re.sub(
                r'\$\{now:([^}]*)\}',
                lambda m: datetime.datetime.now().strftime(m.group(1)), template)
            run_dir = (run_dir
                       .replace('${hydra:job.name}', 'train')
                       .replace('${hydra:job.config_name}', config_name))
    if not run_dir:
        out_root = config.select('location.out_root_dir') or os.getcwd()
        stamp = datetime.datetime.now().strftime('%Y-%m-%d_%H-%M-%S')
        title = config.get('run_title', '') or ''
        run_dir = os.path.join(out_root,
                               f'{getpass.getuser()}_{stamp}_{config_name}{title}')
    os.makedirs(run_dir, exist_ok=True)
    save_config(config, os.path.join(run_dir, 'config.yaml'))
    LOGGER.info(f'Run dir: {run_dir}')

    trainer = InpaintingTrainer(config, run_dir)
    resume = config.select('trainer.resume_from_checkpoint')
    trainer.fit(resume_from=resume if isinstance(resume, str) else None)


if __name__ == '__main__':
    parser = argparse.ArgumentParser()
    parser.add_argument('-cn', '--config-name', required=True,
                        help='preset under configs/training, e.g. big-lama')
    parser.add_argument('overrides', nargs='*', help='key=value overrides')
    args = parser.parse_args()
    try:
        main(args.config_name, args.overrides)
    except KeyboardInterrupt:
        LOGGER.warning('Interrupted by user')
        sys.exit(1)
    except Exception as ex:
        LOGGER.critical(f'Training failed due to {ex}:\n{traceback.format_exc()}')
        sys.exit(1)
