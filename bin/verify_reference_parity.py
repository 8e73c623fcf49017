#!/usr/bin/env python3
"""One-command reference-parity campaign (VERDICT r3 item 4).

Points at a directory of reference PyTorch weights, converts every aux net
plus the generator, serves a fixed (image, mask) suite through the real
prediction CLI at reference numerics, runs the eval2 metric protocol with
the converted weights, and emits a pass/fail table — so the day the real
blobs are reachable (they are egress-blocked in this sandbox), the
"metric parity with PyTorch checkpoints" gate closes by running ONE command.

Usage:
  python bin/verify_reference_parity.py --weights-dir W --datadir D --outdir O \
      [--expected expected.json] [--metrics ssim,lpips,fid] [--device cpu]

Weights dir layout (every entry optional; missing -> SKIP row):
  big-lama.ckpt                reference deployment checkpoint
                               (bin/make_checkpoint.py state_dict dump; any
                               single *.ckpt/*.pt/*.pth at the top level works)
  generator_config.yaml        generator kwargs for the ckpt (default: the
                               big-lama preset's generator node)
  lpips_vgg16.pth              torchvision VGG16 state_dict (the trunk under
                               reference models/lpips_models/vgg.pth's heads)
  fid_inception.pth            pytorch-fid InceptionV3 state_dict
                               (reference fid/inception.py:15 download)
  ade20k/ade20k-resnet50dilated-ppm_deepsup/{encoder,decoder}_epoch_20.pth
                               ADE20k weights (reference models/ade20k/
                               base.py:126-136 layout, = $TORCH_HOME tree)

`--expected` is a JSON {"ssim_total_mean": [value, atol], ...} of reference
numbers; each row becomes a PASS/FAIL check. Without it the harness still
converts + serves + evaluates and reports the measured table.

Writes <outdir>/predictions/, <outdir>/metrics.tsv, <outdir>/parity_report.json.
"""
import argparse
import json
import logging
import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

LOGGER = logging.getLogger(__name__)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _find_generator_ckpt(weights_dir):
    preferred = os.path.join(weights_dir, 'big-lama.ckpt')
    if os.path.exists(preferred):
        return preferred
    for name in sorted(os.listdir(weights_dir)):
        if name.endswith(('.ckpt', '.pt', '.pth')) and os.path.isfile(
                os.path.join(weights_dir, name)):
            return os.path.join(weights_dir, name)
    return None


def _generator_kwargs(weights_dir):
    import yaml
    cfg_path = os.path.join(weights_dir, 'generator_config.yaml')
    if os.path.exists(cfg_path):
        with open(cfg_path) as f:
            node = yaml.safe_load(f)
        return dict(node.get('generator', node))
    os.environ.setdefault('TORCH_HOME', '/tmp/th')
    from lama_tpu.config import compose
    from lama_tpu.config.node import to_dict
    cfg = compose(os.path.join(REPO, 'configs', 'training'), 'big-lama', [])
    return to_dict(cfg.generator)


def gate_generator(weights_dir, report):
    """Strict big-lama conversion: every template leaf must be found in the
    checkpoint with the right shape (training/convert.py::load_torch_checkpoint).
    Returns (gen_kwargs, ckpt_path) for the serving stage on PASS."""
    import jax
    import jax.numpy as jnp

    from lama_tpu.models import make_generator
    from lama_tpu.training.convert import load_torch_checkpoint

    ckpt = _find_generator_ckpt(weights_dir)
    if ckpt is None:
        report['nets']['generator'] = {'status': 'SKIP',
                                       'reason': 'no .ckpt in weights dir'}
        return None, None
    gen_kwargs = _generator_kwargs(weights_dir)
    kw = dict(gen_kwargs)
    gen = make_generator(kw.pop('kind', 'ffc_resnet'), **kw)
    probe = jnp.zeros((1, 64, 64, int(gen_kwargs.get('input_nc', 4))))
    template = gen.init(jax.random.PRNGKey(0), probe, train=False)
    try:
        load_torch_checkpoint(ckpt, template, gen)
    except Exception as ex:
        report['nets']['generator'] = {'status': 'FAIL', 'reason': str(ex),
                                       'path': ckpt}
        return None, None
    n_leaves = len(jax.tree_util.tree_leaves(template))
    report['nets']['generator'] = {'status': 'PASS', 'path': ckpt,
                                   'leaves': n_leaves}
    return gen_kwargs, ckpt


def _strict_convert(name, path, build_template, report, model=None):
    """Shared aux-net gate: strict torch_to_flax against the net's template
    (exactly the tensors the metric stack will consume)."""
    import jax

    from lama_tpu.training.convert import torch_to_flax
    if path is None or not os.path.exists(path):
        report['nets'][name] = {'status': 'SKIP',
                                'reason': f'{path or "file"} not found'}
        return
    try:
        import torch
        template, model = build_template()
        state = torch.load(path, map_location='cpu', weights_only=False)
        if isinstance(state, dict) and 'state_dict' in state:
            state = state['state_dict']
        torch_to_flax(state, template, model=model, strict=True)
    except Exception as ex:
        report['nets'][name] = {'status': 'FAIL', 'reason': str(ex),
                                'path': path}
        return
    report['nets'][name] = {'status': 'PASS', 'path': path,
                            'leaves': len(jax.tree_util.tree_leaves(template))}


def gate_aux_nets(weights_dir, report):
    import jax
    import jax.numpy as jnp

    def vgg_template():
        from lama_tpu.models.aux.vgg import (VGG16_CFG, VGG16_LPIPS_TAPS,
                                             VGGFeatures)
        model = VGGFeatures(cfg=tuple(VGG16_CFG), tap_indices=VGG16_LPIPS_TAPS,
                            pool='max')
        return model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3))), model

    def inception_template():
        from lama_tpu.models.aux.inception import FIDInceptionV3
        model = FIDInceptionV3(output_blocks=(3,))
        return model.init(jax.random.PRNGKey(0), jnp.zeros((1, 299, 299, 3)),
                          train=False), model

    _strict_convert('lpips_vgg16', os.path.join(weights_dir, 'lpips_vgg16.pth'),
                    vgg_template, report)
    _strict_convert('fid_inception',
                    os.path.join(weights_dir, 'fid_inception.pth'),
                    inception_template, report)

    # ADE20k: encoder + decoder converted separately against the module's
    # sub-templates (models/aux/segmentation.py::SegmentationModule layout)
    from lama_tpu.models.aux.segmentation import (SegmentationModuleNet,
                                                  resolve_ade20k_weight_paths)
    enc, dec = resolve_ade20k_weight_paths(weights_dir)
    if enc is None:
        report['nets']['ade20k'] = {
            'status': 'SKIP',
            'reason': f'encoder/decoder pair not found under {weights_dir}'}
    else:
        model = SegmentationModuleNet()
        variables = model.init(jax.random.PRNGKey(0),
                               jnp.zeros((1, 64, 64, 3)), train=False)
        for part, path in (('encoder', enc), ('decoder', dec)):
            template = {'params': variables['params'][part],
                        'batch_stats': variables['batch_stats'][part]}
            _strict_convert(f'ade20k_{part}', path, lambda t=template: (t, None),
                            report)
        ok = all(report['nets'].get(f'ade20k_{p}', {}).get('status') == 'PASS'
                 for p in ('encoder', 'decoder'))
        report['nets']['ade20k'] = {'status': 'PASS' if ok else 'FAIL',
                                    'path': os.path.dirname(enc)}


def serve_suite(gen_kwargs, ckpt, datadir, outdir, args):
    """Run the REAL serving CLI (bin/predict.py) with the converted
    checkpoint at reference numerics (fp32) over the fixed suite."""
    import yaml

    import predict as predict_cli

    model_dir = os.path.join(outdir, 'model')
    os.makedirs(os.path.join(model_dir, 'models'), exist_ok=True)
    with open(os.path.join(model_dir, 'config.yaml'), 'w') as f:
        yaml.safe_dump({'generator': gen_kwargs,
                        'training_model': {'kind': 'default'}}, f)
    ckpt_copy = os.path.join(model_dir, 'models', 'best.ckpt')
    if not os.path.exists(ckpt_copy):
        shutil.copy(ckpt, ckpt_copy)
    predictdir = os.path.join(outdir, 'predictions')
    argv = [f'model.path={model_dir}', 'model.checkpoint=best.ckpt',
            f'indir={datadir}', f'outdir={predictdir}',
            f'dataset.img_suffix={args.img_suffix}',
            f'batch_size={args.batch_size}', 'precision=fp32']
    if args.device:
        argv.append(f'device={args.device}')
    predict_cli.main(argv)
    return predictdir


def main(args):
    import jax
    if args.device == 'cpu':
        jax.config.update('jax_platforms', 'cpu')
    logging.basicConfig(level=logging.INFO, force=True)
    from lama_tpu.utils import enable_compilation_cache
    enable_compilation_cache()

    os.makedirs(args.outdir, exist_ok=True)
    report = {'weights_dir': args.weights_dir, 'nets': {}, 'metrics': {},
              'checks': [], 'pass': None}

    # ---- stage 1: convert all four nets (strict)
    gen_kwargs, ckpt = gate_generator(args.weights_dir, report)
    gate_aux_nets(args.weights_dir, report)
    for name, row in report['nets'].items():
        LOGGER.info(f'convert {name}: {row["status"]}'
                    + (f' ({row.get("reason")})'
                       if row['status'] != 'PASS' else ''))

    # ---- stage 2: serve the suite with the converted generator
    if gen_kwargs is not None:
        predictdir = serve_suite(gen_kwargs, ckpt, args.datadir, args.outdir,
                                 args)

        # ---- stage 3: eval2 metric protocol with the converted aux nets
        import yaml

        from evaluate_predicts import results_to_table, run_evaluation
        if report['nets']['lpips_vgg16']['status'] == 'PASS':
            os.environ['LAMA_LPIPS_VGG_WEIGHTS'] = os.path.join(
                args.weights_dir, 'lpips_vgg16.pth')
        if report['nets']['fid_inception']['status'] == 'PASS':
            os.environ['LAMA_FID_INCEPTION_WEIGHTS'] = os.path.join(
                args.weights_dir, 'fid_inception.pth')
            # the FID activations model is a process-wide singleton; drop any
            # instance built before the env var pointed at real weights
            from lama_tpu.evaluation.fid import InceptionActivations
            InceptionActivations._singleton = None
        with open(args.config) as f:
            eval_config = yaml.safe_load(f)
        eval_config.setdefault('dataset_kwargs', {})['img_suffix'] = \
            args.img_suffix
        results = run_evaluation(eval_config, args.datadir, predictdir,
                                 metrics=args.metrics)
        table = results_to_table(results)
        table.to_csv(os.path.join(args.outdir, 'metrics.tsv'), sep='\t',
                     float_format='%.6f')
        print(table)
        for (metric, group), stats in results.items():
            g = group.replace('%', '').replace('-', '_')
            for stat, val in stats.items():
                report['metrics'][f'{metric}_{g}_{stat}'] = float(val)

    # ---- stage 4: pass/fail table
    ok = all(r['status'] != 'FAIL' for r in report['nets'].values())
    if args.expected:
        with open(args.expected) as f:
            expected = json.load(f)
        for key, (value, atol) in expected.items():
            measured = report['metrics'].get(key)
            passed = measured is not None and abs(measured - value) <= atol
            report['checks'].append({'metric': key, 'expected': value,
                                     'atol': atol, 'measured': measured,
                                     'pass': bool(passed)})
            ok = ok and passed
            LOGGER.info(f'check {key}: measured={measured} '
                        f'expected={value}±{atol} -> '
                        f'{"PASS" if passed else "FAIL"}')
    report['pass'] = bool(ok and gen_kwargs is not None)
    with open(os.path.join(args.outdir, 'parity_report.json'), 'w') as f:
        json.dump(report, f, indent=2)
    LOGGER.info(f'parity report: {os.path.join(args.outdir, "parity_report.json")} '
                f'-> {"PASS" if report["pass"] else "FAIL"}')
    return report


if __name__ == '__main__':
    parser = argparse.ArgumentParser()
    parser.add_argument('--weights-dir', required=True)
    parser.add_argument('--datadir', required=True,
                        help='fixed suite of <name>.png + <name>_mask*.png')
    parser.add_argument('--outdir', required=True)
    parser.add_argument('--expected', default=None,
                        help='JSON {"ssim_total_mean": [value, atol], ...}')
    parser.add_argument('--config',
                        default=os.path.join(REPO, 'configs', 'eval2.yaml'))
    parser.add_argument('--metrics', default=None,
                        help='comma list: ssim,lpips,fid (default all)')
    parser.add_argument('--img-suffix', default='.png')
    parser.add_argument('--batch-size', type=int, default=8)
    parser.add_argument('--device', default=None, choices=[None, 'cpu', 'tpu'])
    report = main(parser.parse_args())
    sys.exit(0 if report['pass'] else 2)
