"""Shared serving helpers: model-dir loading and the inpainting forward.

Used by bin/predict.py and bin/precompile.py so the served program and the
pre-warmed program are built from the SAME code — drift between them would
silently invalidate the compilation-cache warm.
"""
import os
from typing import Tuple

import jax
import jax.numpy as jnp

from .config import load_yaml
from .config.node import resolve_interpolations
from .models import make_generator
from .training.checkpoint import load_generator_variables
from .training.convert import load_torch_checkpoint


def load_serving_model(model_path: str, checkpoint: str = 'best',
                       precision: str = 'bf16',
                       quant_zero_pad: bool = False,
                       spectral_bf16_store: bool = False,
                       s2d_out_head: bool = False,
                       xfold_stem: bool = False) -> Tuple[object, dict, dict]:
    """Build the generator from <model_path>/config.yaml and load weights from
    <model_path>/models/<checkpoint> (orbax dir or reference torch .ckpt).
    Returns (generator, variables, gen_kwargs).

    `quant_zero_pad` (requires precision='int8'): zero-pad instead of
    reflect-gather inside the quantized convs — measured +3.1% on v5e with
    hole quality at the bf16 path's own level (the zero-pad doc in
    ops/quant.py carries the numbers).

    `spectral_bf16_store` (requires bf16 or int8 precision): store the DFT
    intermediates of the FFC spectral path in bf16 instead of fp32 — the
    spectral slice is HBM-bound and its f32 intermediates are 37% of the
    program's HBM writes (BASELINE.md round-4 HLO audit); measured +9.5%
    on v5e (85.3 → 77.9 ms/batch on the int8 headline program), hole quality
    gated with trained weights (ops/spectral.py store_bf16 doc).

    `s2d_out_head`: space-to-depth transform on the thin-output 7×7 head
    only (the conv is MXU-lane-padding-bound: 3 output channels pad to 128
    lanes). EXACT semantics (ops/s2d_conv.py, parity-tested vs torch);
    measured +2.4% on the round-4 headline program (78.0 → 76.2 ms/batch —
    the bf16-era in-graph negative inverted under the int8 program).

    `xfold_stem`: fold the stem's kx taps into input channels
    (ops/s2d_conv.py::conv2d_reflect_xfold) — exact semantics; round-5
    candidate lever, default off pending the on-chip measurement."""
    train_config = load_yaml(os.path.join(model_path, 'config.yaml'))
    resolve_interpolations(train_config)
    gen_kwargs = dict(train_config.generator)
    kind = gen_kwargs.pop('kind')
    # int8: bf16 compute dtype everywhere, with eligible Conv2d contractions
    # routed through the int8 MXU path (ops/quant.py, 2x bf16 peak on v5e);
    # spectral stays fp32/bf16 per the repo invariant. Opt-in, serving-only.
    dtype = {'bf16': jnp.bfloat16, 'fp32': jnp.float32,
             'int8': jnp.bfloat16}[precision]
    if quant_zero_pad and precision != 'int8':
        raise ValueError('quant_zero_pad requires precision=int8 (it only '
                         'affects the quantized convs)')
    if spectral_bf16_store and precision == 'fp32':
        raise ValueError('spectral_bf16_store has no effect under '
                         'precision=fp32 (the spectral operands are fp32); '
                         'use bf16 or int8')
    # static serving configuration, attached to the module tree — no process
    # globals: two models with different precisions coexist in one process
    # (ops/serving_mode.py)
    from .ops.serving_mode import ServingMode
    mode = ServingMode(int8=(precision == 'int8'),
                       zero_pad=bool(quant_zero_pad),
                       spectral_bf16_store=bool(spectral_bf16_store),
                       s2d='out_head' if s2d_out_head else 'off',
                       xfold_stem=bool(xfold_stem))
    generator = make_generator(kind, serving_mode=mode, dtype=dtype,
                               **gen_kwargs)

    ckpt = os.path.join(model_path, 'models', str(checkpoint))
    if not os.path.exists(ckpt) and os.path.isdir(os.path.splitext(ckpt)[0]):
        ckpt = os.path.splitext(ckpt)[0]  # 'best.ckpt' config naming, orbax dir
    probe = jnp.zeros((1, 64, 64, gen_kwargs.get('input_nc', 4)))
    template = generator.init(jax.random.PRNGKey(0), probe, train=False)
    if os.path.isdir(ckpt):
        variables = load_generator_variables(ckpt, template)
    elif ckpt.endswith(('.ckpt', '.pth', '.pt')):
        variables = load_torch_checkpoint(ckpt, template, generator)
    else:
        raise FileNotFoundError(ckpt)
    return generator, variables, gen_kwargs


def calibrate_int8(generator, variables, batches, mesh=None) -> dict:
    """Record per-conv activation amax for STATIC int8 scales.

    Runs the serving forward (masked-image concat, the exact input each conv
    sees when serving) over `batches` — an iterable of (image NHW3, mask
    NHW1) fp32 pairs — on a `calibrating=True` clone of the generator, so
    every eligible conv sows its input amax into a 'quant_stats' collection
    (max-reduced across calls). Returns `variables` with that collection
    merged: serving with the merged dict uses the recorded scalar scales
    instead of a dynamic full-tensor amax reduction per conv
    (ops/conv.py::_quant_act_amax).

    `mesh`: when serving is spatially sharded (spatial_shards>1), pass the
    SAME (data, space) mesh — the calibration forward then runs GSPMD-sharded
    exactly like serving (batch over 'data', image H over 'space'), so a
    calibration image that only fits HBM sharded never lands on one device.
    The sowed amax scalars are all-reduced by GSPMD (max is sharding-
    invariant) — same values as the unsharded forward.

    Numerics: inputs whose activations exceed the calibrated amax saturate
    at ±127 — calibrate on data shaped like the serving distribution (the
    CLI uses the first served batches). With the SAME batch, static and
    dynamic scales are identical by construction.
    """
    mode = getattr(generator, 'mode', None)
    if mode is None or not mode.int8:
        raise ValueError('calibrate_int8 requires precision=int8 '
                         '(the generator was not built with '
                         'ServingMode(int8=True))')
    # clone the module tree with calibrating on — the mode propagates to
    # every conv because children are constructed from parent fields at
    # trace time; the serving generator itself is untouched
    cal_gen = generator.clone(mode=mode.but(calibrating=True))

    def one(variables, image, mask):
        x = jnp.concatenate([image * (1 - mask), mask], axis=-1)
        _, mut = cal_gen.apply(variables, x, train=False,
                               mutable=['quant_stats'])
        # no eligible conv sowed anything (model below the int8 size gates):
        # empty collection -> caller keeps dynamic scales
        return mut.get('quant_stats', {})

    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P
        spec = (P('data', 'space') if 'space' in mesh.axis_names
                else P('data'))
        img_sh = NamedSharding(mesh, spec)
        repl = NamedSharding(mesh, P())
        one = jax.jit(one, in_shardings=(None, img_sh, img_sh),
                      out_shardings=repl)
    else:
        one = jax.jit(one)

    stats = None
    for image, mask in batches:
        s = one(variables, jnp.asarray(image), jnp.asarray(mask))
        stats = s if stats is None else jax.tree_util.tree_map(
            jnp.maximum, stats, s)
    if stats is None:
        raise ValueError('calibrate_int8: no calibration batches given')
    if not stats:
        return variables
    return {**variables, 'quant_stats': jax.device_get(stats)}


def bucket_shape(h: int, w: int, modulo: int, bucket: int,
                 spatial_shards: int = 1) -> Tuple[int, int]:
    """The padded (H, W) an original (h, w) input is actually served at —
    the single owner of bin/predict.py's shape contract, shared with
    bin/precompile.py so warmed programs key identically to served ones:
    dataset modulo-pad → bucket-pad (min one modulo) → ceil H to the
    spatial shard count."""
    from .data.io import ceil_modulo

    def ceil_to(x, mod):
        return ((x + mod - 1) // mod) * mod

    modulo = int(modulo or 0)
    ph = ceil_modulo(int(h), modulo) if modulo else int(h)
    pw = ceil_modulo(int(w), modulo) if modulo else int(w)
    bh = ceil_to(max(ph, modulo), bucket)
    bw = ceil_to(max(pw, modulo), bucket)
    if spatial_shards > 1:
        bh = ceil_to(bh, spatial_shards)
    return bh, bw


def make_inpaint_forward(generator, wire: str = 'fp32',
                         out_key: str = 'inpainted'):
    """The serving forward: (variables, image NHW3, mask NHW1) -> composited
    inpainted image.

    `out_key` selects the served result, mirroring the reference's
    `batch[predict_config.out_key]` (bin/predict.py:86, batch keys built in
    training/trainers/default.py:70-71): 'inpainted' (default) is the
    known-pixel-preserving composite, 'predicted_image' the raw generator
    output over the full frame.

    `wire` sets the host<->device transfer format (the CLI's `wire=` option):
    - 'fp32': image/mask arrive as float32 in [0,1]/{0,1}; fp32 out. The
      reference protocol's dtypes (bin/predict.py:67-94 hands fp32 to torch).
    - 'uint8': image arrives as uint8 0-255 (host quantizes via rint(x*255)),
      mask as uint8 {0,1}; the composite leaves the device as uint8 via
      floor(clip(out*255, 0, 255)) — the IDENTICAL map save_image applies to
      fp32 results on host (np.clip(x*255).astype(uint8) truncates, and
      floor == truncation for non-negative values), so the written 8-bit
      files are bit-equal to the fp32 wire's whenever the inputs are
      8-bit-sourced and un-resized. 8x less traffic per served batch
      (66 MB -> 17 MB in, 4x out at 512^2 b16 — BASELINE.md relay bandwidth).
    """
    if wire not in ('fp32', 'uint8'):
        raise ValueError(f'wire={wire!r}: expected fp32 or uint8')
    if out_key not in ('inpainted', 'predicted_image'):
        raise ValueError(f'out_key={out_key!r}: expected inpainted or '
                         'predicted_image')
    u8 = wire == 'uint8'

    def _predict(variables, image, mask):
        if u8:
            image = image.astype(jnp.float32) / 255.0
            mask = mask.astype(jnp.float32)
        masked = image * (1 - mask)
        x = jnp.concatenate([masked, mask], axis=-1)
        pred = generator.apply(variables, x, train=False)
        if out_key == 'predicted_image':
            out = pred.astype(jnp.float32)
        else:
            out = (mask * pred + (1 - mask) * image).astype(jnp.float32)
        if u8:
            return jnp.floor(jnp.clip(out * 255.0, 0.0, 255.0)).astype(jnp.uint8)
        return out
    return _predict
