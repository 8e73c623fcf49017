"""Headline benchmark: big-lama 512² inpainting throughput on one TPU chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Serving mode: int8 with calibrated static activation scales, zero-padded
quantized convs, bf16-stored spectral intermediates and the phase-conv out head
(the fastest shipped configuration, `bin/predict.py precision=int8
quant_calibration=K quant_zero_pad=true spectral_bf16_store=true
s2d_out_head=true`):
eligible conv contractions run int8×int8→int32 on the MXU (ops/quant.py;
spectral path and stem/out head stay bf16), and a HELD-OUT-batch calibration
(round 4: different seed than the timed batch — the honest deployment
protocol) records per-conv activation amax so the serving program carries no
dynamic amax reductions (serving.calibrate_int8; 187 sites in big-lama).
Dynamic-scale int8's measured quality vs fp32 with trained weights is
hole-region max|Δ| 1e-4 / 87.8 dB PSNR — the same level as the bf16 path
(89.3 dB); known pixels are bit-preserved by the composite. The bf16 series
(r1 128.6 → r2 145.5 → r3 145.1) and the bf16 / int8-dynamic / int8-static
side-by-sides live in BASELINE.md.

Methodology: N=10 generator forwards chained through `lax.scan` inside one jit
program, ending in a scalar reduction that is transferred to host — so the
measurement waits for real device completion. (Through the axon relay,
`block_until_ready` alone returns early and single-call timing is dominated by
relay round-trip latency; the scan chain amortises both. See
.claude/skills/verify/SKILL.md.)

Baseline: the reference repo publishes no numbers (README.md:449-451 is
"Training time & resources / TODO" — see BASELINE.md). We pin the baseline to
an analytic A100 estimate for the PyTorch inference path (big-lama fp32,
batch 8, 512²): ~0.6 TFLOP/image, A100 effective conv throughput with eager
overheads → ~25 img/s. BASELINE.json's north-star target is 5× that
(125 img/s/chip on v5e). vs_baseline = measured / 25.0.
"""
import json
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

A100_BASELINE_IMG_S = 25.0
BATCH = 16
SIZE = 512
CHAIN = 10
REPEATS = 4


def main():
    from lama_tpu.models.ffc import FFCResNetGenerator
    from lama_tpu.ops.serving_mode import ServingMode
    from lama_tpu.utils import enable_compilation_cache
    enable_compilation_cache()
    # The full headline serving configuration as ONE static module attribute
    # (ops/serving_mode.py — replaces the round-4 process-global flags):
    # - int8: eligible conv contractions on the int8 MXU path (+21%, r3)
    # - zero_pad: the int8-domain reflect gather becomes a conv-fused zero
    #   pad (round-4 WIN, +3.1%). Quality gated with trained weights at the
    #   bf16 path's own level on center AND border holes (ops/quant.py
    #   zero-pad doc; BASELINE.md round 4).
    # - spectral_bf16_store: bf16-stored DFT intermediates (round-4 WIN #2,
    #   +9.5%: the f32 spectral intermediates were 37% of the program's HBM
    #   writes — HLO audit in BASELINE.md). Quality gated same protocol
    #   (ops/spectral.py store_bf16 doc).
    # - s2d='out_head': s2d transform on the thin-output 7x7 head (round-4
    #   WIN #3, +2.4%: 3 output channels pad to 128 MXU lanes; EXACT
    #   semantics, parity-tested — ops/s2d_conv.py doc).
    mode = ServingMode(int8=True, zero_pad=True, spectral_bf16_store=True,
                       s2d='out_head')

    gen = FFCResNetGenerator(
        input_nc=4, output_nc=3, ngf=64, n_downsampling=3, n_blocks=18,
        add_out_act='sigmoid', dtype=jnp.bfloat16, mode=mode,
        init_conv_kwargs=dict(ratio_gin=0, ratio_gout=0, enable_lfu=False),
        downsample_conv_kwargs=dict(ratio_gin=0, ratio_gout=0, enable_lfu=False),
        resnet_conv_kwargs=dict(ratio_gin=0.75, ratio_gout=0.75, enable_lfu=False))

    rng = np.random.RandomState(0)
    img = jnp.asarray(rng.rand(BATCH, SIZE, SIZE, 3).astype(np.float32))
    mask = jnp.zeros((BATCH, SIZE, SIZE, 1), jnp.float32)
    mask = mask.at[:, SIZE // 4: SIZE // 2, SIZE // 4: SIZE // 2, :].set(1.0)
    x0 = jnp.concatenate([img * (1 - mask), mask], axis=-1)
    variables = jax.jit(lambda k, x: gen.init(k, x, train=False))(
        jax.random.PRNGKey(0), x0)

    # static activation scales calibrated on HELD-OUT batches (different seed
    # than the timed batch — the honest deployment protocol; round-3
    # calibrated on the bench batch itself, which makes static==dynamic by
    # construction). The compiled serving program is identical either way —
    # the scales are scalars — so throughput is unaffected; what this changes
    # is that the measured number now reflects scales a real deployment would
    # carry. Saturation sensitivity across held-out data is measured with
    # trained weights in probes/_t_int8_static_quality.py (BASELINE.md r4).
    from lama_tpu.serving import calibrate_int8
    crng = np.random.RandomState(12345)
    calib = []
    for _ in range(2):
        cimg = jnp.asarray(crng.rand(BATCH, SIZE, SIZE, 3).astype(np.float32))
        cmask = jnp.zeros((BATCH, SIZE, SIZE, 1), jnp.float32)
        cmask = cmask.at[:, SIZE // 4: SIZE // 2, SIZE // 4: SIZE // 2, :].set(1.0)
        calib.append((cimg, cmask))
    variables = calibrate_int8(gen, variables, calib)

    @jax.jit
    def chain(variables, img, mask):
        def body(carry, _):
            x = jnp.concatenate([carry * (1 - mask), mask], axis=-1)
            pred = gen.apply(variables, x, train=False)
            out = mask * pred + (1 - mask) * carry
            return out.astype(jnp.float32), out.mean()
        _, means = jax.lax.scan(body, img, jnp.arange(CHAIN))
        return means.mean().reshape(1, 1)

    np.asarray(chain(variables, img, mask))  # compile + warm
    times = []
    for _ in range(REPEATS):
        t0 = time.perf_counter()
        np.asarray(chain(variables, img, mask))  # transfer forces completion
        times.append(time.perf_counter() - t0)
    dt = float(np.median(times)) / CHAIN
    img_per_s = BATCH / dt

    print(json.dumps({
        'metric': (f'big-lama {SIZE}^2 inpainted images/sec/chip (int8 '
                   f'serving, static scales + zero-pad + bf16 spectral '
                   f'store + pad-free phase out head, batch {BATCH})'),
        'value': round(img_per_s, 2),
        'unit': 'img/s/chip',
        'vs_baseline': round(img_per_s / A100_BASELINE_IMG_S, 2),
    }))


if __name__ == '__main__':
    import os
    import subprocess
    try:
        sys.exit(main())
    except Exception as e:  # noqa: BLE001
        # The axon relay occasionally fails a transfer with FAILED_PRECONDITION
        # and wedges the client process, and has been observed fully down
        # (backend init UNAVAILABLE) for stretches of minutes-to-hours
        # (2026-08-17). Retry in a FRESH process — immediately once, then with
        # 3-minute waits — so a transient outage doesn't cost the round its
        # benchmark. Stdout (the JSON line) passes through untouched.
        attempt = int(os.environ.get('LAMA_BENCH_RETRY', '0'))
        if attempt >= 3:
            raise
        if attempt > 0:
            time.sleep(180)
        print(f'bench attempt {attempt} failed ({type(e).__name__}: {e}); '
              'retrying in a fresh process', file=sys.stderr, flush=True)
        env = dict(os.environ, LAMA_BENCH_RETRY=str(attempt + 1))
        sys.exit(subprocess.run([sys.executable, os.path.abspath(__file__)],
                                env=env).returncode)
