"""Explicit serving-mode configuration for the quantized/transformed
inference paths.

Round-4 shipped the measured serving levers (int8 MXU convs, zero-padded
quantized convs, bf16-stored spectral DFT intermediates, the s2d out head)
as five process-global module flags set by `load_serving_model` and read at
trace time. That worked but did not scale: two models with different
precisions in one process silently interfered, and tests needed
reset-discipline shims (VERDICT r4 weak #5). This dataclass replaces them —
the mode is an attribute of the generator module tree (threaded through
`make_generator`), so it participates in flax's static module identity:
tracing a generator built with a different mode produces a different XLA
program with no ambient state.

Trace-time semantics are unchanged: every field is static (hashable frozen
dataclass), read while the module's __call__ traces.

Reference counterpart: none — the reference serves fp32 torch eager
(bin/predict.py:67-94); these are TPU-hardware serving levers.
"""
from dataclasses import dataclass, replace as _dc_replace


@dataclass(frozen=True)
class ServingMode:
    """Static per-model serving configuration.

    int8: route eligible convs through the int8 MXU path (ops/quant.py) —
        2x bf16 peak on v5e; measured +21% end to end (BASELINE.md round 3).
    zero_pad: zero-pad instead of reflect-gather inside the QUANTIZED convs
        (requires int8) — measured +5.5%, quality-gated (ops/quant.py doc).
    spectral_bf16_store: store the DFT-matmul intermediates of the FFC
        spectral path in bf16 (ops/spectral.py doc) — measured +9.5%,
        quality-gated; only effective when the spectral operands are bf16.
    s2d: space-to-depth conv transform dispatch — 'off' | 'out_head' (the
        shipped +2.4% exact-semantics lever: 7x7 thin-output head only) |
        'all' (the full measured shape table in ops/s2d_conv.py — a bf16-era
        in-graph NEGATIVE kept for probes).
    xfold_stem: route thin-INPUT 7x7 stride-1 reflect convs (the stem:
        C_in=4, MXU contraction 4/128 lanes) through the kx-tap channel
        fold (ops/s2d_conv.py::conv2d_reflect_xfold) — EXACT semantics
        (conv reassociation class only, parity-tested vs torch). MEASURED
        in-graph NEGATIVE on the round-5 headline program: 70.9 ->
        117.2 ms/batch (probes/_t_int8_profile.py headline_xfold,
        2026-08-20) — the 7-slice channel concat materialises at full res
        and breaks producer fusion, swamping the 5.46 ms isolated stem.
        Kept default-off for probes, like s2d='all'.
    calibrating: int8 calibration pass — eligible convs sow their input
        activation amax into a 'quant_stats' collection instead of serving
        (serving.py::calibrate_int8 drives this via generator.clone()).
    min_contraction_channels / min_out_channels: int8 eligibility gates
        (per-group contraction depth / output width thresholds, see
        ops/quant.py::conv_eligible) — overridable so tiny test/dryrun
        models can exercise the quantized path.
    """
    int8: bool = False
    zero_pad: bool = False
    spectral_bf16_store: bool = False
    s2d: str = 'off'
    xfold_stem: bool = False
    calibrating: bool = False
    min_contraction_channels: int = 64
    min_out_channels: int = 32

    def __post_init__(self):
        if self.s2d not in ('off', 'out_head', 'all'):
            raise ValueError(f's2d={self.s2d!r}: expected off|out_head|all')
        if self.zero_pad and not self.int8:
            raise ValueError('zero_pad requires int8 (it only affects the '
                             'quantized convs)')
        if self.calibrating and not self.int8:
            raise ValueError('calibrating requires int8')

    def but(self, **updates) -> 'ServingMode':
        return _dc_replace(self, **updates)


DEFAULT = ServingMode()
