"""Packed-complex DFT matmuls vs the 12-einsum baseline, isolated at the
FFC bottleneck shape (16, 64, 64, 192) bf16.

The baseline H-stage einsums contract K=64 and emit N∈{33,64} — below the
128-lane MXU tile. Packing re/im into block matrices gives K/N∈{66,128}.
Measures the full FourierUnit spectral roundtrip (rfft2 -> freq 1x1 matmul
-> irfft2) per variant, scan-chained (relay-safe timing).
"""
import time

import numpy as np
import jax
import jax.numpy as jnp

from lama_tpu.ops import spectral

B, H, W, C = 16, 64, 64, 192
CHAIN, REPEATS = 50, 3
DT = jnp.bfloat16


def run(packed):
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(B, H, W, C).astype(np.float32))
    k = jnp.asarray(rng.randn(1, 1, 2 * C, 2 * C).astype(np.float32) * 0.05)

    rfft = spectral.rfft2_dft_packed if packed else spectral.rfft2_dft
    irfft = spectral.irfft2_dft_packed if packed else spectral.irfft2_dft

    @jax.jit
    def chain(x, k):
        def body(carry, _):
            fr, fi = rfft(carry, dtype=DT)
            b, h, w2, c = fr.shape
            y = jnp.stack([fr, fi], axis=-1).reshape(b, h, w2, 2 * c)
            y = jax.nn.relu(jax.lax.conv_general_dilated(
                y.astype(DT), k.astype(DT), (1, 1), 'VALID',
                dimension_numbers=('NHWC', 'HWIO', 'NHWC'),
                preferred_element_type=jnp.float32))
            y = y.reshape(b, h, w2, c, 2)
            out = irfft(y[..., 0], y[..., 1], s=(H, W), dtype=DT)
            return out.astype(jnp.float32), ()
        out, _ = jax.lax.scan(body, x, None, length=CHAIN)
        return out.mean().reshape(1, 1)

    tag = 'packed' if packed else 'baseline'
    t0 = time.perf_counter()
    np.asarray(chain(x, k))
    print(f'[{tag}] compile+first: {time.perf_counter()-t0:.1f}s', flush=True)
    times = []
    for _ in range(REPEATS):
        t0 = time.perf_counter()
        np.asarray(chain(x, k))
        times.append(time.perf_counter() - t0)
    ms = float(np.median(times)) / CHAIN * 1000
    print(f'[{tag}] {ms:.3f} ms/roundtrip (raw {["%.3f" % t for t in times]})',
          flush=True)
    return ms


if __name__ == '__main__':
    base = run(False)
    pk = run(True)
    print(f'packed/baseline: {pk/base:.3f}x  ({base:.3f} -> {pk:.3f} ms)', flush=True)
