"""ResNetPL tax profile (VERDICT r2 item 8): the ADE20k ResNet50-dilated
perceptual loss adds +17 ms/step (+14%) to the full training protocol.

Isolates the PL term at the training shape (256² batch 10 bf16):
  fwd2      two encoder forwards (pred + target), loss only
  fwd+bwd   the real cost: loss + grad through the pred side
  batched   variant: ONE batch-20 forward (concat) instead of two batch-10
            forwards — same forward FLOPs, but the backward then runs at
            batch 20 (the target half's cotangents are structurally zero;
            does XLA DCE them?)
Prints ms per call (scan-chained, relay-safe) + achieved MFU estimate.
"""
import time

import numpy as np
import jax
import jax.numpy as jnp

from lama_tpu.losses.perceptual import ResNetPL
from lama_tpu.utils import enable_compilation_cache

B, S, CHAIN, REPEATS = 10, 256, 10, 3


def timed(fn, *args, tag=''):
    @jax.jit
    def chain(*a):
        def body(carry, _):
            out = fn(*a, carry)
            return out, out
        last, _ = jax.lax.scan(body, jnp.float32(0), jnp.arange(CHAIN))
        return last.reshape(1, 1)

    t0 = time.perf_counter()
    np.asarray(chain(*args))
    compile_s = time.perf_counter() - t0
    times = []
    for _ in range(REPEATS):
        t0 = time.perf_counter()
        np.asarray(chain(*args))
        times.append(time.perf_counter() - t0)
    dt = float(np.median(times)) / CHAIN * 1000
    print(f'[{tag}] {dt:.2f} ms/call (compile {compile_s:.0f}s)', flush=True)
    return dt


def main():
    enable_compilation_cache()
    pl = ResNetPL(weights_path=None, allow_random_weights=True,
                  dtype=jnp.bfloat16)
    rng = np.random.RandomState(0)
    pred0 = jnp.asarray(rng.rand(B, S, S, 3).astype(np.float32))
    target = jnp.asarray(rng.rand(B, S, S, 3).astype(np.float32))

    def fwd2(pred0, target, eps):
        return pl(pred0 + eps, target)

    def fwd_bwd(pred0, target, eps):
        # grad through the pred side only (target is constant), like the
        # G-loss backward in the fused train step
        g = jax.grad(lambda p: pl(p, target))(pred0 + eps)
        return jnp.sum(jnp.abs(g).astype(jnp.float32)) * 0 + pl(pred0 + eps, target)

    from lama_tpu.losses.perceptual import imagenet_normalize

    def batched_fwd_bwd(pred0, target, eps):
        def loss(p):
            both = jnp.concatenate([p, target], axis=0)
            feats = pl.model.apply(pl.variables, imagenet_normalize(both),
                                   train=False)
            tot = jnp.float32(0)
            for f in feats:
                pf, tf = f[:B], f[B:]
                tot += jnp.mean(jnp.square(pf.astype(jnp.float32)
                                           - tf.astype(jnp.float32)))
            return tot
        g = jax.grad(loss)(pred0 + eps)
        return jnp.sum(jnp.abs(g).astype(jnp.float32)) * 0 + loss(pred0 + eps)

    timed(fwd2, pred0, target, tag='fwd2 (pred+target fwd only)')
    t_real = timed(fwd_bwd, pred0, target, tag='fwd2+bwd (the train-step cost)')
    timed(batched_fwd_bwd, pred0, target, tag='batched fwd+bwd variant')

    # rough MFU: resnet50dilated(8) fwd ≈ 31 GFLOP/img at 256² (stage3 ×4,
    # stage4 ×16 vs the strided net); train cost ≈ 2 fwd + 1 bwd(≈2 fwd)
    flops = 31e9 * B * 4
    print(f'MFU estimate at {t_real:.1f} ms: '
          f'{flops / (t_real / 1000) / 197e12 * 100:.0f}% of v5e bf16 peak',
          flush=True)


if __name__ == '__main__':
    main()
