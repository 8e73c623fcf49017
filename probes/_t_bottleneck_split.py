"""Post-concat-layout cost split of the FFC bottleneck (round-2 end state):
full forward vs 18-block bottleneck vs 36x SpectralTransform vs 36x
FourierUnit at the big-lama 512² batch-16 shapes. Feeds the round-3 perf map.
"""
import time

import numpy as np
import jax
import jax.numpy as jnp
from flax import linen as nn

from lama_tpu.models.ffc import FFCResnetBlock, FourierUnit, SpectralTransform

B = 16
CHAIN, REPEATS = 10, 3


def timed(apply_fn, variables, *xs):
    @jax.jit
    def chain(variables, *xs):
        def body(carry, _):
            out = apply_fn(variables, *carry)
            if not isinstance(out, tuple):
                out = (out,)
            scaled = tuple((c + o.astype(c.dtype) * 1e-6)
                           for c, o in zip(carry, out))
            return scaled, ()
        out, _ = jax.lax.scan(body, xs, None, length=CHAIN)
        return sum(o.astype(jnp.float32).mean() for o in out).reshape(1, 1)

    np.asarray(chain(variables, *xs))
    ts = []
    for _ in range(REPEATS):
        t0 = time.perf_counter()
        np.asarray(chain(variables, *xs))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts)) / CHAIN * 1000


class Bottleneck(nn.Module):
    n: int = 18

    @nn.compact
    def __call__(self, xl, xg):
        for i in range(self.n):
            xl, xg = FFCResnetBlock(
                dim=512, ratio_gin=0.75, ratio_gout=0.75, enable_lfu=False,
                dtype=jnp.bfloat16, name=f'b{i}')((xl, xg), train=False)
        return xl, xg


class Spectrals(nn.Module):
    n: int = 36

    @nn.compact
    def __call__(self, x):
        for i in range(self.n):
            x = SpectralTransform(384, enable_lfu=False, dtype=jnp.bfloat16,
                                  name=f's{i}')(x, train=False)
        return x


class FUs(nn.Module):
    n: int = 36

    @nn.compact
    def __call__(self, x):
        for i in range(self.n):
            x = FourierUnit(192, dtype=jnp.bfloat16, name=f'f{i}')(x, train=False)
        return x


if __name__ == '__main__':
    rng = np.random.RandomState(0)
    key = jax.random.PRNGKey(0)

    xl = jnp.asarray(rng.rand(B, 64, 64, 128).astype(np.float32)).astype(jnp.bfloat16)
    xg = jnp.asarray(rng.rand(B, 64, 64, 384).astype(np.float32)).astype(jnp.bfloat16)
    bn = Bottleneck()
    v = jax.jit(lambda k: bn.init(k, xl, xg))(key)
    ms = timed(lambda v, a, b: bn.apply(v, a, b), v, xl, xg)
    print(f'bottleneck 18 blocks: {ms:.1f} ms', flush=True)

    sp = Spectrals()
    v = jax.jit(lambda k: sp.init(k, xg))(key)
    ms = timed(lambda v, a: sp.apply(v, a), v, xg)
    print(f'36x SpectralTransform(384): {ms:.1f} ms', flush=True)

    xfu = jnp.asarray(rng.rand(B, 64, 64, 192).astype(np.float32)).astype(jnp.bfloat16)
    fu = FUs()
    v = jax.jit(lambda k: fu.init(k, xfu))(key)
    ms = timed(lambda v, a: fu.apply(v, a), v, xfu)
    print(f'36x FourierUnit(192): {ms:.1f} ms', flush=True)
