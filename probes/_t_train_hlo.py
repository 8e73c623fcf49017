"""HLO audit of the fused GAN train step (VERDICT r4 item 2).

The serving HLO audit (probes/_t_hlo_dump.py) found the single biggest
round-4 win (+9.5% from bf16-stored DFT intermediates). This applies the
same methodology to the 137.6 ms big-lama 256² b10 train program: dump the
optimized (post-fusion, scheduled) HLO of the FULL fused step (G fwd+bwd +
D fwd+bwd + R1 + FM + PL + adam + EMA) and classify top-level HBM writes
by buffer class, to find where the G-backward's bandwidth goes and which
levers (remat policy, cotangent dtype, stream layout) are licensed.

Usage:
  PYTHONPATH=/root/repo:$PYTHONPATH timeout 3000 python probes/_t_train_hlo.py [out.txt] [variant]

variant: full (default) | g_only  (the 85.4 ms G-update-only composition)
Runs on the real chip (axon) — compiled as_text() works through the relay.
"""
import os
import re
import sys
from collections import Counter, defaultdict

import numpy as np
import jax
import jax.numpy as jnp
import optax

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from _t_train_profile import BATCH, SIZE, build_step, make_state  # noqa: E402

from lama_tpu.utils import enable_compilation_cache  # noqa: E402

NBYTES = {'s8': 1, 'u8': 1, 'bf16': 2, 'f16': 2, 'f32': 4, 's32': 4,
          'u32': 4, 'pred': 1, 'f64': 8, 's64': 8}


def classify(txt):
    """Aggregate top-level buffer writes (fusion/conv/custom-call roots) by
    (dtype, shape) and print the heavy classes."""
    root_re = re.compile(
        r'^\s+(?:ROOT\s+)?\S+\s*=\s*([a-z0-9]+)\[([0-9,]*)\][^=]*?'
        r'(fusion|convolution|custom-call|all-reduce|copy|transpose|dot)\(')
    by_shape = Counter()
    by_kind = Counter()
    total = 0
    for l in txt.splitlines():
        m = root_re.match(l)
        if not m:
            continue
        dt, shape, kind = m.groups()
        n = 1
        for s in shape.split(','):
            if s:
                n *= int(s)
        b = n * NBYTES.get(dt, 4)
        by_shape[(dt, shape)] += b
        by_kind[(kind, dt)] += b
        total += b
    print(f'total top-level HBM writes: {total / 1e9:.2f} GB', flush=True)
    print('\nby op kind (GB):')
    for (kind, dt), b in by_kind.most_common(12):
        print(f'  {kind:12s} {dt:5s} {b / 1e9:7.2f}')
    print('\ntop-30 buffer classes (dtype[shape] -> GB):')
    for (dt, shape), b in by_shape.most_common(30):
        print(f'  {dt}[{shape}]  {b / 1e9:6.2f}')
    return total, by_shape


def main():
    enable_compilation_cache()
    out_path = sys.argv[1] if len(sys.argv) > 1 else '/root/hlo_train.txt'
    variant = sys.argv[2] if len(sys.argv) > 2 else 'full'

    gen, disc, g_tx, d_tx, step = build_step(with_pl=(variant == 'full'))
    rng = np.random.RandomState(0)
    img = jnp.asarray(rng.rand(BATCH, SIZE, SIZE, 3).astype(np.float32))
    mask = jnp.zeros((BATCH, SIZE, SIZE, 1), np.float32)
    mask = mask.at[:, 64:160, 64:160, :].set(1.0)
    batch = {'image': img, 'mask': mask}
    state = make_state(gen, disc, g_tx, d_tx, batch)

    if variant == 'g_only':
        def fn(st, b, k):
            (g_loss, (m, g_stats, d_stats, _)), g_grads = jax.value_and_grad(
                step._generator_loss, has_aux=True)(st.g_params, st,
                                                    b['image'], b['mask'], k)
            upd, g_opt = g_tx.update(g_grads, st.g_opt_state, st.g_params)
            new = st.replace(g_params=optax.apply_updates(st.g_params, upd),
                             g_stats=g_stats, g_opt_state=g_opt,
                             step=st.step + 1)
            return new, g_loss
    else:
        def fn(st, b, k):
            st, m = step(st, b, k)
            return st, m['gen_total']

    print(f'lowering+compiling variant={variant} '
          f'({SIZE}² b{BATCH})...', flush=True)
    compiled = jax.jit(fn).lower(state, batch,
                                 jax.random.PRNGKey(1)).compile()
    txt = compiled.as_text()
    with open(out_path, 'w') as f:
        f.write(txt)
    print(f'wrote {len(txt) / 1e6:.1f} MB of HLO to {out_path}', flush=True)
    classify(txt)


if __name__ == '__main__':
    main()
