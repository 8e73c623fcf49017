"""Dump the optimized (post-fusion, scheduled) HLO of the int8 serving
program and summarize the inter-conv dataflow.

Question (round-4 untried lever, cross-layer int8 activation storage):
between two consecutive quantized convs, does XLA already fuse the
dequant -> BN -> ReLU -> (static-scale) quantize chain into conv-epilogue
fusions that WRITE int8 to HBM, or does it materialize bf16/f32
intermediates?  If int8 buffers already flow between convolutions there is
no headroom in an explicit requantize path; if wide float buffers dominate,
an int8 cross-layer storage lever is worth building.

Usage:  PYTHONPATH=/root/repo python probes/_t_hlo_dump.py [out.txt]
Runs on the real chip (axon) — as_text() of the compiled executable works
through the relay (measured 2026-08-19).
"""
import re
import sys
from collections import Counter

import jax
import jax.numpy as jnp
import numpy as np

from lama_tpu.serving import (calibrate_int8, load_serving_model,
                              make_inpaint_forward)
from lama_tpu.utils import enable_compilation_cache

MODEL = '/root/deploy_r4'
H = W = 512
B = 16


def main():
    enable_compilation_cache()
    out_path = sys.argv[1] if len(sys.argv) > 1 else '/root/hlo_int8.txt'
    gen, variables, _ = load_serving_model(MODEL, checkpoint='best',
                                           precision='int8',
                                           quant_zero_pad=True)
    rng = np.random.RandomState(0)
    img = rng.rand(B, H, W, 3).astype(np.float32)
    mask = (rng.rand(B, H, W, 1) > 0.7).astype(np.float32)
    variables = calibrate_int8(gen, variables, [(img, mask)])
    fwd = make_inpaint_forward(gen)
    lowered = jax.jit(fwd).lower(variables, img, mask)
    compiled = lowered.compile()
    txt = compiled.as_text()
    with open(out_path, 'w') as f:
        f.write(txt)
    print(f'wrote {len(txt)/1e6:.1f} MB of HLO to {out_path}', flush=True)

    # --- summary ---------------------------------------------------------
    conv_lines = [l for l in txt.splitlines() if ' convolution(' in l
                  or ' convolution.' in l and '= ' in l]
    conv_re = re.compile(r'=\s+(\S+)\s+convolution\(')
    dtypes = Counter()
    for l in txt.splitlines():
        m = conv_re.search(l)
        if m:
            dtypes[m.group(1).split('[')[0]] += 1
    print('convolution output dtypes:', dict(dtypes))

    # fusion roots: what dtype do fusions write?
    fus_re = re.compile(r'=\s+([a-z0-9]+)\[([0-9,]*)\][^=]*fusion\(')
    fus_dtypes = Counter()
    fus_bytes = Counter()
    nbytes = {'s8': 1, 'u8': 1, 'bf16': 2, 'f16': 2, 'f32': 4, 's32': 4,
              'u32': 4, 'pred': 1, 'f64': 8, 's64': 8}
    for l in txt.splitlines():
        m = fus_re.search(l)
        if m:
            dt, shape = m.group(1), m.group(2)
            n = 1
            for s in shape.split(','):
                if s:
                    n *= int(s)
            fus_dtypes[dt] += 1
            fus_bytes[dt] += n * nbytes.get(dt, 4)
    print('fusion root dtypes (count):', dict(fus_dtypes))
    print('fusion root dtypes (MB written):',
          {k: round(v / 1e6, 1) for k, v in fus_bytes.items()})

    # convolutions fed directly by int8 fusions vs via float intermediates
    print('total convolution ops:', len(conv_lines))


if __name__ == '__main__':
    main()
