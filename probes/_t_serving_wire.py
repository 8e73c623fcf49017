"""Measure the serving-wire effect at the CLI level on the real chip.

Generates a 32-image 512x512 synthetic suite, then times TWO warm
`bin/predict.py` runs (batch_size=16, big-lama deploy dir) — wire=fp32 vs
wire=uint8 — and checks the written PNGs are bit-equal (validates the TPU
floor/convert semantics match numpy's truncating cast end-to-end).

Usage: python probes/_t_serving_wire.py <deploy_model_dir> [out_root]
Each timed run happens in a fresh subprocess (relay-wedge hygiene); run the
script twice if the compilation cache is cold (first run pays compiles).
"""
import os
import subprocess
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def gen_suite(root, n=32, size=512, seed=0):
    sys.path.insert(0, REPO)
    from lama_tpu.data.io import save_image
    rng = np.random.RandomState(seed)
    os.makedirs(root, exist_ok=True)
    for i in range(n):
        # structured content (gradients + rectangles), not pure noise
        yy, xx = np.mgrid[0:size, 0:size].astype(np.float32) / size
        img = np.stack([yy, xx, (yy + xx) / 2], -1)
        for _ in range(6):
            y0, x0 = rng.randint(0, size - 64, 2)
            h, w = rng.randint(32, 160, 2)
            img[y0:y0 + h, x0:x0 + w] = rng.rand(3)
        mask = np.zeros((size, size, 1), np.float32)
        y0, x0 = rng.randint(size // 8, size // 2, 2)
        mask[y0:y0 + size // 4, x0:x0 + size // 4] = 1.0
        save_image(os.path.join(root, f's{i:03d}.png'), img)
        save_image(os.path.join(root, f's{i:03d}_mask.png'), mask)


def run_cli(model, indir, outdir, wire):
    t0 = time.time()
    res = subprocess.run(
        [sys.executable, os.path.join(REPO, 'bin', 'predict.py'),
         f'model.path={model}', f'indir={indir}', f'outdir={outdir}',
         'dataset.img_suffix=.png', 'batch_size=16', f'wire={wire}'],
        cwd=REPO, capture_output=True, text=True, timeout=3600)
    dt = time.time() - t0
    assert res.returncode == 0, res.stderr[-3000:]
    return dt


def main():
    model = sys.argv[1]
    root = sys.argv[2] if len(sys.argv) > 2 else '/tmp/wire_suite'
    indir = os.path.join(root, 'in')
    if not os.path.exists(indir):
        gen_suite(indir)
        print(f'suite: 32x512^2 at {indir}', flush=True)
    for wire in ('fp32', 'uint8'):
        dt = run_cli(model, indir, os.path.join(root, f'out_{wire}'), wire)
        print(f'wire={wire}: {dt:.1f}s total = {32 / dt:.2f} img/s '
              '(CLI wall incl. model load)', flush=True)
    import cv2
    diffs = 0
    for i in range(32):
        a = cv2.imread(os.path.join(root, 'out_fp32', f's{i:03d}_mask.png'))
        b = cv2.imread(os.path.join(root, 'out_uint8', f's{i:03d}_mask.png'))
        if not np.array_equal(a, b):
            diffs += 1
            print(f'  s{i:03d}: maxdiff={np.abs(a.astype(int) - b).max()}')
    print(f'bit-equal files: {32 - diffs}/32', flush=True)


if __name__ == '__main__':
    main()
