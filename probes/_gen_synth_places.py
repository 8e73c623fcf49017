"""Generate a structured synthetic Places-like dataset for the on-chip
training campaign (VERDICT r3 item 1): random gradient backgrounds with
colored shapes — enough visual structure for the GAN losses to be
meaningful. Writes train jpgs + val image/mask png pairs."""
import os
import sys

import cv2
import numpy as np

OUT = sys.argv[1] if len(sys.argv) > 1 else '/root/repo/probes/synth_places'
N_TRAIN = int(sys.argv[2]) if len(sys.argv) > 2 else 800
N_VAL = 20
S = 256


def synth_image(rng):
    # linear gradient background
    a, b = rng.rand(3), rng.rand(3)
    t = np.linspace(0, 1, S)
    gy, gx = np.meshgrid(t, t, indexing='ij')
    ang = rng.rand() * 2 * np.pi
    g = (np.cos(ang) * gx + np.sin(ang) * gy - min(0, np.cos(ang)) - min(0, np.sin(ang)))
    g = (g / max(g.max(), 1e-6))[..., None]
    img = (a[None, None] * (1 - g) + b[None, None] * g)
    img = (img * 255).astype(np.uint8).copy()
    for _ in range(rng.randint(3, 9)):
        color = tuple(int(v) for v in rng.randint(0, 256, 3))
        kind = rng.randint(3)
        if kind == 0:
            p1 = tuple(int(v) for v in rng.randint(0, S, 2))
            p2 = tuple(int(v) for v in rng.randint(0, S, 2))
            cv2.rectangle(img, p1, p2, color, -1)
        elif kind == 1:
            c = tuple(int(v) for v in rng.randint(0, S, 2))
            cv2.circle(img, c, int(rng.randint(8, 80)), color, -1)
        else:
            p1 = tuple(int(v) for v in rng.randint(0, S, 2))
            p2 = tuple(int(v) for v in rng.randint(0, S, 2))
            cv2.line(img, p1, p2, color, int(rng.randint(2, 12)))
    # mild texture noise
    img = np.clip(img.astype(np.int16)
                  + rng.randint(-12, 13, img.shape, dtype=np.int16), 0, 255)
    return img.astype(np.uint8)


def main():
    rng = np.random.RandomState(0)
    os.makedirs(os.path.join(OUT, 'train'), exist_ok=True)
    os.makedirs(os.path.join(OUT, 'val'), exist_ok=True)
    os.makedirs(os.path.join(OUT, 'visual_test'), exist_ok=True)
    for i in range(N_TRAIN):
        cv2.imwrite(os.path.join(OUT, 'train', f'img{i:05d}.jpg'),
                    synth_image(rng), [cv2.IMWRITE_JPEG_QUALITY, 92])
    for split, n in (('val', N_VAL), ('visual_test', 4)):
        for i in range(n):
            img = synth_image(rng)
            cv2.imwrite(os.path.join(OUT, split, f'v{i:03d}.png'), img)
            mask = np.zeros((S, S), np.uint8)
            y, x = rng.randint(16, S - 112, 2)
            mask[y:y + rng.randint(48, 96), x:x + rng.randint(48, 96)] = 255
            cv2.imwrite(os.path.join(OUT, split, f'v{i:03d}_mask.png'), mask)
    print('dataset at', OUT, flush=True)


if __name__ == '__main__':
    main()
