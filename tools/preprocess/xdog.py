'''XDoG line-art extraction for the sketch-colorization datasets.

The reference consumes precomputed `<root>/xdog/` directories (dataset
ImageXDoG, reference `dataset/_base.py:146`) but ships no generator; this
tool produces them. Standard XDoG (Winnemoeller et al. 2012):

    D(x) = G_sigma(x) - gamma * G_{k*sigma}(x)
    out  = 1                      if D >= eps
           1 + tanh(phi * (D - eps))  otherwise

Usage:
    python tools/preprocess/xdog.py --images 'data/images/*' --out data/xdog/
'''

from __future__ import annotations

import argparse
import glob
import os

import numpy as np
from PIL import Image
from scipy.ndimage import gaussian_filter


def xdog(gray: np.ndarray, sigma: float = 0.8, k: float = 1.6,
         gamma: float = 0.98, eps: float = -0.1, phi: float = 200.0
         ) -> np.ndarray:
    '''gray float [0,1] HxW -> line art float [0,1] (white bg, dark lines).'''
    g1 = gaussian_filter(gray, sigma)
    g2 = gaussian_filter(gray, sigma * k)
    d = g1 - gamma * g2
    out = np.where(d >= eps, 1.0, 1.0 + np.tanh(phi * (d - eps)))
    return np.clip(out, 0.0, 1.0)


def process(path: str, out_dir: str, size: int | None, **params) -> str:
    img = Image.open(path).convert('L')
    if size:
        img = img.resize((size, size), Image.BILINEAR)
    gray = np.asarray(img, np.float32) / 255.0
    line = (xdog(gray, **params) * 255).astype(np.uint8)
    out_path = os.path.join(out_dir, os.path.basename(path))
    root, ext = os.path.splitext(out_path)
    if ext.lower() not in ('.png', '.jpg', '.jpeg'):
        out_path = root + '.png'
    Image.fromarray(line).save(out_path)
    return out_path


def main():
    p = argparse.ArgumentParser()
    p.add_argument('--images', required=True, help='glob for source images')
    p.add_argument('--out', required=True, help='output directory')
    p.add_argument('--size', type=int, default=None,
                   help='optionally resize to size x size first')
    p.add_argument('--sigma', type=float, default=0.8)
    p.add_argument('--k', type=float, default=1.6)
    p.add_argument('--gamma', type=float, default=0.98)
    p.add_argument('--eps', type=float, default=-0.1)
    p.add_argument('--phi', type=float, default=200.0)
    args = p.parse_args()

    paths = sorted(glob.glob(args.images))
    if not paths:
        raise SystemExit(f'no images match {args.images!r}')
    os.makedirs(args.out, exist_ok=True)
    for i, path in enumerate(paths):
        process(path, args.out, args.size, sigma=args.sigma, k=args.k,
                gamma=args.gamma, eps=args.eps, phi=args.phi)
        if (i + 1) % 500 == 0:
            print(f'{i + 1}/{len(paths)}')
    print(f'wrote {len(paths)} line-art images -> {args.out}')


if __name__ == '__main__':
    main()
