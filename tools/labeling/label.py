'''Attribute labeling -> labels.csv (`path,tag` per line).

Counterpart of reference `preprocess/labeling/label.py` (illustration2vec
chainer model). The i2v caffemodel cannot be used in this environment, so the
tagger backend is pluggable:

  * `--tagger i2v` — use illustration2vec if the package + model files are
    installed (reference behavior, same tag set and 0.5 threshold);
  * `--tagger heuristic` (default) — dependency-free hair-color tagger from
    hue statistics of the upper image region. Only emits the nine hair-color
    tags; rows it is unsure about are dropped (threshold semantics).

Usage:
    python tools/labeling/label.py --images 'path/to/images/*' \
        --out labels.csv [--tagger heuristic] [--threshold 0.5]
'''

from __future__ import annotations

import argparse
import glob
from collections import Counter

import numpy as np
from PIL import Image

TAGS = ['blonde hair', 'brown hair', 'black hair', 'blue hair', 'pink hair',
        'purple hair', 'green hair', 'red hair', 'silver hair', 'white hair',
        'orange hair', 'aqua hair', 'grey hair', 'long hair', 'short hair',
        'twintails', 'drill hair', 'ponytail', 'blush', 'smile', 'open mouth',
        'hat', 'ribbon', 'glasses', 'blue eyes', 'red eyes', 'brown eyes',
        'green eyes', 'purple eyes', 'yellow eyes', 'pink eyes', 'aqua eyes',
        'black eyes', 'orange eyes']

# hue buckets (degrees) for the heuristic hair tagger
_HUE_TAGS = [
    (15, 45, 'blonde hair'), (45, 70, 'green hair'), (70, 170, 'green hair'),
    (170, 200, 'aqua hair'), (200, 250, 'blue hair'),
    (250, 290, 'purple hair'), (290, 330, 'pink hair'),
    (330, 350, 'red hair'), (350, 361, 'red hair'), (0, 15, 'orange hair'),
]


def heuristic_hair_tag(img: Image.Image):
    '''(tag, confidence) from hue/sat/val stats of the top 40% of the image.'''
    a = np.asarray(img.convert('RGB').resize((64, 64)), np.float32) / 255.
    region = a[:26]
    mx = region.max(-1)
    mn = region.min(-1)
    v = mx
    s = np.where(mx > 0, (mx - mn) / np.maximum(mx, 1e-6), 0.)
    r, g, b = region[..., 0], region[..., 1], region[..., 2]
    h = np.zeros_like(mx)
    d = np.maximum(mx - mn, 1e-6)
    h = np.where(mx == r, (g - b) / d % 6, h)
    h = np.where(mx == g, (b - r) / d + 2, h)
    h = np.where(mx == b, (r - g) / d + 4, h)
    h = h * 60.0

    mask = s > 0.15
    frac_sat = float(mask.mean())
    if frac_sat < 0.2:
        # desaturated hair: value decides black / grey / silver / white
        mv = float(v.mean())
        tag = ('black hair' if mv < 0.25 else 'grey hair' if mv < 0.55
               else 'silver hair' if mv < 0.8 else 'white hair')
        return tag, 1.0 - frac_sat
    hs = h[mask]
    vs = v[mask]
    med = float(np.median(hs))
    if 15 <= med < 45 and float(vs.mean()) < 0.45:
        return 'brown hair', frac_sat
    for lo, hi, tag in _HUE_TAGS:
        if lo <= med < hi:
            return tag, frac_sat
    return 'brown hair', frac_sat * 0.5


def make_tagger(kind: str):
    if kind == 'i2v':
        import i2v  # reference backend; needs model files
        model = i2v.make_i2v_with_chainer(
            '/usr/src/data/illustration2vec/illust2vec_tag_ver200.caffemodel',
            '/usr/src/data/illustration2vec/tag_list.json')

        def tag(img):
            t2p = model.estimate_specific_tags([img], TAGS)[0]
            return sorted(t2p.items(), key=lambda x: x[1], reverse=True)[0]
        return tag
    return heuristic_hair_tag


def label_it(image_paths, tagger, threshold: float = 0.5):
    path2tag = {}
    for path in image_paths:
        try:
            img = Image.open(path)
        except OSError:
            continue
        tag, prob = tagger(img)
        if prob > threshold:
            path2tag[path] = tag
    return path2tag


def save_csv(path2tag: dict, filename: str) -> None:
    assert filename.endswith('.csv'), 'input filename with ".csv" extension.'
    lines = [','.join([file, tag]) for file, tag in path2tag.items()]
    with open(filename, 'w', encoding='utf-8') as fout:
        fout.write('\n'.join(lines))


def main():
    p = argparse.ArgumentParser()
    p.add_argument('--images', required=True, help='glob for image files')
    p.add_argument('--out', required=True, help='output labels.csv')
    p.add_argument('--tagger', default='heuristic',
                   choices=['heuristic', 'i2v'])
    p.add_argument('--threshold', type=float, default=0.5)
    args = p.parse_args()

    paths = sorted(glob.glob(args.images))
    if not paths:
        raise SystemExit(f'no images match {args.images!r}')
    tagger = make_tagger(args.tagger)
    path2tag = label_it(paths, tagger, args.threshold)
    print(Counter(path2tag.values()))
    save_csv(path2tag, args.out)
    print(f'wrote {len(path2tag)} labels -> {args.out}')


if __name__ == '__main__':
    main()
