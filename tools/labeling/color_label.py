'''HiSD category labeling -> hair_color_labels.csv / eye_color_labels.csv /
glass_labels.csv (`path,tag` lines, disjoint image sets, balanced binary
glasses category).

Counterpart of reference `preprocess/labeling/color_label.py` with the same
output contract; the tagger backend is pluggable like tools/labeling/label.py
(the heuristic backend only supports hair color — eye/glasses need i2v).

Usage:
    python tools/labeling/color_label.py --images 'data/images/*' \
        --out-dir data/ --per-category 10000 [--tagger i2v]
'''

from __future__ import annotations

import argparse
import glob
import random

from tools.labeling.label import make_tagger, save_csv

HAIR_TAGS = ['blonde hair', 'brown hair', 'black hair', 'blue hair',
             'pink hair', 'purple hair', 'green hair', 'red hair',
             'silver hair']
EYE_TAGS = ['blue eyes', 'red eyes', 'brown eyes', 'green eyes',
            'purple eyes', 'yellow eyes', 'pink eyes']
GLASS_TAG = ['glasses']


def label_category(image_paths, tagger, allowed, num_images,
                   threshold=0.5, used=()):  # reference label_it semantics
    used = set(used)
    out = []
    for path in image_paths:
        if path in used:
            continue
        from PIL import Image
        try:
            img = Image.open(path)
        except OSError:
            continue
        tag, prob = tagger(img)
        if tag in allowed and prob > threshold:
            out.append((path, tag))
        if len(out) == num_images:
            break
    return out


def label_binary(image_paths, tagger, tag_name, num_images,
                 w_threshold=0.5, wo_threshold=0.01, used=(), balanced=True):
    used = set(used)
    with_, without = [], []
    per_tag = num_images // 2
    for path in image_paths:
        if path in used:
            continue
        from PIL import Image
        try:
            img = Image.open(path)
        except OSError:
            continue
        tag, prob = tagger(img)
        hit = prob if tag == tag_name else 0.0
        if hit > w_threshold and len(with_) < per_tag:
            with_.append((path, 'with'))
        elif hit < wo_threshold and len(without) < per_tag:
            without.append((path, 'without'))
        if len(with_) + len(without) == num_images:
            break
    if balanced:
        n = min(len(with_), len(without))
        with_, without = with_[:n], without[:n]
    return with_ + without


def label_them(image_paths, tagger, per_category, seed=0):
    rng = random.Random(seed)
    paths = list(image_paths)
    rng.shuffle(paths)
    glass = label_binary(paths, tagger, 'glasses', per_category)
    used = [p for p, _ in glass]
    rng.shuffle(paths)
    hair = label_category(paths, tagger, set(HAIR_TAGS), per_category,
                          used=used)
    used.extend(p for p, _ in hair)
    rng.shuffle(paths)
    eye = label_category(paths[::-1], tagger, set(EYE_TAGS), per_category,
                         used=used)
    return hair, eye, glass


def main():
    p = argparse.ArgumentParser()
    p.add_argument('--images', required=True)
    p.add_argument('--out-dir', required=True)
    p.add_argument('--per-category', type=int, default=10000)
    p.add_argument('--tagger', default='heuristic',
                   choices=['heuristic', 'i2v'])
    p.add_argument('--seed', type=int, default=0)
    args = p.parse_args()

    import os
    paths = sorted(glob.glob(args.images))
    if not paths:
        raise SystemExit(f'no images match {args.images!r}')
    tagger = make_tagger(args.tagger)
    hair, eye, glass = label_them(paths, tagger, args.per_category, args.seed)
    save_csv(dict(hair), os.path.join(args.out_dir, 'hair_color_labels.csv'))
    save_csv(dict(eye), os.path.join(args.out_dir, 'eye_color_labels.csv'))
    save_csv(dict(glass), os.path.join(args.out_dir, 'glass_labels.csv'))
    print(f'hair {len(hair)}  eye {len(eye)}  glass {len(glass)}')


if __name__ == '__main__':
    main()
