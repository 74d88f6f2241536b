'''Cross-cutting misc utilities.

Capability parity with reference `utils/misc.py` (EasyDict :10, print_for_repr :26,
gif_from_files :84, make_image_grid :100) — re-implemented for numpy/JAX arrays.
'''

from __future__ import annotations

from functools import wraps
from typing import Any

import numpy as np
from PIL import Image


class EasyDict(dict):
    '''dict with attribute-style access.'''

    def __getattr__(self, name: str) -> Any:
        try:
            return self[name]
        except KeyError:
            raise AttributeError(name)

    def __setattr__(self, name: str, value: Any) -> None:
        self[name] = value

    def __delattr__(self, name: str) -> None:
        del self[name]


class print_for_repr:
    '''Decorator printing positional/keyword args of a call for reproduction.'''

    print_func = print

    def __call__(self, func):
        @wraps(func)
        def wrapper(*args, **kwargs):
            if func.__name__ == '__init__':
                name = args[0].__class__.__name__
                print_args = args[1:]
            else:
                name = func.__name__
                print_args = args
            message = 'Called: {}({}{}{})'.format(
                name,
                ', '.join(map(str, print_args)),
                ', ' if kwargs else '',
                ', '.join(f'{k}={v}' for k, v in kwargs.items()))
            type(self).print_func(message)
            return func(*args, **kwargs)
        return wrapper


def gif_from_files(image_paths, filename: str = 'out.gif',
                   optimize: bool = False, duration: int = 500, loop: int = 0) -> None:
    images = [Image.open(str(p)) for p in image_paths]
    images[0].save(filename, save_all=True, append_images=images[1:],
                   optimize=optimize, duration=duration, loop=loop)


def make_image_grid(*image_tensors, num_images: int | None = None):
    '''Interleave several [N,H,W,C] batches into one [M,H,W,C] batch.

    Mirrors reference `make_image_grid` semantics (round-robin over inputs)
    but on numpy/JAX NHWC arrays.
    '''
    arrays = [np.asarray(t) for t in image_tensors]
    out = []
    for index, image_set in enumerate(zip(*[list(a) for a in arrays])):
        out.extend(image_set)
        if num_images is not None and index == num_images - 1:
            break
    return np.stack(out, axis=0)


def to_pil_image(array, denormalize: bool = True) -> Image.Image:
    '''[H,W,C] float array (optionally in [-1,1]) -> PIL image.'''
    a = np.asarray(array, dtype=np.float32)
    if denormalize:
        a = a * 0.5 + 0.5
    a = np.clip(a * 255.0 + 0.5, 0, 255).astype(np.uint8)
    if a.shape[-1] == 1:
        a = a[..., 0]
    return Image.fromarray(a)


def save_image(images, filename, nrow: int = 8, denormalize: bool = True) -> None:
    '''Save a batch [N,H,W,C] as a tiled grid image (torchvision.save_image parity).'''
    a = np.asarray(images, dtype=np.float32)
    if a.ndim == 3:
        a = a[None]
    n, h, w, c = a.shape
    ncol = min(nrow, n)
    nr = (n + ncol - 1) // ncol
    pad = 2
    grid = np.ones((nr * (h + pad) + pad, ncol * (w + pad) + pad, c), dtype=np.float32)
    if denormalize:
        a = a * 0.5 + 0.5
        a = np.clip(a, 0.0, 1.0)
    for idx in range(n):
        r, col = divmod(idx, ncol)
        top, left = pad + r * (h + pad), pad + col * (w + pad)
        grid[top:top + h, left:left + w] = a[idx]
    arr = np.clip(grid * 255.0 + 0.5, 0, 255).astype(np.uint8)
    if c == 1:
        arr = arr[..., 0]
    Image.fromarray(arr).save(str(filename))
