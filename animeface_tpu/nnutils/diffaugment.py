'''DiffAugment — differentiable augmentation for data-efficient GAN training.
(Zhao et al. 2020, arXiv:2006.10738.)

Rebuild of reference `thirdparty/diffaugment/DiffAugment.py:10` for NHWC jnp
with explicit PRNG keys: `diff_augment(key, x, policy)` is pure and lives
INSIDE the jitted D step, fused into the discriminator input path (the
reference called it as a separate graph op). Translation is expressed as a
clamped gather over a 1-padded image and cutout as a mask product — identical
semantics, differentiable w.r.t. x everywhere.
'''

from __future__ import annotations

import jax
import jax.numpy as jnp


def rand_brightness(key, x):
    b = jax.random.uniform(key, (x.shape[0], 1, 1, 1), x.dtype) - 0.5
    return x + b


def rand_saturation(key, x):
    x_mean = jnp.mean(x, axis=-1, keepdims=True)
    s = jax.random.uniform(key, (x.shape[0], 1, 1, 1), x.dtype) * 2
    return (x - x_mean) * s + x_mean


def rand_contrast(key, x):
    x_mean = jnp.mean(x, axis=(1, 2, 3), keepdims=True)
    c = jax.random.uniform(key, (x.shape[0], 1, 1, 1), x.dtype) + 0.5
    return (x - x_mean) * c + x_mean


def rand_translation(key, x, ratio: float = 0.125):
    '''Per-sample integer translation with zero fill.

    TPU note: expressed as a vmapped dynamic_slice over a zero-padded image —
    a contiguous block copy — instead of the reference's pointwise index
    gather (DiffAugment.py:39-52), which lowered to a scatter/gather pair
    costing as much as a full D forward at 256px. out[n, i, j] = x[n, i+th,
    j+tw] (zeros out of range), matching the reference exactly.
    '''
    N, H, W, C = x.shape
    shift_h = int(H * ratio + 0.5)
    shift_w = int(W * ratio + 0.5)
    kh, kw = jax.random.split(key)
    th = jax.random.randint(kh, (N, 1, 1), -shift_h, shift_h + 1)
    tw = jax.random.randint(kw, (N, 1, 1), -shift_w, shift_w + 1)
    x_pad = jnp.pad(x, ((0, 0), (shift_h, shift_h), (shift_w, shift_w),
                        (0, 0)))

    def slice_one(img, oh, ow):
        return jax.lax.dynamic_slice(img, (oh, ow, 0), (H, W, C))

    oh = (shift_h + th[:, 0, 0]).astype(jnp.int32)
    ow = (shift_w + tw[:, 0, 0]).astype(jnp.int32)
    return jax.vmap(slice_one)(x_pad, oh, ow)


def rand_cutout(key, x, ratio: float = 0.5):
    N, H, W, C = x.shape
    ch = int(H * ratio + 0.5)
    cw = int(W * ratio + 0.5)
    kh, kw = jax.random.split(key)
    oh = jax.random.randint(kh, (N, 1, 1), 0, H + (1 - ch % 2))
    ow = jax.random.randint(kw, (N, 1, 1), 0, W + (1 - cw % 2))
    gh = jax.lax.broadcasted_iota(jnp.int32, (N, H, W), 1)
    gw = jax.lax.broadcasted_iota(jnp.int32, (N, H, W), 2)
    # inside-the-hole test replaces the reference's scatter into a ones-mask
    inside_h = (gh >= oh - ch // 2) & (gh < oh - ch // 2 + ch)
    inside_w = (gw >= ow - cw // 2) & (gw < ow - cw // 2 + cw)
    # reference clamps hole coords into the image, so a hole crossing the
    # border shrinks rather than wraps; clamp reproduces that by saturating
    start_h = jnp.clip(oh - ch // 2, 0, H - 1)
    end_h = jnp.clip(oh - ch // 2 + ch - 1, 0, H - 1)
    start_w = jnp.clip(ow - cw // 2, 0, W - 1)
    end_w = jnp.clip(ow - cw // 2 + cw - 1, 0, W - 1)
    mask = ((gh >= start_h) & (gh <= end_h) & (gw >= start_w) & (gw <= end_w))
    return x * (1.0 - mask[..., None].astype(x.dtype))


AUGMENT_FNS = {
    'color': [rand_brightness, rand_saturation, rand_contrast],
    'translation': [rand_translation],
    'cutout': [rand_cutout],
}


def diff_augment(key, x, policy: str = ''):
    '''Apply the augmentation policy string, e.g. 'color,translation,cutout'.'''
    if not policy:
        return x
    fns = [f for p in policy.split(',') for f in AUGMENT_FNS[p]]
    keys = jax.random.split(key, len(fns))
    for k, f in zip(keys, fns):
        x = f(k, x)
    return x


# reference-name alias
DiffAugment = diff_augment
