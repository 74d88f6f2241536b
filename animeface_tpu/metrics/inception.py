'''InceptionV3 feature extractor for FID (pytorch-fid pool3 variant), flax.

Faithful NHWC re-implementation of torchvision `inception_v3` as modified by
pytorch-fid (FIDInceptionA/C/E: average pools with count_include_pad=False,
Mixed_7c's branch_pool uses max pool in torchvision — pytorch-fid keeps avg;
we follow pytorch-fid so converted weights reproduce its features).

Weights cannot be downloaded in this environment (zero egress): convert the
pytorch-fid checkpoint once with `tools/convert_inception_weights.py` on a
machine that has it, then point `ANIMEFACE_INCEPTION_WEIGHTS` at the .npz.
'''

from __future__ import annotations

import os
from typing import Any

import numpy as np
import jax
import jax.numpy as jnp
from flax import linen as nn

WEIGHTS_ENV = 'ANIMEFACE_INCEPTION_WEIGHTS'


def _same_pad(k):
    return tuple((p // 2, p // 2) if p % 2 == 1 else (p // 2 - 0, p // 2)
                 for p in k)


class BasicConv2d(nn.Module):
    '''conv -> batchnorm(eps 1e-3) -> relu (torchvision BasicConv2d).'''
    features: int
    kernel: tuple
    strides: tuple = (1, 1)
    padding: Any = (0, 0)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        pad = self.padding
        if isinstance(pad, (int,)):
            pad = (pad, pad)
        if isinstance(pad[0], int):
            pad = ((pad[0], pad[0]), (pad[1], pad[1]))
        x = nn.Conv(self.features, self.kernel, self.strides, padding=pad,
                    use_bias=False, dtype=self.dtype, name='conv')(x)
        x = nn.BatchNorm(use_running_average=True, epsilon=1e-3,
                         dtype=self.dtype, name='bn')(x)
        return jax.nn.relu(x)


def _avg_pool_cip_false(x, window=3):
    '''3x3/1 avg pool, pad 1, count_include_pad=False (pytorch-fid).'''
    ones = jnp.ones(x.shape[:-1] + (1,), x.dtype)
    s = jax.lax.reduce_window(x, 0., jax.lax.add, (1, window, window, 1),
                              (1, 1, 1, 1), 'SAME')
    c = jax.lax.reduce_window(ones, 0., jax.lax.add, (1, window, window, 1),
                              (1, 1, 1, 1), 'SAME')
    return s / c


def _max_pool(x, window=3, stride=2):
    return jax.lax.reduce_window(x, -jnp.inf, jax.lax.max,
                                 (1, window, window, 1),
                                 (1, stride, stride, 1), 'VALID')


class InceptionA(nn.Module):
    pool_features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        b1 = BasicConv2d(64, (1, 1), dtype=self.dtype, name='branch1x1')(x)
        b5 = BasicConv2d(48, (1, 1), dtype=self.dtype, name='branch5x5_1')(x)
        b5 = BasicConv2d(64, (5, 5), padding=(2, 2), dtype=self.dtype,
                         name='branch5x5_2')(b5)
        b3 = BasicConv2d(64, (1, 1), dtype=self.dtype, name='branch3x3dbl_1')(x)
        b3 = BasicConv2d(96, (3, 3), padding=(1, 1), dtype=self.dtype,
                         name='branch3x3dbl_2')(b3)
        b3 = BasicConv2d(96, (3, 3), padding=(1, 1), dtype=self.dtype,
                         name='branch3x3dbl_3')(b3)
        bp = _avg_pool_cip_false(x)
        bp = BasicConv2d(self.pool_features, (1, 1), dtype=self.dtype,
                         name='branch_pool')(bp)
        return jnp.concatenate([b1, b5, b3, bp], axis=-1)


class InceptionB(nn.Module):
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        b3 = BasicConv2d(384, (3, 3), (2, 2), dtype=self.dtype,
                         name='branch3x3')(x)
        bd = BasicConv2d(64, (1, 1), dtype=self.dtype, name='branch3x3dbl_1')(x)
        bd = BasicConv2d(96, (3, 3), padding=(1, 1), dtype=self.dtype,
                         name='branch3x3dbl_2')(bd)
        bd = BasicConv2d(96, (3, 3), (2, 2), dtype=self.dtype,
                         name='branch3x3dbl_3')(bd)
        bp = _max_pool(x)
        return jnp.concatenate([b3, bd, bp], axis=-1)


class InceptionC(nn.Module):
    c7: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        c7 = self.c7
        b1 = BasicConv2d(192, (1, 1), dtype=self.dtype, name='branch1x1')(x)
        b7 = BasicConv2d(c7, (1, 1), dtype=self.dtype, name='branch7x7_1')(x)
        b7 = BasicConv2d(c7, (1, 7), padding=(0, 3), dtype=self.dtype,
                         name='branch7x7_2')(b7)
        b7 = BasicConv2d(192, (7, 1), padding=(3, 0), dtype=self.dtype,
                         name='branch7x7_3')(b7)
        bd = BasicConv2d(c7, (1, 1), dtype=self.dtype, name='branch7x7dbl_1')(x)
        bd = BasicConv2d(c7, (7, 1), padding=(3, 0), dtype=self.dtype,
                         name='branch7x7dbl_2')(bd)
        bd = BasicConv2d(c7, (1, 7), padding=(0, 3), dtype=self.dtype,
                         name='branch7x7dbl_3')(bd)
        bd = BasicConv2d(c7, (7, 1), padding=(3, 0), dtype=self.dtype,
                         name='branch7x7dbl_4')(bd)
        bd = BasicConv2d(192, (1, 7), padding=(0, 3), dtype=self.dtype,
                         name='branch7x7dbl_5')(bd)
        bp = _avg_pool_cip_false(x)
        bp = BasicConv2d(192, (1, 1), dtype=self.dtype, name='branch_pool')(bp)
        return jnp.concatenate([b1, b7, bd, bp], axis=-1)


class InceptionD(nn.Module):
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        b3 = BasicConv2d(192, (1, 1), dtype=self.dtype, name='branch3x3_1')(x)
        b3 = BasicConv2d(320, (3, 3), (2, 2), dtype=self.dtype,
                         name='branch3x3_2')(b3)
        b7 = BasicConv2d(192, (1, 1), dtype=self.dtype, name='branch7x7x3_1')(x)
        b7 = BasicConv2d(192, (1, 7), padding=(0, 3), dtype=self.dtype,
                         name='branch7x7x3_2')(b7)
        b7 = BasicConv2d(192, (7, 1), padding=(3, 0), dtype=self.dtype,
                         name='branch7x7x3_3')(b7)
        b7 = BasicConv2d(192, (3, 3), (2, 2), dtype=self.dtype,
                         name='branch7x7x3_4')(b7)
        bp = _max_pool(x)
        return jnp.concatenate([b3, b7, bp], axis=-1)


class InceptionE(nn.Module):
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        b1 = BasicConv2d(320, (1, 1), dtype=self.dtype, name='branch1x1')(x)
        b3 = BasicConv2d(384, (1, 1), dtype=self.dtype, name='branch3x3_1')(x)
        b3a = BasicConv2d(384, (1, 3), padding=(0, 1), dtype=self.dtype,
                          name='branch3x3_2a')(b3)
        b3b = BasicConv2d(384, (3, 1), padding=(1, 0), dtype=self.dtype,
                          name='branch3x3_2b')(b3)
        b3 = jnp.concatenate([b3a, b3b], axis=-1)
        bd = BasicConv2d(448, (1, 1), dtype=self.dtype,
                         name='branch3x3dbl_1')(x)
        bd = BasicConv2d(384, (3, 3), padding=(1, 1), dtype=self.dtype,
                         name='branch3x3dbl_2')(bd)
        bda = BasicConv2d(384, (1, 3), padding=(0, 1), dtype=self.dtype,
                          name='branch3x3dbl_3a')(bd)
        bdb = BasicConv2d(384, (3, 1), padding=(1, 0), dtype=self.dtype,
                          name='branch3x3dbl_3b')(bd)
        bd = jnp.concatenate([bda, bdb], axis=-1)
        bp = _avg_pool_cip_false(x)   # pytorch-fid: avg in BOTH 7b and 7c
        bp = BasicConv2d(192, (1, 1), dtype=self.dtype, name='branch_pool')(bp)
        return jnp.concatenate([b1, b3, bd, bp], axis=-1)


class InceptionV3Features(nn.Module):
    '''images NHWC in [-1, 1] -> pool3 features [B, 2048].

    Input is bilinearly resized to 299x299 (pytorch-fid resize_input=True,
    normalize_input handled by the [-1,1] contract).
    '''
    dtype: Any = jnp.float32
    resize_input: bool = True

    @nn.compact
    def __call__(self, x):
        if self.resize_input and x.shape[1:3] != (299, 299):
            x = jax.image.resize(
                x, (x.shape[0], 299, 299, x.shape[3]), 'bilinear')
        x = x.astype(self.dtype)
        x = BasicConv2d(32, (3, 3), (2, 2), dtype=self.dtype,
                        name='Conv2d_1a_3x3')(x)
        x = BasicConv2d(32, (3, 3), dtype=self.dtype, name='Conv2d_2a_3x3')(x)
        x = BasicConv2d(64, (3, 3), padding=(1, 1), dtype=self.dtype,
                        name='Conv2d_2b_3x3')(x)
        x = _max_pool(x)
        x = BasicConv2d(80, (1, 1), dtype=self.dtype, name='Conv2d_3b_1x1')(x)
        x = BasicConv2d(192, (3, 3), dtype=self.dtype, name='Conv2d_4a_3x3')(x)
        x = _max_pool(x)
        x = InceptionA(32, self.dtype, name='Mixed_5b')(x)
        x = InceptionA(64, self.dtype, name='Mixed_5c')(x)
        x = InceptionA(64, self.dtype, name='Mixed_5d')(x)
        x = InceptionB(self.dtype, name='Mixed_6a')(x)
        x = InceptionC(128, self.dtype, name='Mixed_6b')(x)
        x = InceptionC(160, self.dtype, name='Mixed_6c')(x)
        x = InceptionC(160, self.dtype, name='Mixed_6d')(x)
        x = InceptionC(192, self.dtype, name='Mixed_6e')(x)
        x = InceptionD(self.dtype, name='Mixed_7a')(x)
        x = InceptionE(self.dtype, name='Mixed_7b')(x)
        x = InceptionE(self.dtype, name='Mixed_7c')(x)
        x = jnp.mean(x, axis=(1, 2))            # adaptive avg pool -> [B,2048]
        return x.astype(jnp.float32)


def inception_weights_path() -> str | None:
    p = os.environ.get(WEIGHTS_ENV)
    return p if p and os.path.exists(p) else None


def inception_available() -> bool:
    return inception_weights_path() is not None


def load_inception_params(path: str | None = None):
    '''Load variables from the converted .npz (see
    tools/convert_inception_weights.py). Returns flax variables dict
    {'params': ..., 'batch_stats': ...}.'''
    path = path or inception_weights_path()
    if path is None:
        raise FileNotFoundError(
            f'InceptionV3 weights not found. Convert the pytorch-fid '
            f'checkpoint with tools/convert_inception_weights.py and set '
            f'{WEIGHTS_ENV}=<path to .npz>.')
    flat = dict(np.load(path))
    params: dict = {}
    stats: dict = {}
    for key, val in flat.items():
        coll, _, rest = key.partition('/')
        tree = params if coll == 'params' else stats
        parts = rest.split('/')
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = jnp.asarray(val)
    return {'params': params, 'batch_stats': stats}


def make_extractor(variables=None, batch_size: int | None = None):
    '''Returns a jitted `extract_fn(images NHWC [-1,1]) -> [B, 2048]`.'''
    model = InceptionV3Features()
    if variables is None:
        variables = load_inception_params()

    @jax.jit
    def extract(images):
        return model.apply(variables, jnp.asarray(images))

    return extract
