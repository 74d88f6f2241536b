'''conv2d_resample — 2D convolution with fused up/downsampling.

TPU-native rebuild of reference `thirdparty/stylegan3_ops/ops/conv2d_resample.py:53`.
The reference dispatches among six cuDNN call patterns; on TPU, XLA chooses the
convolution algorithm itself, so only the *semantics* are kept: pad once up
front (adjusted for the resampling filters), FIR-upsample → conv → FIR-down-
sample. Two FLOP-saving orderings are preserved (1x1 kernels commute with
resampling: downsample-first / convolve-first). The cuDNN channels-last
workaround (:32-44) is moot — NHWC *is* the TPU layout.

Weights are HWIO `[kh, kw, in_channels//groups, out_channels]`.
`flip_weight=True` = correlation (the default conv), False = convolution.
'''

from __future__ import annotations

import jax
import jax.numpy as jnp

from animeface_tpu.ops.upfirdn2d import (
    upfirdn2d, _parse_padding, _get_filter_size,
)


def _conv2d(x, w, stride: int = 1, padding=(0, 0), groups: int = 1,
            flip_weight: bool = True):
    kh, kw = int(w.shape[0]), int(w.shape[1])
    if not flip_weight and (kw > 1 or kh > 1):
        w = jnp.flip(w, axis=(0, 1))
    py, px = padding
    return jax.lax.conv_general_dilated(
        x, w.astype(x.dtype),
        window_strides=(stride, stride),
        padding=((py, py), (px, px)),
        dimension_numbers=('NHWC', 'HWIO', 'NHWC'),
        feature_group_count=groups,
    )


def conv2d_resample(x, w, f=None, up: int = 1, down: int = 1, padding=0,
                    groups: int = 1, flip_weight: bool = True,
                    flip_filter: bool = False):
    '''Conv with optional FIR-filtered up/downsampling (reference :53).

    x: [N,H,W,C], w: [kh,kw,C//groups,out], f: setup_filter output.
    `padding` is w.r.t. the upsampled image; performed once at the beginning.
    '''
    assert x.ndim == 4 and w.ndim == 4
    assert isinstance(up, int) and up >= 1
    assert isinstance(down, int) and down >= 1
    kh, kw = int(w.shape[0]), int(w.shape[1])
    fw, fh = _get_filter_size(f)
    px0, px1, py0, py1 = _parse_padding(padding)

    # Adjust padding to account for up/downsampling (reference :78-88).
    if up > 1:
        px0 += (fw + up - 1) // 2
        px1 += (fw - up) // 2
        py0 += (fh + up - 1) // 2
        py1 += (fh - up) // 2
    if down > 1:
        px0 += (fw - down + 1) // 2
        px1 += (fw - down) // 2
        py0 += (fh - down + 1) // 2
        py1 += (fh - down) // 2

    # 1x1 kernels commute with resampling — keep the cheap ordering.
    if kw == 1 and kh == 1 and down > 1 and up == 1:
        x = upfirdn2d(x, f, down=down, padding=[px0, px1, py0, py1],
                      flip_filter=flip_filter)
        return _conv2d(x, w, groups=groups, flip_weight=flip_weight)
    if kw == 1 and kh == 1 and up > 1 and down == 1:
        x = _conv2d(x, w, groups=groups, flip_weight=flip_weight)
        return upfirdn2d(x, f, up=up, padding=[px0, px1, py0, py1],
                         gain=up ** 2, flip_filter=flip_filter)

    # Plain conv when resampling is off and padding is symmetric.
    if up == 1 and down == 1 and px0 == px1 and py0 == py1 and px0 >= 0 and py0 >= 0:
        return _conv2d(x, w, padding=(py0, px0), groups=groups,
                       flip_weight=flip_weight)

    # General path: FIR-up -> conv -> FIR-down. XLA fuses what it can.
    x = upfirdn2d(x, (f if up > 1 else None), up=up,
                  padding=[px0, px1, py0, py1], gain=up ** 2,
                  flip_filter=flip_filter)
    x = _conv2d(x, w, groups=groups, flip_weight=flip_weight)
    if down > 1:
        x = upfirdn2d(x, f, down=down, flip_filter=flip_filter)
    return x
