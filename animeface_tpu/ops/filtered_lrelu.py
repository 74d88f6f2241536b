'''filtered_lrelu — fused bias → up-FIR → gain*LeakyReLU → clamp → down-FIR.

TPU-native rebuild of reference `thirdparty/stylegan3_ops/ops/filtered_lrelu.py`
(spec :50, ref composition :115-147, 1278-line CUDA mega-kernel filtered_lrelu.cu).
The StyleGAN3 per-layer hot op.

The 'xla' implementation is the documented composition
    bias_act(b) → upfirdn2d(fu, up, gain=up²) → bias_act(lrelu, gain, clamp)
    → upfirdn2d(fd, down)
which XLA fuses aggressively (the lrelu epilogue folds into the up-conv).
The CUDA kernel's advantage was *memory* — it kept only a bit-packed sign
tensor for backward (filtered_lrelu.py:199-226). The TPU equivalent is
rematerialisation: wrap in `jax.checkpoint` at the call site so backward
recomputes the up-sampled intermediate instead of storing it; HBM traffic,
not sign storage, is the scarce resource on TPU. A fully fused Pallas kernel
is pluggable through the registry.

NHWC layout.
'''

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from animeface_tpu.ops.upfirdn2d import (
    upfirdn2d, _parse_padding, _get_filter_size,
)
from animeface_tpu.ops.bias_act import bias_act
from animeface_tpu.ops.registry import resolve_impl


@jax.named_scope('ops.filtered_lrelu')  # reference profiled_function seam (filtered_lrelu.py:114)
def filtered_lrelu(x, fu=None, fd=None, b=None, up: int = 1, down: int = 1,
                   padding=0, gain: float = float(np.sqrt(2)), slope: float = 0.2,
                   clamp=None, flip_filter: bool = False, impl: str | None = None):
    '''See module docstring; argument semantics match reference filtered_lrelu :50.'''
    assert x.ndim == 4, 'expected NHWC'
    fu_w, fu_h = _get_filter_size(fu)
    fd_w, fd_h = _get_filter_size(fd)
    if b is not None:
        assert b.shape[0] == x.shape[-1]
    assert isinstance(up, int) and up >= 1
    assert isinstance(down, int) and down >= 1
    px0, px1, py0, py1 = _parse_padding(padding)
    assert gain > 0 and slope >= 0
    assert clamp is None or clamp >= 0

    N, H, W, C = x.shape
    out_w = (W * up + (px0 + px1) - (fu_w - 1) - (fd_w - 1) + (down - 1)) // down
    out_h = (H * up + (py0 + py1) - (fu_h - 1) - (fd_h - 1) + (down - 1)) // down

    impl = resolve_impl(impl)
    if impl == 'pallas':
        from animeface_tpu.ops import pallas_kernels
        fn = pallas_kernels.filtered_lrelu_pallas
        if fn is not None:
            out = fn(x, fu, fd, b, up, down, (px0, px1, py0, py1),
                     gain, slope, clamp, flip_filter)
            if out is not None:
                return out

    in_dtype = x.dtype
    x = bias_act(x, b)
    x = upfirdn2d(x, fu, up=up, padding=[px0, px1, py0, py1],
                       gain=up ** 2, flip_filter=flip_filter, impl='xla')
    x = bias_act(x, act='lrelu', alpha=slope, gain=gain, clamp=clamp)
    x = upfirdn2d(x, fd, down=down, flip_filter=flip_filter, impl='xla')

    assert x.shape == (N, out_h, out_w, C), (x.shape, (N, out_h, out_w, C))
    assert x.dtype == in_dtype
    return x
