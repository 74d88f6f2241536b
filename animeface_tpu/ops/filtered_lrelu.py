'''filtered_lrelu — fused bias → up-FIR → gain*LeakyReLU → clamp → down-FIR.

TPU-native rebuild of reference `thirdparty/stylegan3_ops/ops/filtered_lrelu.py`
(spec :50, ref composition :115-147, 1278-line CUDA mega-kernel filtered_lrelu.cu).
The StyleGAN3 per-layer hot op.

The 'xla' implementation is the documented composition
    bias_act(b) → upfirdn2d(fu, up, gain=up²) → bias_act(lrelu, gain, clamp)
    → upfirdn2d(fd, down)
which XLA fuses aggressively (the lrelu epilogue folds into the up-conv).

The CUDA kernel's advantage was partly *memory* — it retained only a
bit-packed sign tensor for backward instead of the up-sampled activation
(reference filtered_lrelu.py:199-226, sign alloc filtered_lrelu.cpp:80-92).
`memory='pack'` is the TPU-native translation: a `jax.custom_vjp` whose only
residual is a 2-bit gate code per up-sampled element (positive / leaky /
clamped-to-zero-grad), packed 4-per-uint8 along a flattened lane axis so the
stored tensor is 8x smaller than the bf16 intermediate (16x vs f32) and keeps
a wide trailing dim (TPU tiled layouts pad narrow lane dims). Backward applies
the exact adjoints of the two FIR stages via `jax.linear_transpose` — same
FLOPs as the stored-activation backward, none of the memory. This is what
unlocks StyleGAN3 training at competitive batch sizes (the 2x-resolution
intermediates dominate HBM). `memory='store'` keeps plain autodiff.

NHWC layout.
'''

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

from animeface_tpu.ops.upfirdn2d import (
    upfirdn2d, _parse_padding, _get_filter_size,
)
from animeface_tpu.ops.bias_act import bias_act
from animeface_tpu.ops.registry import resolve_impl


# ---------------------------------------------------------------------------
# memory='pack': 2-bit gate residual custom_vjp
# ---------------------------------------------------------------------------

import os

#: packing layout for the gate-code residual (trace-time static):
#:   'int32'  16 codes/uint32 over a flattened (W*C) lane axis (default —
#:            the TPU-native word; measured: uint8 shift/or at StyleGAN3-256
#:            batch-32 shapes CRASHES the TPU compiler (remote compile helper
#:            exit 1), while the same program with uint32 words compiles in
#:            ~46 s; sub-word integer ops are emulated and fragile at scale)
#:   'lanes'  4 codes/uint8 over the flattened lane axis
#:   'chan'   4 codes/uint8 along the channel axis only (no big reshape;
#:            also hits the uint8 compiler crash at batch 32)
#:   'u8'     unpacked uint8 codes (2x smaller than bf16; no bit ops) —
#:            diagnostic fallback
_PACK_LAYOUT = os.environ.get('ANIMEFACE_PACK_LAYOUT', 'int32')

#: diagnostic: which side uses the broadcast-vectorized bit ops ('both',
#: 'pack', 'unpack', 'none') — isolating a TPU compiler crash at batch 32
_PACK_VEC = os.environ.get('ANIMEFACE_PACK_VEC', 'both')


def _pack_gate_codes(codes, layout=None):
    '''uint8 codes in {0,1,2}, [N,H,W,C] -> packed per `layout`
    (default `_PACK_LAYOUT`).'''
    layout = layout or _PACK_LAYOUT
    N, H, W, C = codes.shape
    if layout == 'u8':
        return codes.astype(jnp.uint8)
    if layout == 'chan':
        pad = (-C) % 4
        if pad:
            codes = jnp.pad(codes, ((0, 0),) * 3 + ((0, pad),))
        q = codes.reshape(N, H, W, (C + pad) // 4, 4).astype(jnp.uint8)
        return (q[..., 0] | (q[..., 1] << 2) | (q[..., 2] << 4)
                | (q[..., 3] << 6))
    k = 16 if layout == 'int32' else 4
    dt = jnp.uint32 if layout == 'int32' else jnp.uint8
    pad = (-C) % k
    if pad:
        codes = jnp.pad(codes, ((0, 0),) * 3 + ((0, pad),))
    q = codes.reshape(N, H, (W * (C + pad)) // k, k).astype(dt)
    if layout == 'int32' and _PACK_VEC in ('both', 'pack'):
        # one broadcast shift + one reduction (a k-long sequential or-chain
        # of strided minor-dim slices is ~35% step-time at StyleGAN3 scale)
        shifts = jnp.arange(k, dtype=dt) * 2
        return jnp.sum(q << shifts[None, None, None, :], axis=-1, dtype=dt)
    if layout == 'int32' and _PACK_VEC in ('tree', 'tree-pack'):
        # log2(k) pairwise combines; intermediates stay <= k/2 wide
        bits = 2
        while q.shape[-1] > 1:
            q = q[..., 0::2] | (q[..., 1::2] << bits)
            bits *= 2
        return q[..., 0]
    out = q[..., 0]
    for j in range(1, k):
        out = out | (q[..., j] << (2 * j))
    return out


def _unpack_gate_codes(packed, shape, layout=None):
    '''Inverse of `_pack_gate_codes`; `shape` is the original [N,H,W,C].'''
    layout = layout or _PACK_LAYOUT
    N, H, W, C = shape
    if layout == 'u8':
        return packed
    if layout == 'chan':
        parts = [(packed >> (2 * j)) & jnp.uint8(3) for j in range(4)]
        q = jnp.stack(parts, axis=-1)
        return q.reshape(N, H, W, q.shape[-2] * 4)[..., :C]
    k = 16 if layout == 'int32' else 4
    if layout == 'int32' and _PACK_VEC in ('both', 'unpack'):
        shifts = jnp.arange(k, dtype=jnp.uint32) * 2
        q = ((packed[..., None] >> shifts[None, None, None, :])
             & jnp.uint32(3)).astype(jnp.uint8)
    elif layout == 'int32' and _PACK_VEC in ('tree', 'tree-unpack'):
        # inverse of the pairwise tree: split halves, interleave via reshape
        q = packed[..., None]
        bits = 32
        while q.shape[-1] < k:
            bits //= 2
            mask = jnp.uint32((1 << bits) - 1)
            q = jnp.stack([q & mask, q >> bits], axis=-1)
            q = q.reshape(q.shape[:-2] + (q.shape[-2] * 2,))
        q = q.astype(jnp.uint8)
    elif layout == 'int32':
        q = jnp.stack([((packed >> (2 * j)) & jnp.uint32(3)).astype(jnp.uint8)
                       for j in range(k)], axis=-1)
    else:
        mask = jnp.uint8(3)
        q = jnp.stack([((packed >> (2 * j)) & mask).astype(jnp.uint8)
                       for j in range(k)], axis=-1)
    cp = (q.shape[-2] * k) // W
    return q.reshape(N, H, W, cp)[..., :C]


@functools.lru_cache(maxsize=None)
def _make_packed_flrelu(x_shape, x_dtype, b_dtype, fu_shape, fd_shape,
                        up, down, padding, gain, slope, clamp, flip_filter,
                        pack_layout):
    '''Build (and cache per static configuration) the custom_vjp function.

    All shape/config values are static Python values here, so the backward
    can reconstruct every intermediate shape without storing it. The vjp's
    residuals are ONLY the packed gate codes (+ the tiny 1-D filters, which
    XLA aliases to the constants already in the graph).
    '''
    x_dtype = jnp.dtype(x_dtype)
    b_dtype = jnp.dtype(b_dtype)

    def _up_stage(v, fu):
        return upfirdn2d(v, fu, up=up, padding=list(padding), gain=up ** 2,
                         flip_filter=flip_filter, impl='xla')

    def _down_stage(v, fd):
        return upfirdn2d(v, fd, down=down, flip_filter=flip_filter, impl='xla')

    # static shape of the up-sampled intermediate, for the transposes
    z_shape = jax.eval_shape(
        lambda v: _up_stage(v, jnp.zeros(fu_shape, jnp.float32)),
        jax.ShapeDtypeStruct(x_shape, x_dtype)).shape

    def _elementwise(z):
        pos = z >= 0
        e = jnp.where(pos, z, z * jnp.asarray(slope, z.dtype))
        e = e * jnp.asarray(gain, z.dtype)
        if clamp is not None:
            live = jnp.abs(e) <= jnp.asarray(clamp, e.dtype)
            y_e = jnp.clip(e, -clamp, clamp)
            codes = jnp.where(live,
                              jnp.where(pos, jnp.uint8(2), jnp.uint8(1)),
                              jnp.uint8(0))
        else:
            y_e = e
            codes = jnp.where(pos, jnp.uint8(2), jnp.uint8(1))
        return y_e, codes

    @jax.custom_vjp
    def f(x, b, fu, fd):
        z = _up_stage(x + b.reshape(1, 1, 1, -1).astype(x.dtype), fu)
        y_e, _ = _elementwise(z)
        return _down_stage(y_e, fd)

    def f_fwd(x, b, fu, fd):
        z = _up_stage(x + b.reshape(1, 1, 1, -1).astype(x.dtype), fu)
        y_e, codes = _elementwise(z)
        return _down_stage(y_e, fd), (_pack_gate_codes(codes, pack_layout),
                                      fu, fd)

    def f_bwd(res, dy):
        packed, fu, fd = res
        dz_e, = jax.linear_transpose(
            lambda v: _down_stage(v, fd),
            jax.ShapeDtypeStruct(z_shape, x_dtype))(dy)
        codes = _unpack_gate_codes(packed, z_shape, pack_layout)
        mult = jnp.where(codes == 2, jnp.asarray(gain, dz_e.dtype),
                         jnp.where(codes == 1,
                                   jnp.asarray(gain * slope, dz_e.dtype),
                                   jnp.asarray(0, dz_e.dtype)))
        dz = dz_e * mult
        dx, = jax.linear_transpose(
            lambda v: _up_stage(v, fu),
            jax.ShapeDtypeStruct(x_shape, x_dtype))(dz)
        db = jnp.sum(dx.astype(jnp.float32), axis=(0, 1, 2)).astype(b_dtype)
        # the designed FIR filters are module constants — zero cotangents
        return dx, db, jnp.zeros(fu_shape, jnp.float32), jnp.zeros(fd_shape, jnp.float32)

    f.defvjp(f_fwd, f_bwd)
    return f


def _filtered_lrelu_packed(x, fu, fd, b, up, down, padding, gain, slope,
                           clamp, flip_filter):
    if b is None:
        b = jnp.zeros((x.shape[-1],), x.dtype)
    ones = jnp.ones((1,), jnp.float32)
    fu_ = ones if fu is None else jnp.asarray(fu, jnp.float32)
    fd_ = ones if fd is None else jnp.asarray(fd, jnp.float32)
    fn = _make_packed_flrelu(
        tuple(x.shape), jnp.dtype(x.dtype).name, jnp.dtype(b.dtype).name,
        tuple(fu_.shape), tuple(fd_.shape),
        int(up), int(down), tuple(int(p) for p in padding),
        float(gain), float(slope),
        None if clamp is None else float(clamp), bool(flip_filter),
        _PACK_LAYOUT)
    return fn(x, b, fu_, fd_)


@jax.named_scope('ops.filtered_lrelu')  # reference profiled_function seam (filtered_lrelu.py:114)
def filtered_lrelu(x, fu=None, fd=None, b=None, up: int = 1, down: int = 1,
                   padding=0, gain: float = float(np.sqrt(2)), slope: float = 0.2,
                   clamp=None, flip_filter: bool = False, impl: str | None = None,
                   memory: str = 'store'):
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

    assert memory in ('store', 'pack', 'remat'), memory
    if memory == 'pack':
        out = _filtered_lrelu_packed(x, fu, fd, b, up, down,
                                     (px0, px1, py0, py1),
                                     gain, slope, clamp, flip_filter)
        assert out.shape == (N, out_h, out_w, C), (out.shape, (N, out_h, out_w, C))
        return out
    if memory == 'remat':
        # per-layer rematerialization: backward recomputes the 2x-resolution
        # up-filtered intermediate from the layer input instead of storing
        # ANY residual (pack still stores the 2-bit gate codes). The memory-
        # scaling A/B lever named by the round-4 verdict (item 1); the blanket
        # synthesis-wide remat was already refuted at -14% in round 2.
        fn = jax.checkpoint(
            lambda x_, b_: filtered_lrelu(
                x_, fu, fd, b_, up, down, (px0, px1, py0, py1), gain, slope,
                clamp, flip_filter, impl='xla', memory='store'))
        return fn(x, b)

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
