'''Pallas TPU kernel for the fused cyclic line pass of the ADA two-pass warp.

The XLA formulation of `_line_pass` (nnutils/ada_geometry.py) round-trips the
double canvas through HBM ~10x: each radix roll round is a sublane-misaligned
concat that XLA materializes, measured at ~30% of HBM bandwidth (the whole
pipe: 28 ms at 64x256x256). This kernel keeps one (image, channel) plane
resident in VMEM and does ALL rounds + the fractional blend + the slope
matmul (MXU) in one pass — HBM traffic drops to one read of the canvas and
one write of the output.

Layout per grid step (b, c): plane [Pp, W] (P = 2N - 2 live rows, padded to
a multiple of 8), tint/frac [W] per-column shift, M [out, Pp] the per-image
kernel matrix (zero in the padding columns, so junk pad rows are ignored by
the dot). The backward pass is the exact transpose — matmul^T, lerp^T, then
the INVERSE cyclic shift — implemented as a second kernel with the same
structure (custom_vjp; tint/frac/M carry no gradient: they derive from the
random augmentation draws, never from trainable parameters).

Replaces the role of the reference's `thirdparty/ada/upfirdn2d/grid_sample`
CUDA path (`thirdparty/ada/augment.py:283-299`) on TPU.
'''

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _roll_neg(x, s):
    '''Cyclic roll by -s along axis 0 (x[l] <- x[l + s]).'''
    return jnp.concatenate([x[s:], x[:s]], axis=0)


def _roll_pos(x, s):
    '''Cyclic roll by +s along axis 0 (x[l] <- x[l - s]).'''
    return jnp.concatenate([x[-s:], x[:-s]], axis=0)


def _shift_rounds(plane, t, P, direction):
    '''Apply per-column cyclic shift of `t` (int32 in [0, P)) rows to
    plane [P, W] via radix rounds; direction -1 reads forward (the warp's
    gather direction), +1 is the inverse permutation (transpose).'''
    bits = max(int(np.ceil(np.log2(P))), 1)
    roll = _roll_neg if direction < 0 else _roll_pos
    for k in range(bits):
        s = 1 << k
        if s >= P:
            break
        m = ((t >> k) & 1)[None, :] == 1
        plane = jnp.where(m, roll(plane, s), plane)
    return plane


def _fwd_kernel(tint_ref, frac_ref, m_ref, z_ref, out_ref, *, P):
    t = tint_ref[0, 0, :]
    f = frac_ref[0, 0, :][None, :].astype(jnp.float32)
    M = m_ref[0, :, :P].astype(jnp.float32)
    for c in range(z_ref.shape[1]):        # all channels per grid step
        plane = z_ref[0, c, :P, :].astype(jnp.float32)
        plane = _shift_rounds(plane, t, P, direction=-1)
        plane = plane * (1.0 - f) + _roll_neg(plane, 1) * f
        out_ref[0, c] = jnp.dot(
            M, plane, preferred_element_type=jnp.float32).astype(out_ref.dtype)


def _bwd_kernel(tint_ref, frac_ref, m_ref, g_ref, out_ref, *, P, Pp):
    M = m_ref[0, :, :P].astype(jnp.float32)                # [out, P]
    f = frac_ref[0, 0, :][None, :].astype(jnp.float32)
    t = tint_ref[0, 0, :]
    for c in range(g_ref.shape[1]):        # all channels per grid step
        g = g_ref[0, c].astype(jnp.float32)                # [out, W]
        d = jax.lax.dot_general(                           # M^T g: [P, W]
            M, g, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        d = d * (1.0 - f) + _roll_pos(d, 1) * f            # lerp transpose
        d = _shift_rounds(d, t, P, direction=+1)           # inverse shift
        if Pp > P:
            d = jnp.concatenate(
                [d, jnp.zeros((Pp - P, d.shape[1]), d.dtype)], axis=0)
        out_ref[0, c] = d.astype(out_ref.dtype)


def _pad_up(n, m):
    return ((n + m - 1) // m) * m


def _call(kernel, z2, tint, frac, M, out_len, interpret, P, Pp, extra={}):
    B, C, _, W = z2.shape
    return pl.pallas_call(
        functools.partial(kernel, P=P, **extra),
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, 1, W), lambda b: (b, 0, 0)),      # tint [B,1,W]
            pl.BlockSpec((1, 1, W), lambda b: (b, 0, 0)),      # frac [B,1,W]
            pl.BlockSpec((1, out_len, Pp), lambda b: (b, 0, 0)),
            pl.BlockSpec((1, C, z2.shape[2], W), lambda b: (b, 0, 0, 0)),
        ],
        out_specs=pl.BlockSpec(
            (1, C) + ((out_len, W) if kernel is _fwd_kernel else (Pp, W)),
            lambda b: (b, 0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct(
            (B, C) + ((out_len, W) if kernel is _fwd_kernel else (Pp, W)),
            z2.dtype),
        interpret=interpret,
    )(tint[:, None, :], frac[:, None, :], M, z2)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def linepass_fused(z2, tint, frac, M, P, out_len, interpret=False):
    '''Fused cyclic shift + frac blend + kernel matmul.

    z2:   [B, C, Pp, W]  double canvas, rows P..Pp-1 arbitrary (Pp % 8 == 0,
                         W % 128 == 0 — pad outside)
    tint: [B, W] int32   per-column shift, in [0, P)
    frac: [B, W] float   per-column fractional blend
    M:    [B, out_len, Pp] kernel matrix, columns P..Pp-1 MUST be zero
    Returns [B, C, out_len, W] in z2.dtype. Gradients flow to z2 only.
    '''
    Pp = z2.shape[2]
    return _call(_fwd_kernel, z2, tint, frac, M, out_len, interpret, P, Pp)


def _fused_fwd(z2, tint, frac, M, P, out_len, interpret):
    out = linepass_fused(z2, tint, frac, M, P, out_len, interpret)
    return out, (tint, frac, M)


def _fused_bwd(P, out_len, interpret, res, g):
    tint, frac, M = res
    Pp = M.shape[2]
    dz = _call(_bwd_kernel, g, tint, frac, M, out_len,
               interpret, P, Pp, extra={'Pp': Pp})
    return dz, None, jnp.zeros_like(frac), jnp.zeros_like(M)


linepass_fused.defvjp(_fused_fwd, _fused_bwd)


def available() -> bool:
    '''The fused kernel targets real TPUs (Mosaic); everywhere else the
    dense jnp formulation is used (or interpret=True in tests).'''
    try:
        return jax.default_backend() == 'tpu'
    except Exception:
        return False
