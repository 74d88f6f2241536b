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


# ---------------------------------------------------------------------------
# fully-fused two-pass kernel: BOTH line passes per image in one grid step
# ---------------------------------------------------------------------------
# The single-pass kernel above still leaves glue in XLA between the passes:
# the y1 intermediate round-trips HBM, gets transposed, cyclic-doubled and
# padded (4+ full-canvas materializations per warp). This kernel keeps the
# whole warp VMEM-resident per (image): stage 1 (sublane rolls masked per
# lane, frac blend, M1 matmul), then stage 2 re-expressed so its line axis
# ALSO lands on sublanes — the mirror doubling of y1 is one dot_general with
# a constant duplication matrix D2 [P2p, We] (D2 @ y1^T built directly by
# contracting y1's lane axis), so no in-kernel transpose/flip primitive is
# needed. Output is [out_x, rows] per channel (the caller's final NHWC
# transpose absorbs it). HBM traffic per warp: one read of x_ext, one read
# of the streamed M1/M2, one write of the output.
#
# Backward is the exact transpose chain (M^T matmuls, inverse blends,
# inverse shifts, D^T undoubling) in a mirrored kernel; tint/frac/M carry no
# gradients (they derive from the augmentation draws).


def _doubling_matrix(n, rows):
    '''[rows, n] constant: z2 = D @ z is one period [z, reverse(z[1:-1])]
    of the pixel-center mirror extension (period 2n - 2), zero-padded to
    `rows`.'''
    P = 2 * n - 2
    D = np.zeros((rows, n), np.float32)
    D[np.arange(n), np.arange(n)] = 1.0
    for m in range(1, n - 1):
        D[n - 1 + m, n - 1 - m] = 1.0
    assert rows >= P
    return D


def _fwd2_kernel(t1_ref, f1_ref, m1_ref, t2_ref, f2_ref, m2_ref,
                 d1_ref, d2_ref, x_ref, out_ref, *, P1, P2, We):
    t1 = t1_ref[0, 0, :]
    f1 = f1_ref[0, 0, :][None, :].astype(jnp.float32)
    t2 = t2_ref[0, 0, :]
    f2 = f2_ref[0, 0, :][None, :].astype(jnp.float32)
    M1 = m1_ref[0, :, :P1].astype(jnp.float32)            # [N, P1]
    M2 = m2_ref[0, :, :P2].astype(jnp.float32)            # [out, P2]
    D1 = d1_ref[:, :].astype(jnp.float32)                 # [P1p, N]
    D2 = d2_ref[:, :].astype(jnp.float32)                 # [P2p, We]
    for c in range(x_ref.shape[1]):
        xc = x_ref[0, c].astype(jnp.float32)              # [N, Wep]
        # ---- pass 1: line axis = sublanes, shifts masked per lane ----
        z2 = jax.lax.dot_general(                         # mirror double
            D1, xc, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)[:P1]      # [P1, Wep]
        z2 = _shift_rounds(z2, t1, P1, direction=-1)
        z2 = z2 * (1.0 - f1) + _roll_neg(z2, 1) * f1
        y1 = jnp.dot(M1, z2, preferred_element_type=jnp.float32)[:, :We]
        # ---- pass 2: double y1's LANE axis onto sublanes (D2 contracts
        # the lane axis, so the transpose is free), same roll machinery ----
        z2b = jax.lax.dot_general(
            D2, y1, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)[:P2]      # [P2, N]
        z2b = _shift_rounds(z2b, t2, P2, direction=-1)
        z2b = z2b * (1.0 - f2) + _roll_neg(z2b, 1) * f2
        out_ref[0, c] = jnp.dot(
            M2, z2b, preferred_element_type=jnp.float32).astype(out_ref.dtype)


def _bwd2_kernel(t1_ref, f1_ref, m1_ref, t2_ref, f2_ref, m2_ref,
                 d1_ref, d2_ref, g_ref, out_ref, *, P1, P2, We):
    t1 = t1_ref[0, 0, :]
    f1 = f1_ref[0, 0, :][None, :].astype(jnp.float32)
    t2 = t2_ref[0, 0, :]
    f2 = f2_ref[0, 0, :][None, :].astype(jnp.float32)
    M1 = m1_ref[0, :, :P1].astype(jnp.float32)
    M2 = m2_ref[0, :, :P2].astype(jnp.float32)
    D1 = d1_ref[:, :].astype(jnp.float32)                 # [P1p, N]
    D2 = d2_ref[:, :].astype(jnp.float32)                 # [P2p, We]
    P1p = D1.shape[0]
    P2p = D2.shape[0]
    Wep = out_ref.shape[3]
    for c in range(g_ref.shape[1]):
        g = g_ref[0, c].astype(jnp.float32)               # [out, N]
        # ---- pass 2 transpose ----
        d = jax.lax.dot_general(                          # M2^T g: [P2, N]
            M2, g, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        d = d * (1.0 - f2) + _roll_pos(d, 1) * f2
        d = _shift_rounds(d, t2, P2, direction=+1)
        if P2p > P2:
            d = jnp.concatenate(
                [d, jnp.zeros((P2p - P2, d.shape[1]), d.dtype)], axis=0)
        dy1 = jax.lax.dot_general(                        # D2^T: [N, We]
            d, D2, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        if Wep > We:
            dy1 = jnp.concatenate(
                [dy1, jnp.zeros((dy1.shape[0], Wep - We), dy1.dtype)], axis=1)
        # ---- pass 1 transpose ----
        dz2 = jax.lax.dot_general(                        # M1^T: [P1, Wep]
            M1, dy1, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        dz2 = dz2 * (1.0 - f1) + _roll_pos(dz2, 1) * f1
        dz2 = _shift_rounds(dz2, t1, P1, direction=+1)
        if P1p > P1:
            dz2 = jnp.concatenate(
                [dz2, jnp.zeros((P1p - P1, dz2.shape[1]), dz2.dtype)], axis=0)
        out_ref[0, c] = jax.lax.dot_general(              # D1^T: [N, Wep]
            D1, dz2, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(out_ref.dtype)


def _call2(kernel, x, t1, f1, M1, t2, f2, M2, D1, D2, out_shape,
           interpret, P1, P2, We):
    B, C = x.shape[:2]
    Wx = x.shape[3]
    specs = [
        pl.BlockSpec((1, 1, t1.shape[1]), lambda b: (b, 0, 0)),
        pl.BlockSpec((1, 1, f1.shape[1]), lambda b: (b, 0, 0)),
        pl.BlockSpec((1,) + M1.shape[1:], lambda b: (b, 0, 0)),
        pl.BlockSpec((1, 1, t2.shape[1]), lambda b: (b, 0, 0)),
        pl.BlockSpec((1, 1, f2.shape[1]), lambda b: (b, 0, 0)),
        pl.BlockSpec((1,) + M2.shape[1:], lambda b: (b, 0, 0)),
        pl.BlockSpec(D1.shape, lambda b: (0, 0)),          # shared constants
        pl.BlockSpec(D2.shape, lambda b: (0, 0)),
        pl.BlockSpec((1, C, x.shape[2], Wx), lambda b: (b, 0, 0, 0)),
    ]
    return pl.pallas_call(
        functools.partial(kernel, P1=P1, P2=P2, We=We),
        grid=(B,),
        in_specs=specs,
        out_specs=pl.BlockSpec((1,) + out_shape[1:],
                               lambda b: (b, 0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct(out_shape, x.dtype),
        interpret=interpret,
    )(t1[:, None, :], f1[:, None, :], M1, t2[:, None, :], f2[:, None, :],
      M2, D1, D2, x)


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8, 9, 10, 11))
def twopass_fused(x, t1, f1, M1, t2, f2, M2, P1, P2, We, out_len,
                  interpret=False):
    '''Both warp passes in one kernel per image.

    x:  [B, C, N, Wep]  extended canvas (N %8 == 0; live lanes = We,
                        zero/garbage beyond — M2's zero pad ignores them)
    t1/f1: [B, Wep]     pass-1 per-lane integer shift (mod P1) / frac blend
    M1: [B, N, P1p]     pass-1 kernel matrix, zero in columns >= P1
    t2/f2: [B, N]       pass-2 per-row shift (mod P2) / frac blend
    M2: [B, out_len, P2p]  pass-2 kernel matrix, zero in columns >= P2
    Returns [B, C, out_len, N] — output TRANSPOSED (x-axis on sublanes);
    the caller's final NHWC transpose absorbs it. Gradients flow to x only.
    '''
    B, C, N, Wep = x.shape
    D1 = jnp.asarray(_doubling_matrix(N, M1.shape[2]))
    D2 = jnp.asarray(_doubling_matrix(We, M2.shape[2])[:, :We])
    return _call2(_fwd2_kernel, x, t1, f1, M1, t2, f2, M2, D1, D2,
                  (B, C, out_len, N), interpret, P1, P2, We)


def _fused2_fwd(x, t1, f1, M1, t2, f2, M2, P1, P2, We, out_len, interpret):
    out = twopass_fused(x, t1, f1, M1, t2, f2, M2, P1, P2, We, out_len,
                        interpret)
    return out, (t1, f1, M1, t2, f2, M2)


def _fused2_bwd(P1, P2, We, out_len, interpret, res, g):
    t1, f1, M1, t2, f2, M2 = res
    B, C = g.shape[:2]
    N = g.shape[3]
    Wep = t1.shape[1]
    D1 = jnp.asarray(_doubling_matrix(N, M1.shape[2]))
    D2 = jnp.asarray(_doubling_matrix(We, M2.shape[2])[:, :We])
    dx = _call2(_bwd2_kernel, g, t1, f1, M1, t2, f2, M2, D1, D2,
                (B, C, N, Wep), interpret, P1, P2, We)
    return (dx, None, jnp.zeros_like(f1), jnp.zeros_like(M1),
            None, jnp.zeros_like(f2), jnp.zeros_like(M2))


twopass_fused.defvjp(_fused2_fwd, _fused2_bwd)
