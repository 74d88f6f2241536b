'''Anchored phase packing: run narrow-channel convs wide on the MXU.

WHY: the MXU computes 128 output features per pass. StyleGAN2's high-res
stages are narrow (C=32 at 256px, C=64 at 128px — reference
`implementations/StyleGAN2/model.py:285-334,370-400`), so XLA's conv reaches
only 8-14% MXU utilization there (PERF_NOTES.md) — the single largest gap to
the roofline. Space-to-depth packing (2x2 phases -> 4C channels) widens the
contraction, but the NAIVE packed 3x3 kernel [3,3,4Ci,4Co] is 3/4 structural
zeros: a 4x FLOP tax that cancels the utilization win at C=64.

THE TRICK — anchored k=2 packing: a 3x3 conv's tap union over one output
2x2 phase group is exactly a 4x4 input window. Packing the INPUT on a grid
shifted by one pixel (pad top/left by 1) makes that 4x4 window exactly one
2x2 window of packed pixels, so the packed kernel is [2,2,4Ci,4Co] with
only 9/16 zeros-free density — a 16/9 FLOP tax instead of 4x:

    time(C=32, 256^2):  4.7 ms unpacked (8.4% MXU) -> ~1.3 ms packed
    time(C=64, 256^2): 11.4 ms unpacked (13.8%)    -> ~5.0 ms packed

All transforms are exact (pure reindexing of the same arithmetic):
`packed_conv3x3(pack2(x), W) == pack2(conv3x3(x, W))` to float tolerance,
pinned by tests/test_phase_pack.py. Gradients flow through the kernel
scatter (a static gather expression), so training is unchanged.

Layout convention: packed channel index = phase * C + c with
phase = 2 * py + px (phase-major), i.e. pack2(x)[n, Y, X, (2py+px)*C + c]
= x[n, 2Y+py, 2X+px, c].
'''

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp


def pack2(x):
    '''[N, H, W, C] -> [N, H/2, W/2, 4C] (phase-major channel order).'''
    N, H, W, C = x.shape
    assert H % 2 == 0 and W % 2 == 0
    x = x.reshape(N, H // 2, 2, W // 2, 2, C)
    x = jnp.transpose(x, (0, 1, 3, 2, 4, 5))       # [N, Y, X, py, px, C]
    return x.reshape(N, H // 2, W // 2, 4 * C)


def unpack2(z):
    '''Inverse of pack2.'''
    N, Y, X, C4 = z.shape
    C = C4 // 4
    z = z.reshape(N, Y, X, 2, 2, C)
    z = jnp.transpose(z, (0, 1, 3, 2, 4, 5))       # [N, Y, py, X, px, C]
    return z.reshape(N, 2 * Y, 2 * X, C)


def phase_mean(z):
    '''Mean over the 2x2 phases == avg_pool(2,2) of the unpacked tensor.'''
    N, Y, X, C4 = z.shape
    return jnp.mean(z.reshape(N, Y, X, 4, C4 // 4), axis=3)


def _shifted_pack(z):
    '''Standard-packed z -> anchor-shifted packed z' with one extra packed
    row/col: z'[n, Y, X, (2py+px)*C + c] = x[n, 2Y-1+py, 2X-1+px, c]
    (zeros outside — the 3x3 conv's SAME padding).'''
    N, Y, X, C4 = z.shape
    C = C4 // 4
    ph = z.reshape(N, Y, X, 2, 2, C)

    def shift_axis(a, axis_yx, phase_axis):
        # new phase 0 = old phase 1 shifted down/right by one packed step
        # (zero row enters at the start); new phase 1 = old phase 0 with a
        # zero row appended at the end.
        p0 = jnp.take(a, 1, axis=phase_axis)
        p1 = jnp.take(a, 0, axis=phase_axis)
        pad_lo = [(0, 0)] * p0.ndim
        pad_lo[axis_yx] = (1, 0)
        pad_hi = [(0, 0)] * p0.ndim
        pad_hi[axis_yx] = (0, 1)
        return jnp.stack([jnp.pad(p0, pad_lo), jnp.pad(p1, pad_hi)],
                         axis=phase_axis)

    ph = shift_axis(ph, 1, 3)                      # y axis / py phase
    ph = shift_axis(ph, 2, 4)                      # x axis / px phase
    return ph.reshape(N, Y + 1, X + 1, 4 * C)


def pack_kernel_3x3(W):
    '''[3, 3, Ci, Co] -> [2, 2, 4Ci, 4Co] anchored packed kernel.

    K2[ey, ex, p*Ci+ci, q*Co+co] = W[dy, dx, ci, co] with
    dy = 2 ey + py - qy, dx = 2 ex + px - qx (0 when out of [0, 3)).
    '''
    Ci, Co = W.shape[2], W.shape[3]
    zeros = jnp.zeros((Ci, Co), W.dtype)
    rows = []
    for ey in range(2):
        cols = []
        for ex in range(2):
            pin = []
            for py in range(2):
                for px in range(2):
                    qout = []
                    for qy in range(2):
                        for qx in range(2):
                            dy = 2 * ey + py - qy
                            dx = 2 * ex + px - qx
                            qout.append(W[dy, dx] if 0 <= dy < 3 and
                                        0 <= dx < 3 else zeros)
                    pin.append(jnp.concatenate(qout, axis=1))  # [Ci, 4Co]
            cols.append(jnp.concatenate(pin, axis=0))          # [4Ci, 4Co]
        rows.append(jnp.stack(cols))
    return jnp.stack(rows)                                     # [2,2,4Ci,4Co]


def packed_conv3x3(z, W, dtype=None):
    '''SAME 3x3 conv on the unpacked signal, computed on packed layout:
    packed_conv3x3(pack2(x), W) == pack2(conv_same_3x3(x, W)).

    z: [N, Y, X, 4Ci] standard-packed; W: [3, 3, Ci, Co] the UNPACKED
    kernel (equalized-lr scaling applied by the caller).
    '''
    dtype = dtype or z.dtype
    zs = _shifted_pack(z)                          # [N, Y+1, X+1, 4Ci]
    K2 = pack_kernel_3x3(W)                        # [2, 2, 4Ci, 4Co]
    return jax.lax.conv_general_dilated(
        zs.astype(dtype), K2.astype(dtype), (1, 1), 'VALID',
        dimension_numbers=('NHWC', 'HWIO', 'NHWC'))


def packed_conv1x1(z, W, dtype=None):
    '''1x1 conv on packed layout: block-diagonal over phases (cheap —
    1x1 convs are a negligible FLOP share).'''
    dtype = dtype or z.dtype
    Ci, Co = W.shape[-2], W.shape[-1]
    W = W.reshape(Ci, Co)
    K = jnp.zeros((4 * Ci, 4 * Co), W.dtype)
    for p in range(4):
        K = K.at[p * Ci:(p + 1) * Ci, p * Co:(p + 1) * Co].set(W)
    return jnp.einsum('nyxi,io->nyxo', z.astype(dtype), K.astype(dtype))
