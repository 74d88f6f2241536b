'''Pallas TPU kernels for the hot ops.

`None` entries make the registry fall back to the 'xla' formulation
(mirroring the reference's plugin-build fallback, upfirdn2d.py:156-158).
The 'xla' twins in upfirdn2d.py / bias_act.py / filtered_lrelu.py are the
numerical oracles for these kernels.

filtered_lrelu (reference filtered_lrelu.cu, a 1278-line CUDA mega-kernel)
is the one op where XLA's composition genuinely loses: the up-2x
intermediate (4x the tensor) makes ~5 HBM round trips. The kernel below
fuses bias -> up-FIR -> lrelu -> down-FIR in VMEM using a polyphase
decomposition — each parity phase of the 2x intermediate is a 6-tap FIR of
the *input-resolution* tensor at static offsets, so the 4x tensor is never
materialized and no strided memory ops are needed (Mosaic-friendly).

Scope: up=down=2 same-resolution layers (the bulk of StyleGAN3's synthesis),
separable filters, non-negative padding, C a multiple of 128. Narrower
channels hit the Mosaic lane-padding wall (measured 61 GB/s DMA for C=32
blocks vs 440 GB/s for C=128 — PERF_NOTES.md); out-of-scope calls fall back
to the XLA composition.

Status: numerically exact vs the XLA oracle (f32 1e-7, bf16 1.6e-2) but the
synchronous per-tile DMA serializes transfer and compute, so on v5e it runs
at ~0.5x the XLA composition. It therefore stays OFF by default ('xla' is
the registry default); switching to pltpu.emit_pipeline double-buffering is
the known path to the ~3x fused-bandwidth win. Kept because it is the
correct mega-kernel skeleton and the registry/test plumbing is identical
either way.
'''

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _phase_taps_up(g, pad):
    '''y[2i+P] = sum_r gP[r] * x[i + r + oP] for the zero-insert up-2 FIR
    y[m] = sum_t g[t] * up2pad(x)[m + t] with left pad `pad`.'''
    out = []
    for P in (0, 1):
        par = (pad - P) % 2
        taps = np.asarray(g)[par::2]
        oP = (P + par - pad) // 2
        out.append((tuple(float(v) for v in taps), int(oP)))
    return out


def _phase_taps_down(g):
    '''out[k] = sum_s g[s] z[2k+s] = sum_P sum_j gP[j] zP[k+j],
    zP[i] = z[2i+P].'''
    return [(tuple(float(v) for v in np.asarray(g)[P::2]), 0) for P in (0, 1)]


def _flrelu_kernel(x_hbm, b_ref, o_hbm, xs, outs, sem_in, sem_out, *,
                   TH, OW, CB, H_IN, W_IN, HALO, WH, up_h_taps, up_w_taps,
                   dn_h_taps, dn_w_taps, slope, gain, clamp, n_d):
    bidx = pl.program_id(0)
    t = pl.program_id(1)
    c = pl.program_id(2)
    k0 = t * TH
    c0 = c * CB
    cp = pltpu.make_async_copy(
        x_hbm.at[bidx, pl.ds(k0, TH + 2 * HALO), :, pl.ds(c0, CB)],
        xs, sem_in)
    cp.start()
    cp.wait()

    # bias on the interior only (padding stays zero: reference order is
    # bias_act THEN zero-padded upfirdn)
    bias = b_ref[0, :]
    slab_rows = TH + 2 * HALO
    slab_cols = xs.shape[1]
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (slab_rows, slab_cols), 0)
    col_ids = jax.lax.broadcasted_iota(jnp.int32, (slab_rows, slab_cols), 1)
    interior = ((row_ids + k0 >= HALO) & (row_ids + k0 < HALO + H_IN)
                & (col_ids >= WH) & (col_ids < WH + W_IN))
    xb = xs[:, :, :] + (jnp.where(interior, 1.0, 0.0)[:, :, None]
                        * bias).astype(xs.dtype)

    rows_y = TH + n_d
    cols_y = OW + n_d

    def up_h(phase):
        taps, off = phase
        acc = None
        for r, gval in enumerate(taps):
            sl = xb[HALO + off + r: HALO + off + r + rows_y, :, :]
            acc = sl * gval if acc is None else acc + sl * gval
        return acc

    def up_w(src, phase):
        taps, off = phase
        acc = None
        for r, gval in enumerate(taps):
            sl = src[:, WH + off + r: WH + off + r + cols_y, :]
            acc = sl * gval if acc is None else acc + sl * gval
        return acc

    def act(v):
        # max/min formulation: bf16 select/compare is unsupported on-target
        zero = jnp.zeros((), v.dtype)
        v = (jnp.maximum(v, zero) + jnp.minimum(v, zero) * v.dtype.type(slope)) \
            * v.dtype.type(gain)
        if clamp is not None:
            c = v.dtype.type(clamp)
            v = jnp.minimum(jnp.maximum(v, -c), c)
        return v

    yH = (up_h(up_h_taps[0]), up_h(up_h_taps[1]))

    wq = []
    for q in (0, 1):
        acc = None
        for p in (0, 1):
            y_pq = act(up_w(yH[p], up_w_taps[q]))      # [rows_y, cols_y, C]
            taps, off = dn_h_taps[p]
            for j, gval in enumerate(taps):
                sl = y_pq[off + j: off + j + TH, :, :]
                acc = sl * gval if acc is None else acc + sl * gval
        wq.append(acc)                                  # [TH, cols_y, C]

    acc = None
    for q in (0, 1):
        taps, off = dn_w_taps[q]
        for j, gval in enumerate(taps):
            sl = wq[q][:, off + j: off + j + OW, :]
            acc = sl * gval if acc is None else acc + sl * gval

    outs[:, :, :] = acc.astype(outs.dtype)
    cp_o = pltpu.make_async_copy(
        outs, o_hbm.at[bidx, pl.ds(k0, TH), :, pl.ds(c0, CB)], sem_out)
    cp_o.start()
    cp_o.wait()


def _flrelu_config(x, fu, fd, up, down, padding):
    '''Validate scope; returns the static kernel config or None.'''
    if up != 2 or down != 2 or fu is None or fd is None:
        return None
    fu = np.asarray(fu)
    fd = np.asarray(fd)
    if fu.ndim != 1 or fd.ndim != 1:
        return None
    px0, px1, py0, py1 = padding
    if min(px0, px1, py0, py1) < 0:
        return None
    N, H, W, C = x.shape
    if C % 128 != 0:
        return None
    Lu, Ld = len(fu), len(fd)
    out_h = (H * 2 + py0 + py1 - (Lu - 1) - (Ld - 1) + 1) // 2
    out_w = (W * 2 + px0 + px1 - (Lu - 1) - (Ld - 1) + 1) // 2
    TH = 8
    if out_h != H or out_h % TH != 0:      # same-res layers only
        return None
    return dict(out_h=out_h, out_w=out_w, TH=TH)


def filtered_lrelu_pallas(x, fu, fd, b, up, down, padding, gain, slope,
                          clamp, flip_filter):
    cfg = _flrelu_config(x, fu, fd, up, down, padding)
    if cfg is None:
        return None
    N, H, W, C = x.shape
    px0, px1, py0, py1 = padding
    out_h, out_w, TH = cfg['out_h'], cfg['out_w'], cfg['TH']

    gu = np.asarray(fu, np.float64)
    gd = np.asarray(fd, np.float64)
    if not flip_filter:
        gu = gu[::-1]
        gd = gd[::-1]
    # separable passes split the up-gain (up**2 total) as sqrt per axis
    gu = gu * up
    Ld = len(gd)
    n_d = (Ld + 1) // 2

    up_h_taps = _phase_taps_up(gu, py0)
    up_w_taps = _phase_taps_up(gu, px0)
    dn_h_taps = _phase_taps_down(gd)
    dn_w_taps = _phase_taps_down(gd)

    def reach(up_taps, dn_taps):
        lo = -min(off for _, off in up_taps)
        hi = max(off + len(t) for t, off in up_taps) + n_d
        return max(lo, 0), max(hi, 0)

    lo_h, hi_h = reach(up_h_taps, dn_h_taps)
    lo_w, hi_w = reach(up_w_taps, dn_w_taps)
    HALO = max(lo_h, hi_h, 8)
    WH = max(lo_w, hi_w, 8)
    # padded width multiple of 8 for the DMA's sublane tiling
    Wp = ((out_w + 2 * WH + 7) // 8) * 8
    wh_hi = Wp - out_w - WH

    xp = jnp.pad(x, ((0, 0), (HALO, HALO + TH), (WH, wh_hi), (0, 0)))
    b_arr = (jnp.zeros((C,), x.dtype) if b is None else
             jnp.asarray(b, x.dtype)).reshape(1, C)

    CB = 128
    kern = functools.partial(
        _flrelu_kernel, TH=TH, OW=out_w, CB=CB, H_IN=H, W_IN=W,
        HALO=HALO, WH=WH,
        up_h_taps=up_h_taps, up_w_taps=up_w_taps,
        dn_h_taps=dn_h_taps, dn_w_taps=dn_w_taps,
        slope=float(slope), gain=float(gain),
        clamp=None if clamp is None else float(clamp), n_d=n_d)

    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((N, out_h, out_w, C), x.dtype),
        interpret=jax.default_backend() != 'tpu',
        grid=(N, out_h // TH, C // CB),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec((1, CB), lambda b_, t, c: (0, c),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
        scratch_shapes=[
            pltpu.VMEM((TH + 2 * HALO, Wp, CB), x.dtype),
            pltpu.VMEM((TH, out_w, CB), x.dtype),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()),
        ],
    )(xp, b_arr)


def _bias_act_kernel(x_ref, b_ref, o_ref, *, act, alpha, gain, clamp):
    from animeface_tpu.ops.bias_act import activation_funcs
    v = x_ref[...].astype(jnp.float32) + b_ref[0, :].astype(jnp.float32)
    v = activation_funcs[act].func(v, alpha=alpha)
    if gain != 1:
        v = v * gain
    if clamp >= 0:
        v = jnp.clip(v, -clamp, clamp)
    o_ref[...] = v.astype(o_ref.dtype)


def bias_act_pallas(x, b, dim, act, alpha, gain, clamp):
    '''Standalone fused bias+act+gain+clamp (reference bias_act.cu).

    Under jit XLA already fuses this chain into the producer's epilogue, so
    the kernel only matters for standalone invocations. Scope: bias on the
    trailing axis with C % 128 == 0 and a 2D-collapsible batch; otherwise
    fall back to the XLA path.
    '''
    if b is None or dim not in (-1, x.ndim - 1):
        return None
    C = x.shape[-1]
    if C % 128 != 0 or b.shape[0] != C:
        return None
    M = int(np.prod(x.shape[:-1]))
    if M % 8 != 0:
        return None
    TM = 512 if M % 512 == 0 else (8 if M % 8 == 0 else None)
    if TM is None:
        return None
    x2 = x.reshape(M, C)
    out = pl.pallas_call(
        functools.partial(_bias_act_kernel, act=act, alpha=alpha,
                          gain=gain, clamp=clamp),
        out_shape=jax.ShapeDtypeStruct((M, C), x.dtype),
        interpret=jax.default_backend() != 'tpu',
        grid=(M // TM,),
        in_specs=[
            pl.BlockSpec((TM, C), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TM, C), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
    )(x2, jnp.asarray(b, x.dtype).reshape(1, C))
    return out.reshape(x.shape)


upfirdn2d_pallas = None
