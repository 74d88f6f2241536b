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

Execution: the grid covers (image, channel-block); an inner fori_loop walks
the row tiles with DOUBLE-BUFFERED async DMA — the next tile's HBM read and
the previous tile's write drain while the current tile computes — and every
FIR stage runs as an outer-dim banded matmul on the MXU (no misaligned
vector shuffles). This is the round-2 rebuild of the round-1 kernel (which
serialized DMA per tile and ran at 0.5x XLA).

Measured outcome (PERF_NOTES.md "filtered_lrelu kernel study"): parity with
the XLA composition at the largest StyleGAN3 layer (272^2x128: 10.5 ms both)
and 2-3x slower at the small latency-bound layers. The structural reason the
CUDA mega-kernel's win does not transfer: XLA already fuses bias/lrelu into
the up/down convs' epilogues, so the composition makes ~5 plane passes vs
the CUDA eager path's ~9 — while the fused kernel still pays a 2.6-4x halo
re-read for tiles that fit VMEM. The registry therefore keeps 'xla' as the
default; the kernel remains exact (oracle tests), opt-in, and the measured
evidence for that call.
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


def _band(out_len, in_len, taps, off):
    '''Static banded FIR matrix: M[o, o + off + t] = taps[t].'''
    M = np.zeros((out_len, in_len), np.float32)
    for o in range(out_len):
        for t, g in enumerate(taps):
            j = o + off + t
            if 0 <= j < in_len:
                M[o, j] = g
    return M


def _mm(M, v):
    '''Outer-dim contraction [O, J] x [J, S, C] -> [O, S, C] on the MXU —
    keeps the (sublane, lane) layout of v intact, so FIR taps never turn
    into misaligned sublane shuffles.'''
    return jax.lax.dot_general(
        M, v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(v.dtype)


def _flrelu_tile(xs_slab, bias, bands, k0, *, TH, OW, H_IN, W_IN, HALO, WH,
                 slope, gain, clamp, n_d):
    '''Compute one output row tile [TH, OW, CB] from a halo'd input slab
    [TH + 2 HALO, Wp, CB] (k0 = first output row of the tile).

    Every FIR stage is an outer-dim banded matmul (static band matrices),
    with one tile transpose per direction change — all MXU + elementwise,
    no data-dependent or misaligned vector shuffles.
    '''
    dt = xs_slab.dtype
    # bias on the interior only (padding stays zero: reference order is
    # bias_act THEN zero-padded upfirdn)
    slab_rows = TH + 2 * HALO
    slab_cols = xs_slab.shape[1]
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (slab_rows, slab_cols), 0)
    col_ids = jax.lax.broadcasted_iota(jnp.int32, (slab_rows, slab_cols), 1)
    interior = ((row_ids + k0 >= HALO) & (row_ids + k0 < HALO + H_IN)
                & (col_ids >= WH) & (col_ids < WH + W_IN))
    xb = xs_slab + (jnp.where(interior, 1.0, 0.0)[:, :, None]
                    * bias).astype(dt)

    rows_y = TH + n_d
    cols_y = OW + n_d

    def act(v):
        # max/min formulation: bf16 select/compare is unsupported on-target
        zero = jnp.zeros((), v.dtype)
        v = (jnp.maximum(v, zero) + jnp.minimum(v, zero) * v.dtype.type(slope)) \
            * v.dtype.type(gain)
        if clamp is not None:
            c = v.dtype.type(clamp)
            v = jnp.minimum(jnp.maximum(v, -c), c)
        return v

    Bh, Bw, Dw, Dh = bands                             # each [2, ...]
    out = None
    for p in (0, 1):
        yH = _mm(Bh[p], xb)                            # [rows_y, Wp, C]
        yHt = jnp.transpose(yH, (1, 0, 2))             # [Wp, rows_y, C]
        accp = None
        for q in (0, 1):
            y = act(_mm(Bw[q], yHt))                   # [cols_y, rows_y, C]
            d = _mm(Dw[q], y)                          # [OW, rows_y, C]
            accp = d if accp is None else accp + d
        vt = jnp.transpose(accp, (1, 0, 2))            # [rows_y, OW, C]
        o = _mm(Dh[p], vt)                             # [TH, OW, C]
        out = o if out is None else out + o
    return out


def _flrelu_kernel(x_hbm, b_ref, bh_ref, bw_ref, dw_ref, dh_ref, o_hbm,
                   xs, outs, sem_in, sem_out, *,
                   NT, TH, OW, CB, H_IN, W_IN, HALO, WH, slope, gain, clamp,
                   n_d):
    '''Double-buffered row-tile pipeline per (image, channel-block): tile
    t+1's read and tile t-1's write are in flight while tile t computes.'''
    bidx = pl.program_id(0)
    c0 = pl.program_id(1) * CB
    bias = b_ref[0, :]

    def in_dma(slot, t):
        return pltpu.make_async_copy(
            x_hbm.at[bidx, pl.ds(t * TH, TH + 2 * HALO), :, pl.ds(c0, CB)],
            xs.at[slot], sem_in.at[slot])

    def out_dma(slot, t):
        return pltpu.make_async_copy(
            outs.at[slot], o_hbm.at[bidx, pl.ds(t * TH, TH), :,
                                    pl.ds(c0, CB)], sem_out.at[slot])

    in_dma(0, 0).start()

    def body(t, _):
        slot = t % 2

        @pl.when(t + 1 < NT)
        def _():
            in_dma((t + 1) % 2, t + 1).start()

        in_dma(slot, t).wait()
        bands = (bh_ref, bw_ref, dw_ref, dh_ref)
        acc = _flrelu_tile(
            xs[slot], bias, bands, t * TH, TH=TH, OW=OW, H_IN=H_IN,
            W_IN=W_IN, HALO=HALO, WH=WH, slope=slope, gain=gain,
            clamp=clamp, n_d=n_d)

        @pl.when(t >= 2)
        def _():
            out_dma(slot, t - 2).wait()        # this out buffer is free again

        outs[slot] = acc.astype(outs.dtype)
        out_dma(slot, t).start()
        return 0

    jax.lax.fori_loop(0, NT, body, 0)

    # drain the last one or two writes
    @pl.when(NT >= 2)
    def _():
        out_dma((NT - 2) % 2, NT - 2).wait()
    out_dma((NT - 1) % 2, NT - 1).wait()


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
    if out_h != H or out_h % 8 != 0:        # same-res layers only
        return None
    return dict(out_h=out_h, out_w=out_w)


def filtered_lrelu_pallas(x, fu, fd, b, up, down, padding, gain, slope,
                          clamp, flip_filter):
    cfg = _flrelu_config(x, fu, fd, up, down, padding)
    if cfg is None:
        return None
    N, H, W, C = x.shape
    px0, px1, py0, py1 = padding
    out_h, out_w = cfg['out_h'], cfg['out_w']

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

    # largest row tile that divides out_h AND keeps the double-buffered
    # scratch (2 halo'd slabs + 2 out tiles + intermediates) within VMEM
    CBv = 128
    isz = x.dtype.itemsize
    TH = None
    for cand in (64, 32, 16, 8):
        # 2 halo slabs + 2 out tiles + ~5 live compute intermediates
        vmem = (3 * (cand + 2 * HALO) * Wp + 2 * cand * out_w
                + 5 * (cand + 2 * HALO) * (out_w + 2 * HALO)) * CBv * isz
        if out_h % cand == 0 and vmem < 10 * 2 ** 20:
            TH = cand
            break
    if TH is None:
        return None

    xp = jnp.pad(x, ((0, 0), (HALO, HALO + TH), (WH, wh_hi), (0, 0)))
    b_arr = (jnp.zeros((C,), x.dtype) if b is None else
             jnp.asarray(b, x.dtype)).reshape(1, C)

    CB = 128
    NT = out_h // TH
    rows_y = TH + n_d
    cols_y = out_w + n_d
    slab_rows = TH + 2 * HALO

    # banded FIR matrices (static per call; passed as VMEM inputs)
    Bh = np.stack([_band(rows_y, slab_rows, t, HALO + o)
                   for t, o in up_h_taps])
    Bw = np.stack([_band(cols_y, Wp, t, WH + o) for t, o in up_w_taps])
    Dw = np.stack([_band(out_w, cols_y, t, o) for t, o in dn_w_taps])
    Dh = np.stack([_band(TH, rows_y, t, o) for t, o in dn_h_taps])

    kern = functools.partial(
        _flrelu_kernel, NT=NT, TH=TH, OW=out_w, CB=CB, H_IN=H, W_IN=W,
        HALO=HALO, WH=WH,
        slope=float(slope), gain=float(gain),
        clamp=None if clamp is None else float(clamp), n_d=n_d)

    full_vmem = pl.BlockSpec(memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((N, out_h, out_w, C), x.dtype),
        interpret=jax.default_backend() != 'tpu',
        grid=(N, C // CB),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec((1, CB), lambda b_, c: (0, c),
                         memory_space=pltpu.VMEM),
            full_vmem, full_vmem, full_vmem, full_vmem,
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
        scratch_shapes=[
            pltpu.VMEM((2, TH + 2 * HALO, Wp, CB), x.dtype),
            pltpu.VMEM((2, TH, out_w, CB), x.dtype),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )(xp, b_arr, jnp.asarray(Bh, x.dtype), jnp.asarray(Bw, x.dtype),
      jnp.asarray(Dw, x.dtype), jnp.asarray(Dh, x.dtype))


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
