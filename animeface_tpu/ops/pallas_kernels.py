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
import os

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

#: filtered_lrelu kernel variant:
#:   'gather' (round 4, default among the pallas variants) grid-pipelined
#:            overlap-gather: the halo'd input slab arrives as TWO shifted
#:            BlockSpec views of the same padded array (blocks i and i+1),
#:            so Mosaic's AUTOMATIC pipeline double-buffers the DMA; W-axis
#:            FIR matmuls are BLOCKED per 64-column chunk (~4x less
#:            band-zero FLOPs), and `vmem_limit_bytes` lifts the 16M
#:            scoped-VMEM ceiling. MEASURED (B=16, bf16, 12-tap): beats the
#:            'matmul' variant at every in-scope layer and covers 272^2
#:            (144^2x128: 8.9 vs 9.9; 88^2x256: 7.2 vs 9.0; 64^2x512: 7.0
#:            vs 6.8; 272^2x128: 31.5 where matmul's planner bails) but
#:            STILL LOSES to the XLA composition (11.4/3.7/3.4/4.1 ms) —
#:            the fourth and terminal refutation of this kernel class: at
#:            ~2-3 us fixed cost per small banded matmul, even the minimal
#:            ~14-op tile dataflow cannot beat XLA's fused depthwise-conv
#:            pipeline at these shapes (PERF_NOTES.md round-4 study).
#:   'matmul' the round-2 banded-MXU formulation — full-width band
#:            matrices waste ~97% of MXU FLOPs on structural zeros, but
#:            3% of the MXU's 197 TF/s still beats the VPU (measured;
#:            PERF_NOTES.md "filtered_lrelu kernel study").
#:   'shift'  round-3 experiment: FIR stages as outer-dim static-slice
#:            shift-adds on the VPU, 2D overlapped tiles. Exact, and the
#:            tiling lifts the matmul variant's divisibility limits, but
#:            MEASURED SLOWER (64^2x512: 12.2 ms vs 6.9 matmul / 3.5 XLA;
#:            272^2x128: 48.9 vs 11.3 XLA): ~30 multiply-adds per element
#:            on the VPU lose to the MXU even with the 45x zero-padding
#:            tax, and both variants carry a ~30-50 us per-tile pipeline
#:            overhead. Kept as the measured record + scope template.
_FLRELU_VARIANT = os.environ.get('ANIMEFACE_FLRELU_KERNEL', 'gather')


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


def _fir_outer(v, taps, start, out_len):
    '''FIR along dim 0 via static leading-dim slices (layout-preserving):
    out[o] = sum_t taps[t] * v[o + start + t]. Accumulates in v's dtype —
    f32 accumulation was measured to push the compiler-materialized VMEM
    stack past the 16M limit (3.3x the live-set estimate); the bf16 FIR
    cascade stays within the ops' documented bf16 tolerance (~1.6e-2).'''
    acc = None
    for i, g in enumerate(taps):
        sl = jax.lax.slice_in_dim(v, start + i, start + i + out_len, axis=0)
        term = sl * v.dtype.type(g)
        acc = term if acc is None else acc + term
    return acc


def _flrelu_tile_shift(xs_slab, bias, k0, w0, scratch, out_ref, *, TH, TW,
                       H_IN, W_IN, HALO, WH, slope, gain, clamp, n_d,
                       up_h_taps, up_w_taps, dn_h_taps, dn_w_taps):
    '''Shift-add twin of `_flrelu_tile`: identical polyphase structure, but
    every FIR stage is a static outer-dim slice-multiply-accumulate (VPU)
    instead of a banded matmul (MXU) — same one-transpose-per-direction-
    change dance, ~30 real multiply-adds per element instead of ~W zero-
    padded MXU lanes per tap. Tiles are 2D: [TH, TW] output rows x cols
    (k0/w0 = tile origin in output coords), so big layers fit VMEM with
    small halo amplification.

    Every stage STORES into an explicit VMEM scratch buffer (`scratch`)
    reused across the four (p, q) phases — leaving the whole unrolled
    dataflow to Mosaic's stack allocator was measured to blow the 16M
    scoped-vmem limit at ~5x the live-set estimate.'''
    dt = out_ref.dtype
    xb_s, yh_s, yt_s, y_s, accp_s, vt_s = scratch
    slab_rows = xs_slab.shape[0]
    slab_cols = xs_slab.shape[1]
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (slab_rows, slab_cols), 0)
    col_ids = jax.lax.broadcasted_iota(jnp.int32, (slab_rows, slab_cols), 1)
    interior = ((row_ids + k0 >= HALO) & (row_ids + k0 < HALO + H_IN)
                & (col_ids + w0 >= WH) & (col_ids + w0 < WH + W_IN))
    xb_s[...] = xs_slab + (jnp.where(interior, 1.0, 0.0)[:, :, None]
                           * bias).astype(dt)

    def act(v):
        # max/min form: bf16 compare/select is unsupported on-target
        zero = jnp.zeros((), v.dtype)
        v = (jnp.maximum(v, zero) + jnp.minimum(v, zero) * v.dtype.type(slope)) \
            * v.dtype.type(gain)
        if clamp is not None:
            c = v.dtype.type(clamp)
            v = jnp.minimum(jnp.maximum(v, -c), c)
        return v

    rows_y = TH + n_d
    cols_y = TW + n_d
    for p in (0, 1):
        tp, op_ = up_h_taps[p]
        yh_s[...] = _fir_outer(xb_s[...], tp, HALO + op_, rows_y)
        yt_s[...] = jnp.transpose(yh_s[...], (1, 0, 2))   # [SW, rows_y, C]
        for q in (0, 1):
            tq, oq_ = up_w_taps[q]
            y_s[...] = act(_fir_outer(yt_s[...], tq, WH + oq_, cols_y))
            d = _fir_outer(y_s[...], dn_w_taps[q][0], 0, TW)
            if q == 0:
                accp_s[...] = d
            else:
                accp_s[...] = accp_s[...] + d             # [TW, rows_y, C]
        vt_s[...] = jnp.transpose(accp_s[...], (1, 0, 2))
        o = _fir_outer(vt_s[...], dn_h_taps[p][0], 0, TH)
        if p == 0:
            out_ref[...] = o.astype(dt)
        else:
            out_ref[...] = out_ref[...] + o.astype(dt)


def _flrelu_kernel_shift(x_hbm, b_ref, o_hbm, xs, outs, xb_s, yh_s, yt_s,
                         y_s, accp_s, vt_s, sem_in, sem_out, *,
                         NT, NWT, TH, TW, SLAB_W, CB, H_IN, W_IN, HALO, WH,
                         OUT_H, slope, gain, clamp, n_d,
                         up_h_taps, up_w_taps, dn_h_taps, dn_w_taps):
    '''Double-buffered 2D-tile pipeline per (image, channel-block): tile
    t+1's read and tile t-1's write are in flight while tile t computes.
    Edge tiles OVERLAP their predecessor when TH/TW do not divide the
    output (identical recomputed values, so the double write is benign) —
    this frees tile sizes from divisibility constraints that forced tiny
    tiles (and 2.6-4x halo re-reads) on sizes like 272.'''
    bidx = pl.program_id(0)
    c0 = pl.program_id(1) * CB
    bias = b_ref[0, :]

    def origin(t):
        # H start may overlap (outer-dim DMA starts are unconstrained);
        # W starts must stay AFFINE in the loop index — Mosaic cannot prove
        # a min() is a multiple of the sublane tile, so the driver pads the
        # output width to NWT*TW instead of overlapping the last W tile.
        # Keep the H start affine too when TH divides OUT_H.
        ti = t // NWT
        wi = t % NWT
        k0 = ti * TH
        if OUT_H % TH:
            k0 = jnp.minimum(k0, OUT_H - TH)
        return k0, wi * TW

    def in_dma(slot, t):
        k0, w0 = origin(t)
        return pltpu.make_async_copy(
            x_hbm.at[bidx, pl.ds(k0, TH + 2 * HALO), pl.ds(w0, SLAB_W),
                     pl.ds(c0, CB)],
            xs.at[slot], sem_in.at[slot])

    def out_dma(slot, t):
        k0, w0 = origin(t)
        return pltpu.make_async_copy(
            outs.at[slot], o_hbm.at[bidx, pl.ds(k0, TH), pl.ds(w0, TW),
                                    pl.ds(c0, CB)], sem_out.at[slot])

    in_dma(0, 0).start()
    NTT = NT * NWT

    def body(t, _):
        slot = t % 2

        @pl.when(t + 1 < NTT)
        def _():
            in_dma((t + 1) % 2, t + 1).start()

        in_dma(slot, t).wait()

        @pl.when(t >= 2)
        def _():
            out_dma(slot, t - 2).wait()   # this out buffer is free again

        k0, w0 = origin(t)
        _flrelu_tile_shift(
            xs[slot], bias, k0, w0,
            (xb_s, yh_s, yt_s, y_s, accp_s, vt_s), outs.at[slot],
            TH=TH, TW=TW, H_IN=H_IN,
            W_IN=W_IN, HALO=HALO, WH=WH, slope=slope, gain=gain,
            clamp=clamp, n_d=n_d, up_h_taps=up_h_taps, up_w_taps=up_w_taps,
            dn_h_taps=dn_h_taps, dn_w_taps=dn_w_taps)

        out_dma(slot, t).start()
        return 0

    jax.lax.fori_loop(0, NTT, body, 0)

    @pl.when(NTT >= 2)
    def _():
        out_dma((NTT - 2) % 2, NTT - 2).wait()
    out_dma((NTT - 1) % 2, NTT - 1).wait()


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
                          clamp, flip_filter, variant=None):
    variant = variant or _FLRELU_VARIANT
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

    if variant == 'shift':
        return _flrelu_pallas_shift(
            x, b, up_h_taps, up_w_taps, dn_h_taps, dn_w_taps,
            HALO=HALO, WH=WH, out_h=out_h, out_w=out_w,
            gain=gain, slope=slope, clamp=clamp, n_d=n_d)
    if variant == 'gather':
        out = _flrelu_pallas_gather(
            x, b, up_h_taps, up_w_taps, dn_h_taps, dn_w_taps,
            HALO=HALO, WH=WH, out_h=out_h, out_w=out_w, Wp=Wp,
            wh_hi=wh_hi, gain=gain, slope=slope, clamp=clamp, n_d=n_d)
        if out is not None:
            return out
        # no feasible tile plan (e.g. out_h has no divisor >= 2*HALO):
        # fall through to the matmul variant's planner

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


# ---------------------------------------------------------------------------
# 'gather' variant (round 4): automatic-pipeline overlap-gather + blocked
# W-band matmuls.
#
# Why this design (the round-2/3 post-mortems, PERF_NOTES.md):
#   * both manual-DMA variants (matmul, shift) carried a measured 30-50 us
#     per-tile pipeline overhead that alone exceeded the XLA composition at
#     realistic tile counts, while a plain BLOCKED copy kernel (automatic
#     BlockSpec pipelining) ran at 440 GB/s — so let Mosaic build the
#     pipeline and express the halo as TWO SHIFTED BLOCK VIEWS of one padded
#     array (blocks i and i+1 concatenated in VMEM cover rows
#     [i*TH, i*TH + TH + 2*HALO) whenever TH >= 2*HALO). Each row is
#     fetched exactly twice; input traffic 2x + output 1x is still ~6x less
#     than the XLA composition's ~18 plane passes.
#   * the full-width W-axis band matmuls wasted ~48x MXU FLOPs on band
#     zeros (the H-axis ones, operating on short halo'd slabs, only ~5x).
#     Here the W stages are BLOCKED: each down-chunk of CO output columns
#     contracts only its ~CO+2*taps input window, nested so the up-FIR
#     window is recomputed per chunk (~15% overlap) and the full 2x-width
#     intermediate never exists even in VMEM.
#   * `vmem_limit_bytes` raises Mosaic's default 16M scoped-VMEM ceiling
#     (v5e has 128M physical) that forced the earlier designs into tiny
#     tiles.
# ---------------------------------------------------------------------------

#: scoped-VMEM request for the gather variant (bytes); the tile planner
#: budgets its live-set estimate at ~40% of this (compiler-materialized
#: temporaries measured ~2-3x the hand estimate in earlier variants).
_GATHER_VMEM = int(os.environ.get('ANIMEFACE_FLRELU_GATHER_VMEM',
                                  str(96 * 2 ** 20)))


def _gather_plan(out_h, out_w, Wp, HALO, n_d, CO, CID, CIU, isz):
    '''Largest TH dividing out_h with TH >= 2*HALO whose VMEM live-set
    estimate fits the budget. Returns TH or None.'''
    budget = int(_GATHER_VMEM * 0.4)
    CB = 128
    NCD = -(-out_w // CO)
    for TH in range(min(out_h, 256), 2 * HALO - 1, -1):
        if out_h % TH:
            continue
        slab_rows = TH + 2 * HALO
        rows_y = TH + n_d
        est = (4 * TH * Wp              # 2 input views x 2 pipeline slots
               + 2 * TH * out_w         # out block x 2 slots
               + 2 * slab_rows * Wp     # slab concat + biased copy
               + 2 * rows_y * Wp        # yH + yH^T
               + NCD * CO * rows_y      # down-chunk concat
               + rows_y * out_w         # vt
               + 2 * TH * out_w         # per-phase out + accumulator
               + (CIU + CID + CO) * rows_y   # chunk temporaries
               ) * CB * isz
        if est <= budget:
            return TH
    return None


def _flrelu_kernel_gather(a_ref, b_ref, bias_ref, bh_ref, bw_ref, dw_ref,
                          dh_ref, o_ref, *, TH, HALO, WH, H_IN, W_IN, Wp,
                          out_w, CO, NCD, CID, CIU, su, sd, rows_y,
                          slope, gain, clamp, n_d):
    '''One output row-band [TH, out_w, CB] per grid step; all FIR stages as
    banded matmuls on the MXU, W stages blocked per down-chunk.'''
    i = pl.program_id(2)
    dt = o_ref.dtype
    slab = jnp.concatenate([a_ref[0], b_ref[0]], axis=0)[:TH + 2 * HALO]
    slab_rows = TH + 2 * HALO

    k0 = i * TH
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (slab_rows, Wp), 0)
    col_ids = jax.lax.broadcasted_iota(jnp.int32, (slab_rows, Wp), 1)
    interior = ((row_ids + k0 >= HALO) & (row_ids + k0 < HALO + H_IN)
                & (col_ids >= WH) & (col_ids < WH + W_IN))
    xb = slab + (jnp.where(interior, 1.0, 0.0)[:, :, None]
                 * bias_ref[0, :]).astype(dt)

    def act(v):
        # max/min form: bf16 compare/select is unsupported on-target
        zero = jnp.zeros((), v.dtype)
        v = (jnp.maximum(v, zero) + jnp.minimum(v, zero) * v.dtype.type(slope)) \
            * v.dtype.type(gain)
        if clamp is not None:
            c = v.dtype.type(clamp)
            v = jnp.minimum(jnp.maximum(v, -c), c)
        return v

    out = None
    for p in (0, 1):
        yH = _mm(bh_ref[p], xb)                     # [rows_y, Wp, CB]
        yHt = jnp.transpose(yH, (1, 0, 2))          # [Wp, rows_y, CB]
        chunks = []
        for c in range(NCD):
            acc_c = None
            for q in (0, 1):
                seg = jax.lax.slice_in_dim(yHt, su[q][c], su[q][c] + CIU,
                                           axis=0)
                ywin = act(_mm(bw_ref[q, c], seg))  # [CID, rows_y, CB]
                d = _mm(dw_ref[q, c], ywin)         # [CO, rows_y, CB]
                acc_c = d if acc_c is None else acc_c + d
            chunks.append(acc_c)
        accp = chunks[0] if NCD == 1 else jnp.concatenate(chunks, axis=0)
        vt = jnp.transpose(accp, (1, 0, 2))         # [rows_y, NCD*CO, CB]
        if NCD * CO != out_w:
            vt = jax.lax.slice_in_dim(vt, 0, out_w, axis=1)
        o = _mm(dh_ref[p], vt)                      # [TH, out_w, CB]
        out = o if out is None else out + o
    o_ref[0] = out.astype(dt)


def _flrelu_pallas_gather(x, b, up_h_taps, up_w_taps, dn_h_taps, dn_w_taps, *,
                          HALO, WH, out_h, out_w, Wp, wh_hi, gain, slope,
                          clamp, n_d):
    N, H, W, C = x.shape
    CB = 128
    if out_w % 8:
        return None
    rows_y_of = lambda TH: TH + n_d
    cols_y = out_w + n_d
    Lu = max(len(t) for t, _ in up_w_taps)
    Ld = max(len(t) for t, _ in dn_w_taps)
    CO = min(64, ((out_w + 7) // 8) * 8)
    NCD = -(-out_w // CO)
    CID = min(CO + Ld - 1, cols_y)
    CIU = min(CID + Lu - 1, Wp)

    TH = _gather_plan(out_h, out_w, Wp, HALO, n_d, CO, CID, CIU,
                      x.dtype.itemsize)
    if TH is None:
        return None
    NT = out_h // TH
    rows_y = rows_y_of(TH)
    slab_rows = TH + 2 * HALO

    # full band matrices, then per-chunk windows sliced out of them (static)
    Bh = np.stack([_band(rows_y, slab_rows, t, HALO + o)
                   for t, o in up_h_taps])                  # [2,rows_y,slab]
    Dh = np.stack([_band(TH, rows_y, t, o) for t, o in dn_h_taps])
    Bw_full = [_band(cols_y, Wp, t, WH + o) for t, o in up_w_taps]
    Dw_full = [_band(out_w, cols_y, t, o) for t, o in dn_w_taps]

    su = [[0] * NCD for _ in (0, 1)]   # up-window starts, per (q, chunk)
    sd = [[0] * NCD for _ in (0, 1)]   # y-window starts
    Bw_c = np.zeros((2, NCD, CID, CIU), np.float32)
    Dw_c = np.zeros((2, NCD, CO, CID), np.float32)
    for q in (0, 1):
        taps_u, off_u = up_w_taps[q]
        bw_pad = np.zeros((cols_y + CID, Wp), np.float32)
        bw_pad[:cols_y] = Bw_full[q]
        dw_pad = np.zeros((NCD * CO, cols_y), np.float32)
        dw_pad[:out_w] = Dw_full[q]
        for c in range(NCD):
            s_d = min(max(c * CO, 0), max(cols_y - CID, 0))
            s_u = min(max(WH + s_d + off_u, 0), Wp - CIU)
            sd[q][c] = s_d
            su[q][c] = s_u
            Dw_c[q, c] = dw_pad[c * CO:(c + 1) * CO, s_d:s_d + CID]
            Bw_c[q, c] = bw_pad[s_d:s_d + CID, s_u:s_u + CIU]

    # pad rows so block i+1 exists for the last step: (NT+1)*TH total
    xp = jnp.pad(x, ((0, 0), (HALO, (NT + 1) * TH - HALO - H),
                     (WH, wh_hi), (0, 0)))
    b_arr = (jnp.zeros((C,), x.dtype) if b is None else
             jnp.asarray(b, x.dtype)).reshape(1, C)

    kern = functools.partial(
        _flrelu_kernel_gather, TH=TH, HALO=HALO, WH=WH, H_IN=H, W_IN=W,
        Wp=Wp, out_w=out_w, CO=CO, NCD=NCD, CID=CID, CIU=CIU,
        su=tuple(tuple(v) for v in su), sd=tuple(tuple(v) for v in sd),
        rows_y=rows_y, slope=float(slope), gain=float(gain),
        clamp=None if clamp is None else float(clamp), n_d=n_d)

    on_tpu = jax.default_backend() == 'tpu'
    full_vmem = pl.BlockSpec(memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((N, out_h, out_w, C), x.dtype),
        interpret=not on_tpu,
        grid=(N, C // CB, NT),
        in_specs=[
            pl.BlockSpec((1, TH, Wp, CB), lambda n, c, i: (n, i, 0, c)),
            pl.BlockSpec((1, TH, Wp, CB), lambda n, c, i: (n, i + 1, 0, c)),
            pl.BlockSpec((1, CB), lambda n, c, i: (0, c),
                         memory_space=pltpu.VMEM),
            full_vmem, full_vmem, full_vmem, full_vmem,
        ],
        out_specs=pl.BlockSpec((1, TH, out_w, CB),
                               lambda n, c, i: (n, i, 0, c)),
        compiler_params=(pltpu.CompilerParams(
            vmem_limit_bytes=_GATHER_VMEM) if on_tpu else None),
    )(xp, xp, b_arr, jnp.asarray(Bh, x.dtype), jnp.asarray(Bw_c, x.dtype),
      jnp.asarray(Dw_c, x.dtype), jnp.asarray(Dh, x.dtype))


#: VMEM live-set budget (MiB) for the shift-variant tile planner. The
#: compiler's scoped allocation measures ~2.0x the planner's estimate
#: (stage buffers are explicit scratch; the stack adds per-statement
#: temporaries of comparable size), so 7M keeps the total under the 16M
#: VMEM limit; tuned empirically on v5e (est 8M -> 16.66M OOM,
#: est 6M -> ok).
_FLRELU_VMEM_MB = float(os.environ.get('ANIMEFACE_FLRELU_VMEM_MB', '7'))


def _flrelu_shift_tile_plan(out_h, out_w, HALO, WH, n_d, isz, budget=None):
    '''Pick the (TH, TW) output tile minimizing halo read amplification
    (1 + 2*HALO/TH)(1 + ~2*WH/TW) subject to the VMEM live-set budget
    (2 halo'd slabs + 2 out bufs + the ~6 compute intermediates).
    W tiles never overlap (the driver pads output width to NWT*TW — W
    DMA starts must stay affine for Mosaic's alignment proof); H tiles
    overlap at the bottom edge instead of shrinking.
    Returns (TH, TW, SLAB_W) or None.'''
    CB = 128
    if budget is None:
        budget = int(_FLRELU_VMEM_MB * 2 ** 20)
    oh8 = ((out_h + 7) // 8) * 8
    ow8 = ((out_w + 7) // 8) * 8
    best = None
    for TW in sorted({min(ow8, c) for c in (512, 384, 256, 192, 160, 128,
                                            96, 64, 48, 32, 16, 8)},
                     reverse=True):
        SLAB_W = ((TW + 2 * WH + 7) // 8) * 8
        nwt = -(-out_w // TW)
        for TH in range(min(oh8, 256), 7, -8):
            slab_rows = TH + 2 * HALO
            rows_y = TH + n_d
            cols_y = TW + n_d
            est = (3 * slab_rows * SLAB_W      # 2 slabs + biased copy
                   + 3 * TH * TW               # 2 out bufs + acc
                   + 3 * rows_y * SLAB_W       # yH + yHt (+ relayout)
                   + 2 * cols_y * rows_y       # y + tmp
                   + 2 * TW * rows_y           # accp, vt
                   ) * CB * isz
            if est < budget:
                nt = -(-out_h // TH)
                # true read amplification incl. overlap/padding
                amp = (nt * slab_rows * nwt * SLAB_W) / (out_h * out_w)
                if best is None or amp < best[0]:
                    best = (amp, TH, TW, SLAB_W)
                break
    if best is None:
        return None
    return best[1], best[2], best[3]


def _flrelu_pallas_shift(x, b, up_h_taps, up_w_taps, dn_h_taps, dn_w_taps, *,
                         HALO, WH, out_h, out_w, gain, slope, clamp, n_d):
    '''Driver for the 'shift' variant: 2D tiles with H-overlap + W output
    padding (no divisibility constraints), no band-matrix inputs (taps are
    compile-time constants baked into the VPU shift-adds).'''
    N, H, W, C = x.shape
    CB = 128
    if out_h % 8 or out_w % 8:
        return None
    plan = _flrelu_shift_tile_plan(out_h, out_w, HALO, WH, n_d,
                                   x.dtype.itemsize)
    if plan is None:
        return None
    TH, TW, SLAB_W = plan
    NT = -(-out_h // TH)
    NWT = -(-out_w // TW)
    out_w_pad = NWT * TW

    # pad so every tile's read window exists physically:
    # rows [k0, k0 + TH + 2*HALO) for k0 <= out_h - TH, and
    # cols [w0, w0 + SLAB_W) for w0 = (NWT-1)*TW
    xp = jnp.pad(x, ((0, 0), (HALO, HALO + TH),
                     (WH, out_w_pad - TW + SLAB_W - WH - W), (0, 0)))
    b_arr = (jnp.zeros((C,), x.dtype) if b is None else
             jnp.asarray(b, x.dtype)).reshape(1, C)

    kern = functools.partial(
        _flrelu_kernel_shift, NT=NT, NWT=NWT, TH=TH, TW=TW, SLAB_W=SLAB_W,
        CB=CB, H_IN=H, W_IN=W, HALO=HALO, WH=WH, OUT_H=out_h,
        slope=float(slope), gain=float(gain),
        clamp=None if clamp is None else float(clamp), n_d=n_d,
        up_h_taps=tuple(up_h_taps), up_w_taps=tuple(up_w_taps),
        dn_h_taps=tuple(dn_h_taps), dn_w_taps=tuple(dn_w_taps))

    out = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((N, out_h, out_w_pad, C), x.dtype),
        interpret=jax.default_backend() != 'tpu',
        grid=(N, C // CB),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec((1, CB), lambda b_, c: (0, c),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
        scratch_shapes=[
            pltpu.VMEM((2, TH + 2 * HALO, SLAB_W, CB), x.dtype),
            pltpu.VMEM((2, TH, TW, CB), x.dtype),
            # per-stage buffers, reused across the 4 (p, q) phases
            pltpu.VMEM((TH + 2 * HALO, SLAB_W, CB), x.dtype),   # xb
            pltpu.VMEM((TH + n_d, SLAB_W, CB), x.dtype),        # yH
            pltpu.VMEM((SLAB_W, TH + n_d, CB), x.dtype),        # yH^T
            pltpu.VMEM((TW + n_d, TH + n_d, CB), x.dtype),      # y
            pltpu.VMEM((TW, TH + n_d, CB), x.dtype),            # accp
            pltpu.VMEM((TH + n_d, TW, CB), x.dtype),            # accp^T
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )(xp, b_arr)
    if out_w_pad != out_w:
        out = jax.lax.slice_in_dim(out, 0, out_w, axis=2)
    return out


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
