'''Dense two-pass geometric warp for the ADA AugmentPipe on TPU.

WHY: the reference executes geometry as reflect-pad -> 2x wavelet upsample ->
per-pixel bilinear grid_sample -> 2x downsample (`thirdparty/ada/augment.py:
283-299`). A per-pixel gather is the natural GPU formulation (texture units);
on TPU, XLA lowers it to an index-count-bound scattered read measured at
~1.1 s for a 64x256x256 batch (scripts/gather_probe.py: per-pixel gather
1050 ms vs whole-line operations at 8-16 ms). This module re-expresses the
warp in per-LINE operations that map onto the VPU/MXU:

  * the affine map LU-factors into two per-line 1-D resamples
    (y-pass then x-pass), each = per-column integer CYCLIC shift (radix
    jnp.roll rounds with lane masks — no gather) + per-column fractional
    2-tap blend + a kernel matmul shared per image (slope resampling on the
    MXU);
  * the up2 -> bilinear -> down2 sandwich collapses along each axis into a
    single derived 1-D kernel K: piecewise-linear with half-integer knots,
    interpolating (K(n) = delta(n)), support |t| < 6 — computed once from
    the wavelet FIRs and verified against the exact path
    (tests/test_ada_twopass.py);
  * reflect semantics come from a DOUBLE CANVAS [z, reverse(interior)]
    (period P = 2N - 2 of the pixel-center mirror extension): every
    out-of-core read is a mod-P read of true mirror content, with no
    physical margin pad (the exact path pays a (N+2m)^2 ~ 9x-area canvas);
    rotations are normalized into (-45, 45] by an exact per-image
    rot90/flip of the canvas so the factorization slopes stay bounded.

Semantics vs the exact path (`AugmentPipe._execute_geometry`):
  * EXACT (same kernel, same values) for every separable transform — flips,
    rot90s, integer and fractional translations, axis-aligned scalings;
  * for rotation/aniso-coupled maps, the two-pass factorization evaluates
    the y-kernel at the column's own x tap instead of the continuous x
    position ("skewed" separable kernel — the classic Catmull-Smith two-pass
    resampling). Sub-pixel footprint differences only; augmentation
    distribution is unchanged. The exact path remains the parity oracle and
    the default off-TPU.

All operations are dense jnp (differentiable, jit/vmap-safe); the backward
pass is XLA-transposed dense ops, not scatters.
'''

from __future__ import annotations

import functools
import math

import numpy as np
import jax
import jax.numpy as jnp


# ---------------------------------------------------------------------------
# derived 1-D kernel
# ---------------------------------------------------------------------------

@functools.lru_cache(maxsize=4)
def derive_axis_kernel():
    '''Composite 1x kernel of (zero-insert up2 + FIR) -> hat -> (FIR + down2).

    Returns (half_values, support): K at half-integer knots
    K(0.5 + n), n >= 0 (symmetric; K interpolates integers: K(0)=1, K(n)=0;
    piecewise-linear between half-integer knots — the hat's knots land on
    the 2x grid). Measured directly from the exact geometry path
    (`AugmentPipe._execute_geometry`) by warping a delta image with pure
    half-integer translation — the oracle defines the kernel, so the two
    paths share filtering by construction.
    '''
    from animeface_tpu.nnutils.ada import AugmentPipe, translate2d_inv

    # geom_impl='exact': the oracle path (also avoids re-entering this
    # derivation from the pipe constructor)
    pipe = AugmentPipe(xint=1, geom_impl='exact')
    N = 33
    c = N // 2

    # tiny one-off numeric derivation: run on CPU (avoids a pointless remote
    # TPU compile) and through the EXACT path (the twopass path calls back
    # into this function)
    try:
        cpu = jax.devices('cpu')[0]
    except RuntimeError:
        cpu = None

    def row_for(t):
        G = translate2d_inv(jnp.full((1,), float(t)), jnp.zeros((1,)))
        x = np.zeros((1, N, N, 1), np.float32)
        x[0, c, c, 0] = 1.0
        if cpu is not None:
            with jax.default_device(cpu):
                out = np.asarray(pipe._execute_geometry_exact(jnp.asarray(x), G))
        else:
            out = np.asarray(pipe._execute_geometry_exact(jnp.asarray(x), G))
        return out[0, c, :, 0]

    # integer translation must be exact (interpolating kernel)

    int_row = row_for(1.0)
    assert abs(int_row[c + 1] - 1.0) < 1e-5, int_row[c - 2:c + 3]
    assert np.abs(np.delete(int_row, c + 1)).max() < 1e-5

    # half-integer translation reads K at the half-integer knots:
    # out[j] = K(j - (c + 0.5))
    half_row = row_for(0.5)
    vals = []
    n = 0
    while True:
        j = c + 1 + n                    # offset (j - c - 0.5) = n + 0.5
        if j >= N:
            break
        v = float(half_row[j])
        if abs(v) < 1e-7 and n > 0:
            break
        vals.append(v)
        n += 1
    half = np.asarray(vals)
    # symmetry check against the mirrored side
    for n, v in enumerate(half):
        assert abs(float(half_row[c - n]) - v) < 1e-5, (n, v)
    support = len(half)                  # K(t) = 0 for |t| >= support + 0.5
    return tuple(float(v) for v in half), support


def eval_kernel(t, half_values, support):
    '''Evaluate the piecewise-linear interpolating kernel at positions t.

    K(n) = delta(n) at integers; K(n + 0.5) = half_values[n] (symmetric);
    linear between half-integer knots. Branchless: the tiny knot table is
    expanded as a static unrolled sum of selects (no gather).
    '''
    a = jnp.abs(t)
    k = jnp.floor(a * 2.0).astype(jnp.int32)    # knot index on the 0.5 grid
    frac = (a * 2.0 - k).astype(jnp.float32)

    # K(m/2) for m = 0..2*support+1: [1, h0, 0, h1, 0, h2, ..., h_last, 0]
    knots = [1.0]
    for h in half_values:
        knots.extend([float(h), 0.0])

    def knot_value(m):
        v = jnp.zeros(m.shape, jnp.float32)
        for i, kv in enumerate(knots):
            if kv != 0.0:
                v = v + jnp.where(m == i, jnp.float32(kv), 0.0)
        return v

    v = knot_value(k) * (1.0 - frac) + knot_value(k + 1) * frac
    return jnp.where(a >= support + 0.5, 0.0, v)


# ---------------------------------------------------------------------------
# cyclic mirror canvas
# ---------------------------------------------------------------------------
# Pixel-center reflect extension of a length-N signal is PERIODIC with period
# P = 2N - 2, and one period is [z, reverse(z[1:-1])]. Building that double
# canvas once turns every out-of-range read into a cyclic (mod P) read:
#   * the per-column integer shear shift becomes a radix decomposition of
#     dense jnp.roll + lane-masked selects (no gather, no guard zeros, no
#     static margin — arbitrarily large shifts fold to TRUE mirror content,
#     where the reference clips its margins at the image size);
#   * the slope matmul's kernel is evaluated at the CYCLIC distance, so the
#     13-tap band simply wraps around the period.
# Every op is a roll / select / einsum — the jax.grad transpose is dense too.


def _rot90_weights(theta):
    '''One-hot over k in {0,1,2,3} = round(theta / 90deg) mod 4.'''
    k = jnp.round(theta / (np.pi / 2)).astype(jnp.int32) % 4
    return k


def _dihedral_normalize(x, A, u):
    '''Fold reflections and 90-degree rotations of the sampling map into
    exact canvas ops so the residual rotation lies in [-45, 45] degrees.

    Returns (canvas', A', u') with det(A') > 0 and the polar angle of A'
    in [-45, 45]: sampling canvas' with (A', u') equals sampling x with
    (A, u). Canvas ops are chosen per image via dense selects.

    Operates on the channel-major [B, C, H, W] layout: the rot90 transposes
    and flips then see W (not C=3) in the lane dimension.
    '''
    B, C, H, W = x.shape
    assert H == W, 'two-pass geometry expects square images'

    det = A[:, 0, 0] * A[:, 1, 1] - A[:, 0, 1] * A[:, 1, 0]
    flip = det < 0
    # F = diag(-1, 1): A <- F A, u <- F u, canvas <- flip_x(canvas)
    Fs = jnp.where(flip[:, None, None],
                   jnp.asarray([[-1.0, 0.0], [0.0, 1.0]]),
                   jnp.eye(2))
    A = Fs @ A
    u = jnp.einsum('bij,bj->bi', Fs, u)

    # polar rotation angle of A (after the flip fold, det > 0)
    theta = jnp.arctan2(A[:, 1, 0] - A[:, 0, 1], A[:, 0, 0] + A[:, 1, 1])
    k = _rot90_weights(theta)

    # R(-k * 90deg) applied to A and u; canvas rotated to compensate.
    # R_mk for k=0..3: [[c, s], [-s, c]] with (c, s) = cos/sin(-k pi/2)
    cs = jnp.asarray([[1., 0.], [0., -1.], [-1., 0.], [0., 1.]])  # (c, s)
    c = cs[:, 0][k]
    s = cs[:, 1][k]
    # standard R(-k*90): [[c, -s], [s, c]] with (c, s) = cos/sin(-k*90)
    Rm = jnp.stack([jnp.stack([c, -s], -1), jnp.stack([s, c], -1)], -2)
    A = Rm @ A
    u = jnp.einsum('bij,bj->bi', Rm, u)

    # canvas counterpart: sampling x at position p equals sampling
    # rot90^k(flip_x^f(x)) at R(-k*90)(p - ctr) + ctr; orientation fixed by
    # the rot90-parity test against the exact path. The composite dihedral
    # op decomposes as [transpose if k odd] then [row reverse] then
    # [column reverse] (rot90_1 = rev_r . T, rot90_2 = rev_r . rev_c,
    # rot90_3 = rev_c . T, and T . rev_c = rev_r . T folds the flip in) —
    # one materialized transpose + two fused reverse-selects instead of a
    # 4-way rotation stack + select-sum (5 canvas round trips -> ~2).
    odd = (k % 2) == 1
    xt = jnp.transpose(x, (0, 1, 3, 2))
    x = jnp.where(odd[:, None, None, None], xt, x)
    rev_r = jnp.where(flip, (k == 2) | (k == 3), (k == 1) | (k == 2))
    rev_c = jnp.where(flip, (k == 0) | (k == 3), (k == 2) | (k == 3))
    x = jnp.where(rev_r[:, None, None, None], x[:, :, ::-1, :], x)
    x = jnp.where(rev_c[:, None, None, None], x[:, :, :, ::-1], x)
    return x, A, u


def _cyclic_double(z, axis):
    '''One period of the pixel-center mirror extension: [z, reverse(z[1:-1])]
    along `axis` (length N -> P = 2N - 2). The infinite reflect extension is
    this, tiled — so any position reads TRUE mirror content via mod P.'''
    rev = jnp.flip(z, axis)
    interior = jax.lax.slice_in_dim(rev, 1, z.shape[axis] - 1, axis=axis)
    return jnp.concatenate([z, interior], axis=axis)


def _pass_params(slope, shear, base, cols, out_len, P, half, support):
    '''Per-image line-pass parameters: integer cyclic shift (mod P) +
    fractional blend per column, and the kernel matrix M at cyclic
    distance.'''
    cols = jnp.asarray(np.asarray(cols, np.float32))
    shear_term = shear[:, None] * cols[None, :]                # [B, W]
    t = jnp.floor(shear_term)
    frac = shear_term - t                                      # [B, W]
    tint = jnp.mod(t.astype(jnp.int32), P)                     # [B, W]

    o = jnp.arange(out_len, dtype=jnp.float32)
    j = jnp.arange(P, dtype=jnp.float32)
    q = slope[:, None] * o[None, :] + base[:, None]            # [B, out]
    dlt = q[:, :, None] - j[None, None, :]
    dlt = jnp.mod(dlt + P / 2.0, float(P)) - P / 2.0           # cyclic delta
    # K is evaluated in f32 then cast to the compute dtype: integer-position
    # taps are exactly 0/1 in any float dtype, so separable exactness holds;
    # bf16 training pays ~2e-3 kernel rounding, accumulated in f32 (MXU).
    M = eval_kernel(dlt, half, support)                        # [B, out, P]
    return tint, frac, M


def _line_pass(z, slope, shear, base, cols, out_len, half, support):
    '''Resample along axis 1 of z [B, C, N, W] at positions
    pos(o, col) = slope[b] * o + shear[b] * cols[col] + base[b]
    (o = 0..out_len-1) in axis-2 coordinates, reading the MIRROR extension
    of z. Returns [B, C, out_len, W].

    Stages (all dense — rolls, lane-masked selects, one einsum — so the
    jax.grad transpose is dense as well):
      1. double canvas (period P = 2N - 2), cyclic from here on;
      2. integer part of shear*col -> per-column cyclic shift, applied as a
         radix decomposition: ceil(log2 P) rounds of jnp.roll + jnp.where
         with a per-(image, column) lane mask;
      3. fractional part of shear*col -> 2-tap hat pre-blend (one more roll;
         the only inexact contribution, zero whenever shear == 0 — all
         separable transforms stay EXACT);
      4. slope*o + base -> per-image matmul with the derived kernel K
         evaluated at CYCLIC distance (13-tap band that wraps; arbitrary
         slopes/translations fold into the period).
    '''
    B, C, N, W = z.shape
    P = 2 * N - 2

    z2 = _cyclic_double(z, axis=2)                             # [B, C, P, W]

    tint, frac, M = _pass_params(slope, shear, base, cols, out_len, P,
                                 half, support)

    if _use_fused_kernel(N, W):
        from animeface_tpu.nnutils.ada_geometry_tpu import linepass_fused
        Pp = -(-P // 8) * 8
        Wp = -(-W // 128) * 128
        z2p = jnp.pad(z2, ((0, 0), (0, 0), (0, Pp - P), (0, Wp - W)))
        Mp = jnp.pad(M, ((0, 0), (0, 0), (0, Pp - P))).astype(z.dtype)
        tp = jnp.pad(tint, ((0, 0), (0, Wp - W)))
        fp = jnp.pad(frac, ((0, 0), (0, Wp - W))).astype(z.dtype)
        interpret = jax.default_backend() != 'tpu'   # tests: interpret mode
        out = linepass_fused(z2p, tp, fp, Mp, P, out_len, interpret)
        return out[:, :, :, :W]

    # dense jnp fallback (CPU / non-TPU backends): radix rolls + lerp +
    # einsum — identical semantics to the fused kernel
    tint4 = tint[:, None, None, :]
    bits = max(int(math.ceil(math.log2(P))), 1)
    for k in range(bits):
        step = 1 << k
        if step >= P:
            break
        m = ((tint4 >> k) & 1).astype(bool)
        z2 = jnp.where(m, jnp.roll(z2, -step, axis=2), z2)

    # fractional shear pre-blend (2-tap hat, cyclic neighbour).
    # Stays in the input dtype: exact whenever shear == 0 (f == 0) in ANY
    # dtype, so the separable-exactness claims hold for bf16 training too;
    # f32 callers (tests, CPU) keep full precision end to end.
    f = frac.astype(z.dtype)[:, None, None, :]
    z2 = z2 * (1 - f) + jnp.roll(z2, -1, axis=2) * f

    return jnp.einsum('boj,bcjw->bcow', M.astype(z.dtype), z2,
                      preferred_element_type=jnp.float32).astype(z.dtype)


def _use_fused2(N, We):
    '''Fully-fused two-pass kernel gate. Default ON where the fused line
    pass is available: measured on v5e (scripts/ada_fused2_bench.py, B=128
    256px) at 4.72 ms fwd / 5.45 ms fwd+grad vs the single-pass path's
    6.91 / 7.54. Shape-gated to %8 sublanes and %128 live lanes (the
    bench/SOAK 256px case: We = 384); ineligible shapes fall through to
    the single-pass fused path. Opt-out via ANIMEFACE_ADA_FUSED2=0.'''
    import os
    if N % 8 or We % 128:
        return False
    env = os.environ.get('ANIMEFACE_ADA_FUSED2')
    if env is not None:
        return env not in ('0', 'false', 'off')
    return _use_fused_kernel(N, We)


def _use_fused_kernel(N, W):
    '''Fused pallas line pass on real TPUs (overridable for tests via
    ANIMEFACE_ADA_FUSED=0/1); the dense jnp path everywhere else.'''
    import os
    env = os.environ.get('ANIMEFACE_ADA_FUSED')
    if env is not None:
        return env not in ('0', 'false', 'off')
    from animeface_tpu.nnutils.ada_geometry_tpu import available
    return available()


def twopass_warp(images, G_inv, half=None, support=None):
    '''Dense two-pass execution of the exact path's sampling semantics.

    images: [B, H, W, C] float; G_inv: [B, 3, 3] inverse homography in the
    exact path's pixel convention (p_in = A (p_out - ctr) + ctr + u with
    A = G_inv[:2,:2], u = G_inv[:2,2], ctr = (N-1)/2). Out-of-core reads
    return true mirror content at ANY distance (cyclic double canvas) —
    where the exact path (and the torch reference) clip their reflect
    margins at the image size and read zeros beyond.
    '''
    if half is None:
        half, support = derive_axis_kernel()
    B, H, W, C = images.shape
    assert H == W
    N = H
    ctr = (N - 1) / 2.0
    # compute dtype = input dtype: every stage is either exact data movement
    # (flips, rolls, selects) or f32-accumulated (the kernel matmul), so
    # bf16 in -> bf16 path; the f32 CPU oracle tests run f32 end to end.
    in_dtype = images.dtype
    x = images

    A = G_inv[:, :2, :2].astype(jnp.float32)
    u = G_inv[:, :2, 2].astype(jnp.float32)

    # channel-major layout: per-line ops see W (not C=3) in the lane dim
    x = jnp.transpose(x, (0, 3, 1, 2))                         # [B, C, H, W]
    x, A, u = _dihedral_normalize(x, A, u)

    a = A[:, 0, 0]                                             # dx_in / dox
    b = A[:, 0, 1]
    c = A[:, 1, 0]
    d = A[:, 1, 1]
    # guard against degenerate a (post-normalization a ~ cos(theta) > 0.7
    # for every transform the pipe draws; the clip only bounds pathology)
    a = jnp.clip(a, 0.05, None)
    ux, uy = u[:, 0], u[:, 1]

    # physically mirror-extend the COLUMNS by E = N/4 before pass 1, so the
    # border columns that post-normalization rotations actually reach
    # ((sqrt(2)-1) * N/2 ~ 0.21 N) carry pass-1 content with the CORRECT
    # per-column y-shear. Beyond E, pass 2's cyclic fold supplies mirror
    # content whose y-shear is evaluated at the folded column — zero error
    # whenever c == 0, sub-pixel for small angles, tail-only otherwise.
    E = max(N // 4, support + 2)
    left = jnp.flip(x[:, :, :, 1:E + 1], axis=3)
    right = jnp.flip(x[:, :, :, W - E - 1:W - 1], axis=3)
    x = jnp.concatenate([left, x, right], axis=3)              # [B, C, H, W+2E]
    We = W + 2 * E

    # ---- pass 1: resample along y at integer (extended) x columns ----
    # y_in(oy, x_in) = (det/a) oy' + (c/a) x_in' + (uy - c ux / a)
    # (primes are centered coords; cols are the extended columns, centered)
    det = a * d - b * c
    slope_y = det / a
    cols = np.arange(We, dtype=np.float32) - E - ctr
    base_y = (uy - c * ux / a) + ctr - slope_y * ctr

    if _use_fused2(N, We):
        # fully-fused kernel: both passes VMEM-resident per image — y1 never
        # exists in HBM and the inter-pass transpose/double/pad glue is gone
        from animeface_tpu.nnutils.ada_geometry_tpu import twopass_fused
        P1, P2 = 2 * N - 2, 2 * We - 2
        t1, f1, M1 = _pass_params(slope_y, c / a, base_y, cols, N, P1,
                                  half, support)
        rows = np.arange(N, dtype=np.float32) - ctr
        base_x = ux + ctr - a * ctr + E
        t2, f2, M2 = _pass_params(a, b, base_x, rows, N, P2, half, support)
        P1p = -(-P1 // 8) * 8
        P2p = -(-P2 // 8) * 8
        M1 = jnp.pad(M1, ((0, 0), (0, 0), (0, P1p - P1))).astype(x.dtype)
        M2 = jnp.pad(M2, ((0, 0), (0, 0), (0, P2p - P2))).astype(x.dtype)
        interpret = jax.default_backend() != 'tpu'
        out = twopass_fused(x, t1, f1.astype(x.dtype), M1,
                            t2, f2.astype(x.dtype), M2,
                            P1, P2, We, N, interpret)
        # out: [B, C, out_x, rows] -> NHWC
        return jnp.transpose(out, (0, 3, 2, 1)).astype(in_dtype)

    y1 = _line_pass(x, slope_y, c / a, base_y, cols, N, half, support)
    # y1: [B, C, N(out rows), We(extended cols)]

    # ---- pass 2: resample along x (line axis = extended columns) ----
    # x_in(oy, ox) = a ox' + b oy' + ux; axis index = x_in + E
    rows = np.arange(N, dtype=np.float32) - ctr
    base_x = ux + ctr - a * ctr + E
    y1t = jnp.transpose(y1, (0, 1, 3, 2))                      # [B, C, We, N]
    out = _line_pass(y1t, a, b, base_x, rows, N, half, support)
    # out: [B, C, N(out cols), N(rows)] -> back to NHWC
    out = jnp.transpose(out, (0, 3, 2, 1))
    return out.astype(in_dtype)
