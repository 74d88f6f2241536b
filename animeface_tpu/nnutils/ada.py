'''ADA — adaptive discriminator augmentation, on-device and jittable.

Rebuild of reference `thirdparty/ada/augment.py` (AugmentPipe :115, wavelet
table :19, matrix builders :41) + the adaptive-p controller `nnutils/ada.py:5`.
Karras et al. 2020, "Training GANs with Limited Data".

TPU-native design:
  * `AugmentPipe` is a stateless host object; `pipe(key, images, p)` is a pure
    function of (PRNG key, NHWC batch, traced strength scalar) that runs
    INSIDE the jitted D step. All knob branches are static python `if`s.
  * The geometric path's pad margins are data-dependent in the reference
    (augment.py:270-281 computes them from the sampled homography, producing
    dynamic shapes). Here the margin is a STATIC bound computed from the
    enabled knob maxima (3-sigma scale extents + full corner radius under
    rotation, clamped to size-1 like the reference) so shapes stay stable
    under jit; transforms beyond the bound sample zeros at the very corners
    instead of reflected content.
  * Geometry executes in one of two ways (`geom_impl`): 'exact' — folded
    canvases + per-pixel bilinear gather, bit-matching the reference
    semantics (the torch-parity oracle); 'twopass' — the dense per-line
    TPU formulation in `nnutils/ada_geometry.py` (~400x faster on TPU,
    where XLA's per-pixel gather is index-bound: 1460 ms -> 3.6 ms for a
    64x256x256 pipe call). 'auto' (default) picks twopass on TPU.
  * `ada_update_p` is a pure function over (controller state, D(real) logits);
    under a data-parallel mesh the sign-mean is computed on the global batch
    inside jit, which is exactly the psum'd statistic (SURVEY §2.5).
'''

from __future__ import annotations

import math

import numpy as np
import scipy.signal
import jax
import jax.numpy as jnp

from animeface_tpu.ops import (
    setup_filter, upfirdn2d, upsample2d, downsample2d, grid_sample)

# Low-pass wavelet decomposition filters (orthogonal); coefficients are the
# standard published Daubechies/symlet banks (as in the reference table :19).


def _wavelet(name: str) -> np.ndarray:
    try:
        import pywt  # pragma: no cover - not installed in this image
        return np.asarray(pywt.Wavelet(name).dec_lo)[::-1]
    except ImportError:
        pass
    return np.asarray(_WAVELETS[name])


_WAVELETS = {
    'haar': [0.7071067811865476, 0.7071067811865476],
    'sym2': [-0.12940952255092145, 0.22414386804185735, 0.836516303737469,
             0.48296291314469025],
    'sym6': [0.015404109327027373, 0.0034907120842174702, -0.11799011114819057,
             -0.048311742585633, 0.4910559419267466, 0.787641141030194,
             0.3379294217276218, -0.07263752278646252, -0.021060292512300564,
             0.04472490177066578, 0.0017677118642428036, -0.007800708325034148],
}


# ---- homogeneous-matrix helpers (reference :41-105), batched jnp ----

def _eye3(B):
    return jnp.broadcast_to(jnp.eye(3), (B, 3, 3))


def translate2d_inv(tx, ty):
    B = tx.shape[0]
    m = _eye3(B)
    return m.at[:, 0, 2].set(-tx).at[:, 1, 2].set(-ty)


def scale2d_inv(sx, sy):
    B = sx.shape[0] if hasattr(sx, 'shape') and jnp.ndim(sx) else sy.shape[0]
    m = _eye3(B)
    return m.at[:, 0, 0].set(1.0 / sx).at[:, 1, 1].set(1.0 / sy)


def rotate2d_inv(theta):
    theta = -theta
    B = theta.shape[0]
    c, s = jnp.cos(theta), jnp.sin(theta)
    m = _eye3(B)
    return (m.at[:, 0, 0].set(c).at[:, 0, 1].set(-s)
             .at[:, 1, 0].set(s).at[:, 1, 1].set(c))


def _translate3d(t):
    B = t.shape[0]
    m = jnp.broadcast_to(jnp.eye(4), (B, 4, 4))
    return m.at[:, 0, 3].set(t).at[:, 1, 3].set(t).at[:, 2, 3].set(t)


def _scale3d(s):
    B = s.shape[0]
    m = jnp.broadcast_to(jnp.eye(4), (B, 4, 4))
    return m.at[:, 0, 0].set(s).at[:, 1, 1].set(s).at[:, 2, 2].set(s)


def _rotate3d_axis(v, theta):
    '''Rotation around unit 3-vector v (appended homogeneous row/col).'''
    B = theta.shape[0]
    vx, vy, vz = v[0], v[1], v[2]
    s, c = jnp.sin(theta), jnp.cos(theta)
    cc = 1 - c
    rows = [
        [vx * vx * cc + c, vx * vy * cc - vz * s, vx * vz * cc + vy * s],
        [vy * vx * cc + vz * s, vy * vy * cc + c, vy * vz * cc - vx * s],
        [vz * vx * cc - vy * s, vz * vy * cc + vx * s, vz * vz * cc + c],
    ]
    m = jnp.zeros((B, 4, 4)).at[:, 3, 3].set(1.0)
    for i in range(3):
        for j in range(3):
            m = m.at[:, i, j].set(rows[i][j])
    return m


class AugmentPipe:
    '''18-knob differentiable augmentation pipeline (reference :115).

    Construct with probability multipliers; call `pipe(key, images, p)`.
    '''

    def __init__(self,
                 xflip=0, rotate90=0, xint=0, xint_max=0.125,
                 scale=0, rotate=0, aniso=0, xfrac=0, scale_std=0.2,
                 rotate_max=1, aniso_std=0.2, xfrac_std=0.125,
                 brightness=0, contrast=0, lumaflip=0, hue=0, saturation=0,
                 brightness_std=0.2, contrast_std=0.5, hue_max=1,
                 saturation_std=1,
                 imgfilter=0, imgfilter_bands=(1, 1, 1, 1), imgfilter_std=1,
                 noise=0, cutout=0, noise_std=0.1, cutout_size=0.5,
                 geom_impl='auto'):
        self.xflip, self.rotate90, self.xint = float(xflip), float(rotate90), float(xint)
        self.xint_max = float(xint_max)
        self.scale, self.rotate, self.aniso, self.xfrac = (
            float(scale), float(rotate), float(aniso), float(xfrac))
        self.scale_std, self.rotate_max = float(scale_std), float(rotate_max)
        self.aniso_std, self.xfrac_std = float(aniso_std), float(xfrac_std)
        self.brightness, self.contrast, self.lumaflip = (
            float(brightness), float(contrast), float(lumaflip))
        self.hue, self.saturation = float(hue), float(saturation)
        self.brightness_std, self.contrast_std = float(brightness_std), float(contrast_std)
        self.hue_max, self.saturation_std = float(hue_max), float(saturation_std)
        self.imgfilter = float(imgfilter)
        self.imgfilter_bands = list(imgfilter_bands)
        self.imgfilter_std = float(imgfilter_std)
        self.noise, self.cutout = float(noise), float(cutout)
        self.noise_std, self.cutout_size = float(noise_std), float(cutout_size)

        # geometric warp execution: 'exact' = padded grid_sample (per-pixel
        # gather — the parity oracle, fine on CPU/GPU); 'twopass' = the dense
        # per-line TPU formulation (nnutils/ada_geometry.py; ~100x faster on
        # TPU where XLA's per-pixel gather is index-bound); 'auto' picks
        # twopass on TPU.
        assert geom_impl in ('auto', 'exact', 'twopass')
        self.geom_impl = geom_impl
        if geom_impl != 'exact':
            # derive the two-pass axis kernel EAGERLY (a jnp computation run
            # lazily inside a jit trace would be staged by omnistaging)
            from animeface_tpu.nnutils.ada_geometry import derive_axis_kernel
            self._axis_kernel = derive_axis_kernel()

        # orthogonal lowpass for the geometric resampling
        self.Hz_geom = setup_filter(_wavelet('sym6'))

        # filter bank for image-space band amplification (reference :167-177)
        Hz_lo = _wavelet('sym2')
        Hz_hi = Hz_lo * ((-1) ** np.arange(Hz_lo.size))
        Hz_lo2 = np.convolve(Hz_lo, Hz_lo[::-1]) / 2
        Hz_hi2 = np.convolve(Hz_hi, Hz_hi[::-1]) / 2
        Hz_fbank = np.eye(4, 1)
        for i in range(1, Hz_fbank.shape[0]):
            Hz_fbank = np.dstack([Hz_fbank, np.zeros_like(Hz_fbank)]
                                 ).reshape(Hz_fbank.shape[0], -1)[:, :-1]
            Hz_fbank = scipy.signal.convolve(Hz_fbank, [Hz_lo2])
            Hz_fbank[i, (Hz_fbank.shape[1] - Hz_hi2.size) // 2:
                     (Hz_fbank.shape[1] + Hz_hi2.size) // 2] += Hz_hi2
        self.Hz_fbank = jnp.asarray(Hz_fbank, jnp.float32)

    # ---- static margin bound (see module docstring) ----

    def _static_margin(self, width: int, height: int) -> tuple[int, int, int, int]:
        cx, cy = (width - 1) / 2, (height - 1) / 2
        radius = math.hypot(cx, cy) if self.rotate > 0 else max(cx, cy)
        grow = 1.0
        if self.scale > 0:
            grow *= 2 ** (3 * self.scale_std)
        if self.aniso > 0:
            grow *= 2 ** (3 * self.aniso_std)
        extent = radius * grow
        if self.xint > 0:
            extent += self.xint_max * max(width, height)
        if self.xfrac > 0:
            extent += 3 * self.xfrac_std * max(width, height)
        Hz_pad = self.Hz_geom.shape[0] // 4
        mx = int(np.clip(math.ceil(extent - cx + Hz_pad * 2), 0, width - 1))
        my = int(np.clip(math.ceil(extent - cy + Hz_pad * 2), 0, height - 1))
        return mx, mx, my, my

    def _geometry_enabled(self):
        return any(k > 0 for k in (self.xflip, self.rotate90, self.xint,
                                   self.scale, self.rotate, self.aniso,
                                   self.xfrac))

    def _color_enabled(self):
        return any(k > 0 for k in (self.brightness, self.contrast,
                                   self.lumaflip, self.hue, self.saturation))

    # ---- forward ----

    def __call__(self, key, images, p, debug_percentile=None):
        '''Apply the pipeline. `debug_percentile` (in [0,1]) replaces every
        random draw with that percentile of its distribution — the reference's
        deterministic testing mode (augment.py forward, `debug_percentile`).'''
        assert images.ndim == 4, 'expected NHWC'
        B, H, W, C = images.shape
        p = jnp.asarray(p, jnp.float32)
        k = iter(jax.random.split(key, 64))
        u = lambda shape=(): jax.random.uniform(next(k), (B,) + shape)
        n = lambda shape=(): jax.random.normal(next(k), (B,) + shape)
        dbg = debug_percentile
        if dbg is not None:
            dbg = float(dbg)
            erfinv = float(jax.scipy.special.erfinv(jnp.float32(dbg * 2 - 1)))

        def D(value, debug_value):
            '''Pick the debug override when in deterministic mode.'''
            if dbg is None:
                return value
            return jnp.full_like(value, debug_value)

        # ---- geometric: accumulate inverse homography G_inv ----
        if self._geometry_enabled():
            G_inv = _eye3(B)
            if self.xflip > 0:
                i = jnp.floor(u() * 2)
                i = jnp.where(u() < self.xflip * p, i, 0.0)
                i = D(i, math.floor(dbg * 2) if dbg is not None else 0)
                G_inv = G_inv @ scale2d_inv(1 - 2 * i, jnp.ones((B,)))
            if self.rotate90 > 0:
                i = jnp.floor(u() * 4)
                i = jnp.where(u() < self.rotate90 * p, i, 0.0)
                i = D(i, math.floor(dbg * 4) if dbg is not None else 0)
                G_inv = G_inv @ rotate2d_inv(-np.pi / 2 * i)
            if self.xint > 0:
                t = (u((2,)) * 2 - 1) * self.xint_max
                t = jnp.where(u((1,)) < self.xint * p, t, 0.0)
                t = D(t, (dbg * 2 - 1) * self.xint_max if dbg is not None else 0)
                G_inv = G_inv @ translate2d_inv(jnp.round(t[:, 0] * W),
                                                jnp.round(t[:, 1] * H))
            if self.scale > 0:
                s = jnp.exp2(n() * self.scale_std)
                s = jnp.where(u() < self.scale * p, s, 1.0)
                s = D(s, 2 ** (erfinv * self.scale_std) if dbg is not None else 1)
                G_inv = G_inv @ scale2d_inv(s, s)
            p_rot = 1 - jnp.sqrt(jnp.clip(1 - self.rotate * p, 0, 1))
            if self.rotate > 0:
                theta = (u() * 2 - 1) * np.pi * self.rotate_max
                theta = jnp.where(u() < p_rot, theta, 0.0)
                theta = D(theta, (dbg * 2 - 1) * np.pi * self.rotate_max
                          if dbg is not None else 0)
                G_inv = G_inv @ rotate2d_inv(-theta)
            if self.aniso > 0:
                s = jnp.exp2(n() * self.aniso_std)
                s = jnp.where(u() < self.aniso * p, s, 1.0)
                s = D(s, 2 ** (erfinv * self.aniso_std) if dbg is not None else 1)
                G_inv = G_inv @ scale2d_inv(s, 1 / s)
            if self.rotate > 0:
                theta = (u() * 2 - 1) * np.pi * self.rotate_max
                theta = jnp.where(u() < p_rot, theta, 0.0)
                theta = D(theta, 0.0)   # reference zeroes the post-rotation
                G_inv = G_inv @ rotate2d_inv(-theta)
            if self.xfrac > 0:
                t = n((2,)) * self.xfrac_std
                t = jnp.where(u((1,)) < self.xfrac * p, t, 0.0)
                t = D(t, erfinv * self.xfrac_std if dbg is not None else 0)
                G_inv = G_inv @ translate2d_inv(t[:, 0] * W, t[:, 1] * H)

            images = self._execute_geometry(images, G_inv)

        # ---- color: accumulate 4x4 homogeneous color matrix ----
        if self._color_enabled():
            Cm = jnp.broadcast_to(jnp.eye(4), (B, 4, 4))
            v = jnp.asarray([1, 1, 1, 0], jnp.float32) / np.sqrt(3)
            if self.brightness > 0:
                b = n() * self.brightness_std
                b = jnp.where(u() < self.brightness * p, b, 0.0)
                b = D(b, erfinv * self.brightness_std if dbg is not None else 0)
                Cm = _translate3d(b) @ Cm
            if self.contrast > 0:
                c = jnp.exp2(n() * self.contrast_std)
                c = jnp.where(u() < self.contrast * p, c, 1.0)
                c = D(c, 2 ** (erfinv * self.contrast_std) if dbg is not None else 1)
                Cm = _scale3d(c) @ Cm
            if self.lumaflip > 0:
                i = jnp.floor(u() * 2)
                i = jnp.where(u() < self.lumaflip * p, i, 0.0)
                i = D(i, math.floor(dbg * 2) if dbg is not None else 0)
                house = jnp.eye(4) - 2 * jnp.outer(v, v)
                Cm = jnp.where(i[:, None, None] > 0, house[None] @ Cm, Cm)
            if self.hue > 0 and C > 1:
                theta = (u() * 2 - 1) * np.pi * self.hue_max
                theta = jnp.where(u() < self.hue * p, theta, 0.0)
                theta = D(theta, (dbg * 2 - 1) * np.pi * self.hue_max
                          if dbg is not None else 0)
                Cm = _rotate3d_axis(
                    jnp.asarray([1, 1, 1], jnp.float32) / np.sqrt(3),
                    theta) @ Cm
            if self.saturation > 0 and C > 1:
                s = jnp.exp2(n() * self.saturation_std)
                s = jnp.where(u() < self.saturation * p, s, 1.0)
                s = D(s, 2 ** (erfinv * self.saturation_std)
                      if dbg is not None else 1)
                vv = jnp.outer(v, v)
                sat = vv[None] + (jnp.eye(4)[None] - vv[None]) * s[:, None, None]
                Cm = sat @ Cm
            images = self._execute_color(images, Cm)

        # ---- image-space filtering (band amplification) ----
        if self.imgfilter > 0:
            images = self._execute_imgfilter(next(k), images, p, dbg)

        # ---- corruptions ----
        if self.noise > 0:
            sigma = jnp.abs(n()) * self.noise_std
            sigma = jnp.where(u() < self.noise * p, sigma, 0.0)
            if dbg is not None:
                sigma = jnp.full_like(
                    sigma, float(jax.scipy.special.erfinv(jnp.float32(dbg)))
                    * self.noise_std)
            images = images + jax.random.normal(next(k), images.shape,
                                                images.dtype) \
                * sigma[:, None, None, None].astype(images.dtype)
        if self.cutout > 0:
            size = jnp.where(u((1,)) < self.cutout * p, self.cutout_size, 0.0)
            center = u((2,))
            if dbg is not None:
                size = jnp.full_like(size, self.cutout_size)
                center = jnp.full_like(center, dbg)
            cx_ = jnp.arange(W).reshape(1, 1, W) + 0.5
            cy_ = jnp.arange(H).reshape(1, H, 1) + 0.5
            mask_x = jnp.abs(cx_ / W - center[:, 0, None, None]) >= size[:, 0, None, None] / 2
            mask_y = jnp.abs(cy_ / H - center[:, 1, None, None]) >= size[:, 0, None, None] / 2
            mask = jnp.logical_or(mask_x, mask_y).astype(images.dtype)
            images = images * mask[..., None]

        return images

    # ---- execution stages ----

    def _resolved_geom_impl(self):
        if self.geom_impl != 'auto':
            return self.geom_impl
        return 'twopass' if jax.default_backend() == 'tpu' else 'exact'

    def _execute_geometry(self, images, G_inv):
        if (self._resolved_geom_impl() == 'twopass'
                and images.shape[1] == images.shape[2]):
            from animeface_tpu.nnutils.ada_geometry import twopass_warp
            half, support = self._axis_kernel
            return twopass_warp(images, G_inv, half, support)
        return self._execute_geometry_exact(images, G_inv)

    def _execute_geometry_exact(self, images, G_inv):
        '''Geometric warp (reference :283-299) via FOLDED CANVASES.

        The reference physically reflect-pads by a per-batch dynamic margin
        before the 2x wavelet upsample; the static-shape equivalent pads by
        the worst case (clipped at image size), which at 256px materializes
        a ~1532^2 f32 canvas per image — 9x more filtered area than the
        output consumes, and an HBM OOM at training batch sizes.

        TPU-native redesign, exact by construction: upsampling a mirrored
        signal equals the mirror of upsampling with the FLIPPED filter, so
        the virtual padded canvas is represented by four upsampled CORE
        canvases (filter normal/flipped per axis) and sample coordinates
        that fall outside the core are folded back (pixel-center mirror)
        while selecting the matching canvas. Out-of-margin samples read 0,
        like grid_sample's zeros padding over the physically-padded canvas.
        Values differ from the physical-pad formulation only in the
        outermost filter-support ring of the virtual canvas, where the
        physical pad's values are conv-edge-contaminated anyway (the torch
        reference sizes its dynamic margin so samples never land there).
        Verified exact (1e-5 f32) against the padded formulation within the
        designed margin.
        '''
        B, H, W, C = images.shape
        in_dtype = images.dtype
        images = images.astype(jnp.float32)
        f = self.Hz_geom
        taps = int(f.shape[0])
        Hz_pad = taps // 4
        mx0, mx1, my0, my1 = self._static_margin(W, H)
        assert mx0 == mx1 and my0 == my1, 'static margins are symmetric'
        mx, my = mx0, my0

        # small physical reflect pad covering the filter support, so the
        # core canvas samples equal those of the fully-padded upsample
        e = taps // 2
        xe = jnp.pad(images, ((0, 0), (e, e), (e, e), (0, 0)), mode='reflect')
        f_flip = jnp.flip(f)
        p0 = (taps + 1) // 2
        p1 = (taps - 2) // 2

        def up_x(z, fil):
            return upfirdn2d(z, fil[None, :], up=(2, 1),
                             padding=(p0, p1, 0, 0), gain=2)

        def up_y(z, fil):
            return upfirdn2d(z, fil[:, None], up=(1, 2),
                             padding=(0, 0, p0, p1), gain=2)

        ux_n, ux_f = up_x(xe, f), up_x(xe, f_flip)
        U = jnp.stack([up_y(ux_n, f), up_y(ux_f, f),
                       up_y(ux_n, f_flip), up_y(ux_f, f_flip)], axis=1)
        U = U[:, :, 2 * e: 2 * e + 2 * H, 2 * e: 2 * e + 2 * W, :]
        Sx, Sy = 2 * W, 2 * H

        # ---- homography math, identical to the padded formulation ----
        t = translate2d_inv(jnp.full((B,), -(mx0 - mx1) / 2),
                            jnp.full((B,), -(my0 - my1) / 2))
        G_inv = t @ G_inv
        s2 = scale2d_inv(jnp.full((B,), 0.5), jnp.full((B,), 0.5))
        s2i = scale2d_inv(jnp.full((B,), 2.0), jnp.full((B,), 2.0))
        G_inv = s2 @ G_inv @ s2i
        th = translate2d_inv(jnp.full((B,), 0.5), jnp.full((B,), 0.5))
        thi = translate2d_inv(jnp.full((B,), -0.5), jnp.full((B,), -0.5))
        G_inv = th @ G_inv @ thi

        # affine grid over the TARGET canvas (height+2*Hz_pad)*2, sampled
        # from the VIRTUAL padded upsampled canvas (reference :289-296)
        out_h = (H + Hz_pad * 2) * 2
        out_w = (W + Hz_pad * 2) * 2
        in_h = 2 * (H + my0 + my1)
        in_w = 2 * (W + mx0 + mx1)
        sa = scale2d_inv(jnp.full((B,), in_w / 2.0), jnp.full((B,), in_h / 2.0))
        sb = scale2d_inv(jnp.full((B,), 2.0 / out_w), jnp.full((B,), 2.0 / out_h))
        A = sa @ G_inv @ sb    # normalized output coords -> normalized input

        ys = (2 * jnp.arange(out_h) + 1) / out_h - 1
        xs = (2 * jnp.arange(out_w) + 1) / out_w - 1
        gy, gx = jnp.meshgrid(ys, xs, indexing='ij')
        ones = jnp.ones_like(gx)
        coords = jnp.stack([gx, gy, ones], axis=-1)            # [h,w,3]
        mapped = jnp.einsum('bij,hwj->bhwi', A[:, :2, :], coords)

        # virtual-canvas pixel coords -> core coords (grid_sample convention)
        jx = (mapped[..., 0] + 1.0) * (in_w * 0.5) - 0.5 - 2 * mx
        jy = (mapped[..., 1] + 1.0) * (in_h * 0.5) - 0.5 - 2 * my

        def fold(ji, S, m):
            '''Integer core coord -> (folded index, flipped?, in-canvas?).
            Pixel-center mirror: x[0] sits at upsampled position 0.5, so the
            left fold is j -> 1-j; x[N-1] at 2(N-1)+0.5, right fold
            j -> 2S-3-j.'''
            left = ji < 0
            right = ji > S - 1
            flip = left | right
            idx = jnp.where(left, 1 - ji, jnp.where(right, 2 * S - 3 - ji, ji))
            valid = (ji >= -2 * m) & (ji <= S - 1 + 2 * m)
            return idx, flip, valid

        x0 = jnp.floor(jx)
        y0 = jnp.floor(jy)
        wx = (jx - x0)[..., None]
        wy = (jy - y0)[..., None]
        x0i, y0i = x0.astype(jnp.int32), y0.astype(jnp.int32)
        batch = jnp.arange(B)[:, None, None]

        def corner(xi, yi):
            ix, fxp, vx = fold(xi, Sx, mx)
            iy, fyp, vy = fold(yi, Sy, my)
            c = fyp.astype(jnp.int32) * 2 + fxp.astype(jnp.int32)
            ixc = jnp.clip(ix, 0, Sx - 1)
            iyc = jnp.clip(iy, 0, Sy - 1)
            v = U[batch, c, iyc, ixc]
            return v * (vx & vy)[..., None].astype(v.dtype)

        v00 = corner(x0i, y0i)
        v01 = corner(x0i + 1, y0i)
        v10 = corner(x0i, y0i + 1)
        v11 = corner(x0i + 1, y0i + 1)
        images = (v00 * (1 - wx) + v01 * wx) * (1 - wy) \
            + (v10 * (1 - wx) + v11 * wx) * wy

        # wavelet downsample + crop back to HxW (reference :299)
        images = downsample2d(images, self.Hz_geom, down=2,
                              padding=-Hz_pad * 2, flip_filter=True)
        assert images.shape == (B, H, W, C), images.shape
        return images.astype(in_dtype)

    def _execute_color(self, images, Cm):
        B, H, W, C = images.shape
        in_dtype = images.dtype
        x = images.astype(jnp.float32)
        if C == 3:
            out = jnp.einsum('bij,bhwj->bhwi', Cm[:, :3, :3], x) \
                + Cm[:, None, None, :3, 3]
        elif C == 1:
            Cmean = jnp.mean(Cm[:, :3, :], axis=1)             # [B,4]
            out = x * jnp.sum(Cmean[:, :3], axis=1)[:, None, None, None] \
                + Cmean[:, 3][:, None, None, None]
        else:
            raise ValueError('images must be RGB or L')
        return out.astype(in_dtype)

    def _execute_imgfilter(self, key, images, p, dbg=None):
        B, H, W, C = images.shape
        in_dtype = images.dtype
        num_bands = self.Hz_fbank.shape[0]
        expected_power = jnp.asarray([10, 1, 1, 1], jnp.float32) / 13

        keys = jax.random.split(key, num_bands * 2)
        g = jnp.ones((B, num_bands))
        for i, band_strength in enumerate(self.imgfilter_bands):
            t_i = jnp.exp2(jax.random.normal(keys[2 * i], (B,))
                           * self.imgfilter_std)
            t_i = jnp.where(
                jax.random.uniform(keys[2 * i + 1], (B,))
                < self.imgfilter * p * band_strength, t_i, 1.0)
            if dbg is not None:
                erfinv = float(jax.scipy.special.erfinv(jnp.float32(dbg * 2 - 1)))
                t_i = jnp.full_like(
                    t_i, 2 ** (erfinv * self.imgfilter_std)
                    if band_strength > 0 else 1.0)
            t = jnp.ones((B, num_bands)).at[:, i].set(t_i)
            t = t / jnp.sqrt(jnp.sum(expected_power * t * t, axis=-1,
                                     keepdims=True))
            g = g * t

        Hz_prime = g @ self.Hz_fbank                            # [B, taps]
        taps = Hz_prime.shape[1]
        pad = taps // 2

        # per-sample separable filtering as one depthwise conv over B*C
        # channels (the reference's groups=B*C grouped conv, :396-397)
        x = images.astype(jnp.float32)
        x = jnp.pad(x, ((0, 0), (pad, pad), (pad, pad), (0, 0)), mode='reflect')
        x = jnp.transpose(x, (1, 2, 0, 3)).reshape(
            1, x.shape[1], x.shape[2], B * C)
        fil = jnp.repeat(Hz_prime[:, None, :], C, axis=1).reshape(B * C, taps)
        kx = jnp.transpose(fil)[None, :, None, :]               # [1,taps,1,B*C]
        ky = jnp.transpose(fil)[:, None, None, :]               # [taps,1,1,B*C]
        x = jax.lax.conv_general_dilated(
            x, kx, (1, 1), 'VALID', dimension_numbers=('NHWC', 'HWIO', 'NHWC'),
            feature_group_count=B * C, precision=jax.lax.Precision.HIGHEST)
        x = jax.lax.conv_general_dilated(
            x, ky, (1, 1), 'VALID', dimension_numbers=('NHWC', 'HWIO', 'NHWC'),
            feature_group_count=B * C, precision=jax.lax.Precision.HIGHEST)
        x = x.reshape(H, W, B, C).transpose(2, 0, 1, 3)
        return x.astype(in_dtype)


DEFAULT_ADA_KNOBS = dict(
    xflip=1, rotate90=1, xint=1, scale=1, rotate=1, aniso=1, xfrac=1,
    brightness=1, contrast=1, lumaflip=1, hue=1, saturation=1)


def make_ada_pipe(**knobs) -> AugmentPipe:
    '''AugmentPipe with the reference ADA default knob set (nnutils/ada.py:10).'''
    return AugmentPipe(**(knobs or DEFAULT_ADA_KNOBS))


def ada_init_state(batch_size: int, interval: int = 4, target_kimg: int = 500,
                   threshold: float = 0.6):
    '''Controller state for the adaptive-p heuristic (nnutils/ada.py:5).'''
    return dict(
        p=jnp.float32(0.0),
        signsum=jnp.float32(0.0),
        count=jnp.float32(0.0),
        num_iter=jnp.int32(0),
        _interval=interval,
        _threshold=threshold,
        _p_delta=batch_size * interval / (target_kimg * 1000),
        _batch_size=batch_size,
    )


def _ada_advance(ada, signsum, count):
    '''Shared cadence step: every `interval` iters adjust p from the
    accumulated sign statistic and reset the accumulators.'''
    interval = ada['_interval']
    num_iter = ada['num_iter'] + 1

    def adjust(_):
        # mean over the samples actually accumulated this window (R1-only
        # iters contribute no logits under replace-loss lazy reg); if the
        # whole window was logit-free, hold p.
        signmean = signsum / jnp.maximum(count, 1.0)
        delta = jnp.where(count > 0.0,
                          jnp.sign(signmean - ada['_threshold']) * ada['_p_delta'],
                          0.0)
        return (jnp.clip(ada['p'] + delta, 0.0, 1.0),
                jnp.float32(0.0), jnp.float32(0.0), jnp.int32(0))

    def keep(_):
        return ada['p'], signsum, count, num_iter

    p, signsum, count, num_iter = jax.lax.cond(
        num_iter >= interval, adjust, keep, None)
    return dict(ada, p=p, signsum=signsum, count=count, num_iter=num_iter)


def ada_update_p(ada, real_prob):
    '''Pure update of the controller state from D(real) logits.

    Every `interval` calls: p += sign(mean sign(D(real)) - threshold) * delta,
    clamped to [0, 1]. The mean is over the GLOBAL batch under jit (the psum'd
    cross-replica statistic). Matches reference `nnutils/ada.py:26-36`, which
    divides by the accumulated sample count — here tracked explicitly in
    `count` so iters without logits (see `ada_tick`) still advance the
    cadence without diluting the mean.
    '''
    signsum = ada['signsum'] + jnp.sum(jnp.sign(real_prob))
    count = ada['count'] + jnp.float32(real_prob.size)
    return _ada_advance(ada, signsum, count)


def ada_tick(ada):
    '''Advance the controller cadence on an iter that produced no adversarial
    D(real) logits (replace-loss lazy-reg R1 iters). The reference updates p
    on EVERY D step because its penalty is ADDED to the adversarial loss
    (`nnutils/ada.py:26`); under the substituted-loss formulation those iters
    have no sign statistic, so they count toward `num_iter` but add nothing
    to `signsum` — keeping the p-adaptation cadence at exactly one tick per
    training iteration instead of stretching it by d_k/(d_k-1).
    '''
    return _ada_advance(ada, ada['signsum'], ada['count'])
