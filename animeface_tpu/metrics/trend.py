'''In-box quality TREND metric: Frechet distance on fixed-seed random-VGG
features.

Why this exists: BASELINE's FID-50k gate needs the pytorch-fid InceptionV3
weights, which cannot enter this zero-egress image (ARTIFACTS_NEEDED.md).
The random-init Inception stand-in is useless even for trends — its BN
stack is contractive and collapses every input to near-constant features
(std ~3e-6, measured; see fid_cli.py docstring). A fixed-seed random VGG16
trunk (no normalization layers) does NOT collapse — random conv features
are a known-usable perceptual basis (the same fallback the perceptual
losses use, nnutils/loss/vgg.py) — so the Frechet distance over its
block-pooled activations gives a deterministic, in-box RELATIVE quality
signal: it cannot be compared to published FID numbers, but it moves in
the right direction (toward-data = down), which is exactly what a soak
needs to prove training is converging and to catch quality regressions
between EMA snapshots.

Protocol: per block of VGGFeatures(16) under fixed seed 20260816, the
per-channel spatial MEAN is pooled; the 5 pooled vectors concatenate to a
1472-d feature; FD uses the same f64 streaming statistics + PSD-sqrt
Frechet solve as the real FID harness (fid.py).
'''

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from animeface_tpu.metrics.fid import FeatureAccumulator, frechet_distance

_TREND_SEED = 20260816
FEATURE_DIM = 64 + 128 + 256 + 512 + 512


def make_trend_extractor():
    '''Returns a jitted `extract(images NHWC in [-1,1]) -> [B, 1472]` on
    fixed-seed random-VGG16 block-mean features.'''
    from animeface_tpu.nnutils.loss.vgg import VGGFeatures, _MEAN, _STD

    model = VGGFeatures(16)
    variables = model.init(jax.random.PRNGKey(_TREND_SEED),
                           jnp.zeros((1, 32, 32, 3)))

    @jax.jit
    def extract(images):
        x = jnp.asarray(images).astype(jnp.float32) * 0.5 + 0.5
        x = (x - _MEAN) / _STD
        feats = model.apply(variables, x)
        pooled = [jnp.mean(f, axis=(1, 2)) for f in feats]
        return jnp.concatenate(pooled, axis=-1)

    return extract


def trend_statistics(batches, extract=None, max_samples: int = 4096):
    '''(mu, cov) float64 statistics of an image-batch stream.'''
    extract = extract or make_trend_extractor()
    acc = FeatureAccumulator(FEATURE_DIM)
    for batch in batches:
        imgs = batch[0] if isinstance(batch, (tuple, list)) else batch
        take = min(imgs.shape[0], max_samples - acc.n)
        acc.update(np.asarray(extract(imgs))[:take])
        if acc.n >= max_samples:
            break
    return acc.statistics()


def trend_fd(stats_a, stats_b) -> float:
    '''Frechet distance between two `trend_statistics` results.'''
    (mu1, s1), (mu2, s2) = stats_a, stats_b
    return frechet_distance(mu1, s1, mu2, s2)
