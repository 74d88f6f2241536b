'''Frechet Inception Distance / Kernel Inception Distance.

The reference repo (STomoya/animeface) publishes no metrics code; this
harness implements the standard FID-50k protocol (pytorch-fid semantics:
InceptionV3 pool3 2048-d features, Frechet distance with matrix sqrt of the
covariance product) so results gate against BASELINE.json's
"FID-50k within 2%" criterion.

TPU execution model: feature extraction runs batched under jit on device;
first/second-moment accumulation happens on host in float64 (TPUs have no
f64) so 50k-sample covariance estimates are numerically trustworthy.
'''

from __future__ import annotations

import numpy as np


# ---------------- statistics ----------------

class FeatureAccumulator:
    '''Streaming mean/covariance over feature batches (host, float64).'''

    def __init__(self, dim: int):
        self.n = 0
        self.s1 = np.zeros((dim,), np.float64)
        self.s2 = np.zeros((dim, dim), np.float64)

    def update(self, feats) -> None:
        f = np.asarray(feats, np.float64)
        assert f.ndim == 2
        self.n += f.shape[0]
        self.s1 += f.sum(axis=0)
        self.s2 += f.T @ f

    def statistics(self):
        assert self.n >= 2, 'need >= 2 samples for covariance'
        mu = self.s1 / self.n
        # unbiased covariance, matching np.cov / pytorch-fid
        cov = (self.s2 - self.n * np.outer(mu, mu)) / (self.n - 1)
        return mu, cov


def gaussian_statistics(features):
    '''(mu, cov) of [N, D] features, float64, unbiased (pytorch-fid).'''
    acc = FeatureAccumulator(np.asarray(features).shape[1])
    acc.update(features)
    return acc.statistics()


def _sqrtm_psd(mat: np.ndarray, eps: float = 1e-12) -> np.ndarray:
    '''Matrix square root via symmetric eigendecomposition.

    `mat` = sigma1 @ sigma2 is similar to the PSD matrix
    s1^(1/2) s2 s1^(1/2), so its eigenvalues are real-nonnegative up to
    noise; sqrtm through eigh of the symmetrized product is the standard
    stable evaluation (equivalent to scipy.linalg.sqrtm for this use).
    '''
    # symmetrize for numerical stability
    sym = (mat + mat.T) / 2.0
    vals, vecs = np.linalg.eigh(sym)
    vals = np.clip(vals, 0.0, None)
    return (vecs * np.sqrt(vals)) @ vecs.T


def frechet_distance(mu1, sigma1, mu2, sigma2, eps: float = 1e-6) -> float:
    '''d^2 = |mu1-mu2|^2 + Tr(s1 + s2 - 2 sqrt(s1 s2)) (pytorch-fid).'''
    mu1 = np.asarray(mu1, np.float64)
    mu2 = np.asarray(mu2, np.float64)
    sigma1 = np.asarray(sigma1, np.float64)
    sigma2 = np.asarray(sigma2, np.float64)

    diff = mu1 - mu2
    # sqrt of the product via the PSD-equivalent form:
    # sqrt(s1 s2) has the same trace as sqrt(s2^(1/2) s1 s2^(1/2))
    s2_half = _sqrtm_psd(sigma2)
    inner = s2_half @ sigma1 @ s2_half
    tr_covmean = np.trace(_sqrtm_psd(inner))

    if not np.isfinite(tr_covmean):
        offset = np.eye(sigma1.shape[0]) * eps
        s2_half = _sqrtm_psd(sigma2 + offset)
        inner = s2_half @ (sigma1 + offset) @ s2_half
        tr_covmean = np.trace(_sqrtm_psd(inner))

    return float(diff @ diff + np.trace(sigma1) + np.trace(sigma2)
                 - 2.0 * tr_covmean)


# ---------------- pipelines ----------------

def _feature_stream(batches, extract_fn, max_samples: int):
    '''Yield feature arrays from image batches until max_samples reached.'''
    seen = 0
    for batch in batches:
        if seen >= max_samples:
            break
        imgs = batch[0] if isinstance(batch, (tuple, list)) else batch
        take = min(imgs.shape[0], max_samples - seen)
        feats = np.asarray(extract_fn(imgs))[:take]
        seen += take
        yield feats


def compute_fid(real_batches, fake_batches, extract_fn,
                num_samples: int = 50_000, verbose: bool = False) -> float:
    '''FID between two image streams (NHWC in [-1, 1]).

    `extract_fn(images) -> [B, D]` runs on device (jit it once outside).
    '''
    accs = []
    for name, stream in (('real', real_batches), ('fake', fake_batches)):
        acc = None
        for feats in _feature_stream(stream, extract_fn, num_samples):
            if acc is None:
                acc = FeatureAccumulator(feats.shape[1])
            acc.update(feats)
            if verbose and acc.n % 10_000 < feats.shape[0]:
                print(f'[fid] {name}: {acc.n}/{num_samples}')
        if acc is None or acc.n < 2:
            raise ValueError(f'no {name} samples supplied')
        accs.append(acc.statistics())
    (mu_r, s_r), (mu_f, s_f) = accs
    return frechet_distance(mu_r, s_r, mu_f, s_f)


def _poly_kernel(x, y, degree=3, gamma=None, coef0=1.0):
    d = x.shape[1]
    gamma = gamma if gamma is not None else 1.0 / d
    return (x @ y.T * gamma + coef0) ** degree


def compute_kid(real_feats, fake_feats, num_subsets: int = 100,
                subset_size: int = 1000, seed: int = 0) -> float:
    '''Kernel Inception Distance (MMD^2, cubic kernel; StyleGAN2-ADA
    metrics/kernel_inception_distance.py protocol).'''
    rng = np.random.default_rng(seed)
    x = np.asarray(real_feats, np.float64)
    y = np.asarray(fake_feats, np.float64)
    n = min(subset_size, x.shape[0], y.shape[0])
    total = 0.0
    for _ in range(num_subsets):
        xi = x[rng.choice(x.shape[0], n, replace=False)]
        yi = y[rng.choice(y.shape[0], n, replace=False)]
        kxx = _poly_kernel(xi, xi)
        kyy = _poly_kernel(yi, yi)
        kxy = _poly_kernel(xi, yi)
        a = (kxx.sum() - np.trace(kxx)) / (n * (n - 1))
        b = (kyy.sum() - np.trace(kyy)) / (n * (n - 1))
        c = kxy.mean()
        total += a + b - 2 * c
    return float(total / num_subsets)
