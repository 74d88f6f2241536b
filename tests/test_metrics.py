'''FID/KID harness: math against scipy oracle, streaming stats, and the
InceptionV3 flax architecture + weight-converter naming round trip.'''

import numpy as np
import pytest

from animeface_tpu.metrics import (
    gaussian_statistics, frechet_distance, compute_fid, compute_kid,
    FeatureAccumulator,
)


def _rand_gauss(rng, n, d, shift=0.0, scale=1.0):
    return rng.normal(shift, scale, size=(n, d))


def test_statistics_match_numpy():
    rng = np.random.default_rng(0)
    x = _rand_gauss(rng, 500, 16)
    mu, cov = gaussian_statistics(x)
    np.testing.assert_allclose(mu, x.mean(0), atol=1e-12)
    np.testing.assert_allclose(cov, np.cov(x, rowvar=False), atol=1e-10)


def test_streaming_equals_batch():
    rng = np.random.default_rng(1)
    x = _rand_gauss(rng, 333, 8)
    acc = FeatureAccumulator(8)
    for i in range(0, 333, 50):
        acc.update(x[i:i + 50])
    mu_s, cov_s = acc.statistics()
    mu_b, cov_b = gaussian_statistics(x)
    np.testing.assert_allclose(mu_s, mu_b, atol=1e-10)
    np.testing.assert_allclose(cov_s, cov_b, atol=1e-8)


def test_frechet_against_scipy():
    scipy = pytest.importorskip('scipy.linalg')
    rng = np.random.default_rng(2)
    d = 12
    a = rng.normal(size=(d, d))
    b = rng.normal(size=(d, d))
    s1 = a @ a.T + np.eye(d) * 0.1
    s2 = b @ b.T + np.eye(d) * 0.1
    mu1, mu2 = rng.normal(size=d), rng.normal(size=d)
    covmean, _ = scipy.sqrtm(s1 @ s2, disp=False)
    expected = (np.sum((mu1 - mu2) ** 2) + np.trace(s1) + np.trace(s2)
                - 2 * np.trace(covmean.real))
    got = frechet_distance(mu1, s1, mu2, s2)
    np.testing.assert_allclose(got, expected, rtol=1e-6)


def test_frechet_identity_zero():
    rng = np.random.default_rng(3)
    a = rng.normal(size=(8, 8))
    s = a @ a.T + np.eye(8)
    mu = rng.normal(size=8)
    assert abs(frechet_distance(mu, s, mu, s)) < 1e-8


def test_fid_monotonic_in_shift():
    rng = np.random.default_rng(4)
    base = _rand_gauss(rng, 2000, 6)
    extract = lambda x: np.asarray(x)
    def stream(arr):
        for i in range(0, len(arr), 256):
            yield arr[i:i + 256]
    fids = []
    for shift in (0.0, 0.5, 2.0):
        fake = _rand_gauss(rng, 2000, 6, shift=shift)
        fids.append(compute_fid(stream(base), stream(fake), extract,
                                num_samples=2000))
    assert fids[0] < fids[1] < fids[2]
    assert fids[0] < 0.1


def test_kid_zero_for_same_distribution():
    rng = np.random.default_rng(5)
    x = _rand_gauss(rng, 1500, 10)
    y = _rand_gauss(rng, 1500, 10)
    close = compute_kid(x, y, num_subsets=20, subset_size=500)
    far = compute_kid(x, y + 1.0, num_subsets=20, subset_size=500)
    assert abs(close) < 0.05 and far > close + 0.1


# ---------------- inception architecture ----------------

def _invert_params_to_torch_keys(variables):
    '''Build a synthetic torch-style state_dict from flax variables.'''
    sd = {}

    def walk(tree, prefix, coll):
        for k, v in tree.items():
            name = f'{prefix}.{k}' if prefix else k
            if isinstance(v, dict):
                walk(v, name, coll)
                continue
            arr = np.asarray(v)
            if k == 'kernel':            # HWIO -> OIHW
                sd[name.replace('.kernel', '.weight')] = \
                    arr.transpose(3, 2, 0, 1)
            elif coll == 'params' and k == 'scale':
                sd[name.replace('.scale', '.weight')] = arr
            elif coll == 'params' and k == 'bias':
                sd[name] = arr
            elif coll == 'batch_stats' and k == 'mean':
                sd[name.replace('.mean', '.running_mean')] = arr
            elif coll == 'batch_stats' and k == 'var':
                sd[name.replace('.var', '.running_var')] = arr

    walk(variables['params'], '', 'params')
    walk(variables['batch_stats'], '', 'batch_stats')
    return sd


@pytest.mark.slow
def test_inception_architecture_and_converter(tmp_path):
    import jax
    import jax.numpy as jnp
    from animeface_tpu.metrics.inception import InceptionV3Features
    from animeface_tpu.metrics import load_inception_params
    from tools.convert_inception_weights import convert

    model = InceptionV3Features()
    x = jnp.zeros((2, 75, 75, 3))
    variables = model.init(jax.random.PRNGKey(0), x)
    n_params = sum(np.prod(p.shape) for p in
                   jax.tree_util.tree_leaves(variables['params']))
    # torchvision inception_v3 trunk (no fc, no aux): ~21.8M params
    assert 20e6 < n_params < 24e6, n_params

    feats = model.apply(variables, x)
    assert feats.shape == (2, 2048)
    assert bool(jnp.all(jnp.isfinite(feats)))

    # converter round trip: synthetic torch state_dict -> npz -> load -> equal
    sd = _invert_params_to_torch_keys(variables)
    sd['fc.weight'] = np.zeros((1000, 2048))        # must be dropped
    sd['AuxLogits.conv0.conv.weight'] = np.zeros((128, 768, 1, 1))
    flat = convert(sd)
    path = str(tmp_path / 'inception.npz')
    np.savez(path, **flat)
    loaded = load_inception_params(path)
    for name, tree in (('params', variables['params']),
                       ('batch_stats', variables['batch_stats'])):
        ref_leaves = jax.tree_util.tree_leaves_with_path(tree)
        got = loaded[name]
        flat_got = {jax.tree_util.keystr(k): v for k, v in
                    jax.tree_util.tree_leaves_with_path(got)}
        for k, v in ref_leaves:
            ks = jax.tree_util.keystr(k)
            assert ks in flat_got, f'missing {name}{ks}'
            np.testing.assert_array_equal(np.asarray(v), flat_got[ks])

    feats2 = model.apply(loaded, x)
    np.testing.assert_allclose(np.asarray(feats), np.asarray(feats2))


def test_frechet_kid_match_canned_pytorch_fid_values():
    '''Cross-check against the pytorch-fid / StyleGAN2-ADA formulas on a
    COMMITTED feature set (VERDICT r1 item 4): tests/data/fid_canned_features
    .npz stores two 512x64 feature sets plus the FID computed with
    pytorch-fid's exact `calculate_frechet_distance` algorithm (scipy.sqrtm
    of sigma1 @ sigma2) and the KID from a direct unbiased-MMD^2 cubic-kernel
    evaluation. Our implementations must reproduce both on the same data.'''
    import os
    data = np.load(os.path.join(os.path.dirname(__file__), 'data',
                                'fid_canned_features.npz'))
    real, fake = data['real'], data['fake']

    mu_r, s_r = gaussian_statistics(real)
    mu_f, s_f = gaussian_statistics(fake)
    got_fid = frechet_distance(mu_r, s_r, mu_f, s_f)
    np.testing.assert_allclose(got_fid, float(data['expected_fid']),
                               rtol=1e-8, atol=1e-6)

    # deterministic KID: one subset spanning the whole set
    got_kid = compute_kid(real, fake, num_subsets=1, subset_size=len(real))
    np.testing.assert_allclose(got_kid, float(data['expected_kid']),
                               rtol=1e-8, atol=1e-9)


def test_trend_features_discriminate():
    '''The in-box trend metric (fixed-seed random-VGG Frechet,
    metrics/trend.py) must DISCRIMINATE — the property the random-init
    Inception stand-in lacks (its BN stack collapses all inputs to
    near-constant features, fid_cli.py docstring): identical streams score
    ~0, near-identical streams score small, and unrelated noise scores an
    order of magnitude worse.'''
    import jax
    from animeface_tpu.metrics.trend import (
        make_trend_extractor, trend_statistics, trend_fd)

    key = jax.random.PRNGKey(0)
    k1, k2, k3 = jax.random.split(key, 3)
    # structured "data": smooth gradients + blobs, in [-1, 1]
    import jax.numpy as jnp
    xs = jnp.linspace(-1, 1, 16)
    grid = xs[None, :, None, None] * xs[None, None, :, None]
    data = jnp.tanh(grid + 0.3 * jax.random.normal(k1, (64, 16, 16, 3)))
    near = jnp.tanh(grid + 0.3 * jax.random.normal(k2, (64, 16, 16, 3)))
    noise = jax.random.uniform(k3, (64, 16, 16, 3)) * 2 - 1

    extract = make_trend_extractor()
    s_data = trend_statistics([data], extract, max_samples=64)
    s_near = trend_statistics([near], extract, max_samples=64)
    s_noise = trend_statistics([noise], extract, max_samples=64)

    fd_same = trend_fd(s_data, s_data)
    fd_near = trend_fd(s_data, s_near)
    fd_far = trend_fd(s_data, s_noise)
    assert fd_same < 1e-6
    assert fd_near > 0
    assert fd_far > 10 * fd_near, (fd_near, fd_far)
