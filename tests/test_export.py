'''StableHLO export path (tools/export_stablehlo.py): the serialized
artifact must deserialize with plain `jax` and reproduce `G.apply` exactly,
with a symbolic (any-size) batch dimension.

TPU-native replacement for the reference's load-state_dict-and-call
inference contract (`/root/reference/weights.md:1-40`).
'''

import subprocess
import sys
import os

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.slow
def test_export_roundtrip_and_symbolic_batch(tmp_path):
    out = tmp_path / 'g.stablehlo'
    env = dict(os.environ, ANIMEFACE_PLATFORM='cpu')
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, 'tools', 'export_stablehlo.py'),
         '--random-weights', '--image-size', '32', '--channels', '4',
         '--max-channels', '16', '--style-dim', '16',
         '--out', str(out), '--platforms', 'cpu'],
        capture_output=True, text=True, env=env, cwd=REPO)
    assert r.returncode == 0, r.stderr[-2000:]
    assert 'verify: deserialize+call matches direct apply' in r.stdout, \
        r.stdout

    # artifact is loadable with nothing but jax, at a batch size never
    # seen at export time (symbolic batch dim)
    import jax
    import jax.numpy as jnp
    from jax import export
    g = export.deserialize(out.read_bytes())
    z = jax.random.normal(jax.random.PRNGKey(0), (5, 16))
    images = np.asarray(g.call(z, jnp.uint32(1)))
    assert images.shape == (5, 32, 32, 3)
    assert np.isfinite(images).all()
