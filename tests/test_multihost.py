'''Multi-host initialization tests (VERDICT r4 item 4).

The degenerate path (process_count == 1) runs in-process; the real
multi-process path spawns two coordinator-connected CPU subprocesses
(4 virtual devices each -> one 8-device global mesh) and asserts the
assembled global batch produces the same metrics as a single-process run —
the closest available stand-in for a v4-8 pod slice with one process per
host (SURVEY §5 distributed-backend bullet).
'''

import os
import socket
import subprocess
import sys
import textwrap

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_degenerate_single_process():
    '''Everything multihost collapses to no-ops at process_count == 1.'''
    from animeface_tpu.parallel.multihost import (
        maybe_initialize_distributed, process_shard, local_batch_size,
        multihost_requested)
    from animeface_tpu.dataset import DataLoader
    from animeface_tpu.dataset.synthetic import SyntheticImage

    assert not multihost_requested(None)
    idx, count = maybe_initialize_distributed(None)   # no flag -> no-op
    assert (idx, count) == (0, 1)
    assert process_shard() == (1, 0)
    assert local_batch_size(32) == 32

    # DataLoader's process-default shard resolves to (1, 0): global == local
    ds = SyntheticImage(8, 16, seed=0)
    loader = DataLoader(ds, 8, num_workers=1, seed=1)
    assert loader.shard_count == 1 and loader.shard_index == 0
    assert loader.batch_size == 8
    batch = next(iter(loader))
    assert batch.shape == (8, 8, 8, 3)

    # explicit shard args keep the historical local-batch semantics
    explicit = DataLoader(ds, 2, shard_count=4, shard_index=1, num_workers=1)
    assert explicit.batch_size == 2


def test_local_batch_divisibility():
    from animeface_tpu.parallel.multihost import local_batch_size
    with pytest.raises(ValueError):
        # fake a >1 process count via monkeypatching jax is fragile; the
        # divisibility contract is testable directly at pc=1 only when the
        # batch is divisible — assert the error path with a mocked count
        import animeface_tpu.parallel.multihost as mh
        import jax
        real = jax.process_count
        jax.process_count = lambda: 3
        try:
            mh.local_batch_size(32)
        finally:
            jax.process_count = real


_WORKER = textwrap.dedent('''
    import os, sys
    pid = int(sys.argv[1]); port = sys.argv[2]
    os.environ['XLA_FLAGS'] = '--xla_force_host_platform_device_count=4'
    os.environ.pop('JAX_PLATFORMS', None)
    import jax
    jax.config.update('jax_platforms', 'cpu')
    # the contract main.py follows: initialize BEFORE the first backend touch
    os.environ['ANIMEFACE_COORDINATOR'] = f'localhost:{port}'
    os.environ['ANIMEFACE_NUM_PROCESSES'] = '2'
    os.environ['ANIMEFACE_PROCESS_ID'] = str(pid)
    from animeface_tpu.parallel.multihost import maybe_initialize_distributed
    idx, count = maybe_initialize_distributed()
    assert (idx, count) == (pid, 2), (idx, count)
    assert len(jax.devices()) == 8 and len(jax.local_devices()) == 4

    import jax.numpy as jnp
    from animeface_tpu.nnutils.accelerate import Accelerator
    from animeface_tpu.dataset import DataLoader
    from animeface_tpu.dataset.synthetic import SyntheticImage

    accel = Accelerator(mesh_shape=(-1,), bf16=False)
    assert accel.num_devices == 8
    ds = SyntheticImage(8, 32, seed=0)
    loader = DataLoader(ds, 8, num_workers=1, seed=3)
    # the GLOBAL batch 8 is split: this process decodes 4 samples per step
    assert loader.batch_size == 4, loader.batch_size
    assert loader.shard_count == 2 and loader.shard_index == pid

    w = accel.prepare(jnp.zeros((3,)))

    def step(w, batch):
        m = jnp.mean(batch)
        g = jax.grad(lambda w: jnp.mean((w - m) ** 2))(w)
        return w - 0.1 * g, m

    jstep = accel.jit_step(step, donate_state=False)
    for batch in accel.iter_loader(loader):
        assert batch.shape[0] == 8          # assembled GLOBAL batch
        w, m = jstep(w, batch)
        print(f'METRIC {float(m):.10f} {float(w[0]):.10f}', flush=True)
        break
''')


@pytest.mark.slow
def test_two_process_cpu_distributed(tmp_path):
    '''Two coordinator-connected processes assemble one global batch and
    agree with each other and with the single-process oracle.'''
    with socket.socket() as s:
        s.bind(('localhost', 0))
        port = s.getsockname()[1]
    script = tmp_path / 'worker.py'
    script.write_text(_WORKER)

    env = {k: v for k, v in os.environ.items()
           if k not in ('XLA_FLAGS', 'JAX_PLATFORMS')}
    env['PYTHONPATH'] = REPO
    procs = [subprocess.Popen(
        [sys.executable, str(script), str(i), str(port)],
        cwd=REPO, env=env, stdout=subprocess.PIPE,
        stderr=subprocess.STDOUT, text=True) for i in range(2)]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=300)
        outs.append(out)
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f'worker {i} failed:\n{out}'
    metrics = [[ln for ln in o.splitlines() if ln.startswith('METRIC')][0]
               for o in outs]
    assert metrics[0] == metrics[1], metrics

    # single-process oracle: same loader config, shard_count=1, batch 8 —
    # the union of the two process shards' first batches is exactly the
    # first 8 permutation entries, and the metric (mean) is order-invariant
    from animeface_tpu.dataset import DataLoader
    from animeface_tpu.dataset.synthetic import SyntheticImage
    ds = SyntheticImage(8, 32, seed=0)
    oracle_loader = DataLoader(ds, 8, num_workers=1, seed=3,
                               shard_count=1, shard_index=0)
    oracle_batch = next(iter(oracle_loader))
    oracle_m = float(np.mean(oracle_batch))
    got_m = float(metrics[0].split()[1])
    assert abs(got_m - oracle_m) < 1e-6, (got_m, oracle_m)
