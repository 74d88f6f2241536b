'''Infrastructure tests: mesh/sharding, Accelerator, checkpointing —
on the 8-device virtual CPU mesh (the multi-chip stand-in).'''

import numpy as np
import jax
import jax.numpy as jnp
import optax
import pytest

from animeface_tpu.parallel import (
    make_mesh, data_sharding, shard_batch, replicate, prefetch_to_device,
    check_replica_consistency,
)
from animeface_tpu.nnutils.accelerate import Accelerator, MiniAccelerator
from animeface_tpu.checkpoint import Checkpointer, save_model, load_model


def test_make_mesh_all_devices():
    mesh = make_mesh((-1,))
    assert mesh.devices.size == len(jax.devices())
    assert mesh.axis_names == ('data',)


def test_make_mesh_2d():
    mesh = make_mesh((-1, 2))
    assert mesh.axis_names == ('data', 'model')
    assert mesh.devices.shape == (len(jax.devices()) // 2, 2)


def test_make_mesh_subset_and_invalid():
    assert make_mesh((3,)).devices.size == 3   # explicit subset of 8 devices
    with pytest.raises(AssertionError):
        make_mesh((16,))                        # more than available


def test_shard_batch_and_replicate():
    mesh = make_mesh((-1,))
    batch = np.ones((16, 4, 4, 3), np.float32)
    sharded = shard_batch(batch, mesh)
    assert sharded.sharding.spec == data_sharding(mesh).spec
    assert len(sharded.addressable_shards) == 8
    assert sharded.addressable_shards[0].data.shape == (2, 4, 4, 3)

    params = {'w': jnp.ones((3, 3))}
    rep = replicate(params, mesh)
    assert check_replica_consistency(rep, mesh)


def test_prefetch_to_device():
    mesh = make_mesh((-1,))
    batches = [np.full((8, 2), i, np.float32) for i in range(5)]
    out = list(prefetch_to_device(iter(batches), mesh, size=2))
    assert len(out) == 5
    assert float(out[3][0, 0]) == 3.0


def test_uint8_transfer_roundtrip():
    '''DataLoader(transfer_dtype='uint8') quantizes image batches for the
    wire; prefetch_to_device dequantizes ON DEVICE back to the exact [-1,1]
    floats the f32 wire would have delivered (uint8-sourced pixels round-trip
    bit-exactly), 4x fewer bytes over the host link.'''
    from animeface_tpu.dataset._base import _quantize_images
    from animeface_tpu.dataset import DataLoader
    from animeface_tpu.dataset.synthetic import SyntheticImage

    mesh = make_mesh((-1,))
    ds = SyntheticImage(16, 32, seed=0)
    f32 = DataLoader(ds, 8, num_workers=1, seed=1, shard_count=1)
    u8 = DataLoader(ds, 8, num_workers=1, seed=1, shard_count=1,
                    transfer_dtype='uint8')
    b_f32 = next(iter(f32))
    b_u8 = next(iter(u8))
    assert b_u8.dtype == np.uint8
    dev_f32 = next(prefetch_to_device(iter([b_f32]), mesh))
    dev_u8 = next(prefetch_to_device(iter([b_u8]), mesh))
    assert dev_u8.dtype == jnp.float32
    # quantize(x) then device-dequant == quantize round trip of the floats:
    # uint8-sourced pixels are exact, anything else within 1/255 of a level
    np.testing.assert_allclose(np.asarray(dev_u8), np.asarray(dev_f32),
                               atol=1.01 / 255)
    # the wire inverse really is exact on its own output
    q = _quantize_images(np.asarray(dev_u8))
    np.testing.assert_array_equal(q, np.asarray(b_u8))

    # non-image leaves (labels) pass through both directions untouched
    pair = (b_f32, np.arange(8, dtype=np.float32))
    qpair = _quantize_images(pair)
    assert qpair[0].dtype == np.uint8 and qpair[1].dtype == np.float32
    dev = next(prefetch_to_device(iter([qpair]), mesh))
    assert dev[0].dtype == jnp.float32
    np.testing.assert_array_equal(np.asarray(dev[1]), pair[1])


def test_accelerator_data_parallel_training():
    '''A jitted SGD step over the 8-device mesh must match single-device math:
    the gradient psum across shards is inserted by XLA.'''
    accel = Accelerator(mesh_shape=(-1,), bf16=False)
    assert accel.num_devices == 8

    w0 = jnp.zeros((4,))
    x = np.tile(np.arange(4, dtype=np.float32), (16, 1))
    y = np.full((16,), 10.0, np.float32)

    def step(w, batch):
        bx, by = batch
        def loss(w):
            return jnp.mean((bx @ w - by) ** 2)
        l, g = jax.value_and_grad(loss)(w)
        return w - 0.01 * g, l

    jstep = accel.jit_step(step, donate_state=False)
    w = accel.prepare(w0)
    batch = accel.shard_batch((x, y))
    w1, l1 = jstep(w, batch)

    # single-device reference
    w1_ref, l1_ref = step(w0, (jnp.asarray(x), jnp.asarray(y)))
    np.testing.assert_allclose(np.asarray(w1), np.asarray(w1_ref), rtol=1e-6)
    np.testing.assert_allclose(float(l1), float(l1_ref), rtol=1e-6)


def test_accelerator_cast():
    accel = Accelerator(bf16=True)
    out = accel.cast({'a': jnp.ones((2,), jnp.float32), 'i': jnp.ones((2,), jnp.int32)})
    assert out['a'].dtype == jnp.bfloat16
    assert out['i'].dtype == jnp.int32
    assert MiniAccelerator is Accelerator


def test_accelerator_backward_raises():
    with pytest.raises(RuntimeError):
        Accelerator().backward(jnp.float32(0))


def test_checkpointer_roundtrip(tmp_path):
    ck = Checkpointer(str(tmp_path), max_to_keep=2)
    state = {'params': {'w': jnp.arange(6.0).reshape(2, 3)},
             'opt': optax.adam(1e-3).init({'w': jnp.zeros((2, 3))}),
             'step': jnp.int32(7)}
    ck.save(7, state, meta={'loss': {'G': [1.0]}, 'batches_done': 7})
    ck.save(14, state)
    ck.save(21, state)
    assert ck.all_steps() == [14, 21]   # max_to_keep=2 GC'd step 7
    assert ck.latest_step() == 21

    template = jax.tree_util.tree_map(jnp.zeros_like, state)
    restored, meta = ck.restore(template)
    np.testing.assert_allclose(np.asarray(restored['params']['w']),
                               np.asarray(state['params']['w']))
    assert int(restored['step']) == 7  # saved value


def test_checkpointer_migrates_added_leaf(tmp_path, capsys):
    '''Round-4 advisor (low): ada_init_state gained a `count` leaf; snapshots
    written before the change must still restore — missing leaves are
    default-filled from the template (loudly), obsolete leaves dropped.'''
    ck = Checkpointer(str(tmp_path))
    old_state = {'ada': {'p': jnp.float32(0.3), 'signsum': jnp.float32(1.0),
                         'legacy': jnp.float32(9.)},
                 'step': jnp.int32(5)}
    ck.save(5, old_state)

    # the template the NEW code restores with: +count, -legacy
    template = {'ada': {'p': jnp.float32(0.), 'signsum': jnp.float32(0.),
                        'count': jnp.int32(0)},
                'step': jnp.int32(0)}
    restored, _ = ck.restore(template)
    assert float(restored['ada']['p']) == pytest.approx(0.3)
    assert int(restored['ada']['count']) == 0        # default-filled
    assert 'legacy' not in restored['ada']
    assert int(restored['step']) == 5
    out = capsys.readouterr().out
    assert 'MIGRATED' in out and 'count' in out and 'legacy' in out

    # a shape mismatch must be fatal at restore time (flax from_bytes would
    # silently hand back the wrong-shaped leaf and fail later inside jit)
    ck2 = Checkpointer(str(tmp_path / 'strict'))
    ck2.save(1, {'w': jnp.zeros((2, 2))})
    with pytest.raises(ValueError, match='shape'):
        ck2.restore({'w': jnp.zeros((3, 3))})


def test_checkpointer_empty_raises(tmp_path):
    ck = Checkpointer(str(tmp_path))
    with pytest.raises(FileNotFoundError):
        ck.restore({})


def test_save_load_model(tmp_path):
    params = {'k': jnp.ones((3, 3)) * 2}
    p = str(tmp_path / 'g_ema.msgpack')
    save_model(p, params)
    out = load_model(p, {'k': jnp.zeros((3, 3))})
    np.testing.assert_allclose(np.asarray(out['k']), 2.0)


def test_trainer_aborts_on_nonfinite(tmp_path, monkeypatch):
    '''Failure detection: sustained NaN losses / non-finite params abort the
    run with a FloatingPointError instead of training on garbage.'''
    import jax.numpy as jnp
    import pytest
    from animeface_tpu.utils import EasyDict
    from animeface_tpu.utils import argument
    from animeface_tpu.nnutils.accelerate import Accelerator
    from animeface_tpu.nnutils.trainer import run_training

    monkeypatch.setattr(argument, 'IMPLEMENTATIONS_DIR', str(tmp_path))

    class Loader:
        def __len__(self):
            return 100

        def __iter__(self):
            for _ in range(100):
                yield jnp.zeros((8, 4, 4, 3))

    def bad_step(state, batch):
        return state, {'d': jnp.float32(float('nan'))}

    args = EasyDict(log_interval=1, log_file='/dev/null', resume=None)
    accel = Accelerator(mesh_shape=(-1,), bf16=False)
    state = {'G': {'w': jnp.zeros((2, 2))}, 'step': jnp.int32(0)}
    with pytest.raises(FloatingPointError, match='non-finite'):
        run_training(name='nanrun', args=args, accel=accel, state=state,
                     loader=Loader(), train_step=bad_step, sample_fn=None,
                     max_iters=50, save_interval=1000)

    def nan_param_step(state, batch):
        return {'G': {'w': state['G']['w'] + float('nan')},
                'step': state['step'] + 1}, {'d': jnp.float32(0.)}

    state = {'G': {'w': jnp.zeros((2, 2))}, 'step': jnp.int32(0)}
    with pytest.raises(FloatingPointError, match='non-finite'):
        run_training(name='nanrun2', args=args, accel=accel, state=state,
                     loader=Loader(), train_step=nan_param_step,
                     sample_fn=None, max_iters=50, save_interval=5)


def _make_drifted_replicated(mesh, shape=(4,)):
    '''A "replicated" array whose per-device buffers actually differ —
    the failure mode a non-deterministic collective would produce.'''
    from jax.sharding import NamedSharding, PartitionSpec as P
    sh = NamedSharding(mesh, P())
    bufs = [jax.device_put(np.full(shape, float(i), np.float32), d)
            for i, d in enumerate(mesh.devices.flat)]
    return jax.make_array_from_single_device_arrays(shape, sh, bufs)


def test_replica_drift_detection():
    '''find_replica_drift catches divergent replicated leaves, skips
    deliberately-sharded ones (TP kernels, data batches).'''
    from animeface_tpu.parallel import (
        find_replica_drift, assert_replica_consistency)
    mesh = make_mesh((-1,))

    clean = replicate({'w': jnp.ones((4,))}, mesh)
    assert find_replica_drift(clean) is None

    drifted = {'G': {'w': _make_drifted_replicated(mesh)}}
    msg = find_replica_drift(drifted)
    assert msg is not None and 'w' in msg
    with pytest.raises(RuntimeError, match='replica consistency'):
        assert_replica_consistency(drifted, name='test')

    # a batch-sharded array's shards differ by design: not drift
    batch = shard_batch(np.arange(16, dtype=np.float32).reshape(16, 1), mesh)
    assert find_replica_drift({'batch': batch}) is None


def test_trainer_aborts_on_replica_drift(tmp_path, monkeypatch):
    '''VERDICT r4 item 6: the consistency check is wired into the training
    loop at checkpoint cadence — a step that forks the replicas aborts the
    run instead of checkpointing the drifted state.'''
    from animeface_tpu.utils import EasyDict
    from animeface_tpu.utils import argument
    from animeface_tpu.nnutils.trainer import run_training

    monkeypatch.setattr(argument, 'IMPLEMENTATIONS_DIR', str(tmp_path))

    class Loader:
        def __len__(self):
            return 100

        def __iter__(self):
            for _ in range(100):
                yield jnp.zeros((8, 2))

    accel = Accelerator(mesh_shape=(-1,), bf16=False)

    def drifting_step(state, batch):
        # bypasses jit deliberately: inject per-device divergence the way a
        # buggy non-SPMD host interaction would
        return {'G': {'w': _make_drifted_replicated(accel.mesh)},
                'step': state['step'] + 1}, {'d': jnp.float32(0.)}

    args = EasyDict(log_interval=1, log_file='/dev/null', resume=None)
    state = {'G': {'w': jnp.zeros((4,))}, 'step': jnp.int32(0)}
    with pytest.raises(RuntimeError, match='replica consistency'):
        run_training(name='driftrun', args=args, accel=accel, state=state,
                     loader=Loader(), train_step=drifting_step,
                     sample_fn=None, max_iters=50, save_interval=5)


@pytest.mark.slow
def test_spatial_sharding_matches_data_parallel():
    '''One StyleGAN2 train step on a (8,) dp mesh and a (4, 2) dp x sp mesh
    (image H sharded over 'spatial') must produce matching metrics — GSPMD
    halo exchange is semantically transparent (asserted inside
    dryrun_multichip).'''
    import __graft_entry__ as ge
    # the dryrun asserts finiteness internally and runs both meshes
    ge.dryrun_multichip(8)


@pytest.mark.slow
def test_generate_cli_flows(tmp_path):
    '''tools/generate.py: plain, truncation, and style-mixing inference from
    saved weights all produce a valid grid PNG.'''
    import os
    import sys
    from PIL import Image as pilImage
    from animeface_tpu.implementations.StyleGAN2.model import Generator
    from animeface_tpu.checkpoint import save_model
    import tools.generate as gen

    G = Generator(image_size=32, style_dim=32, channels=8, max_channels=32)
    params = G.init({'params': jax.random.PRNGKey(0),
                     'noise': jax.random.PRNGKey(1)},
                    jnp.zeros((1, 32)))['params']
    wpath = str(tmp_path / 'G.msgpack')
    save_model(wpath, params)

    out = str(tmp_path / 'gen.png')
    base = ['generate.py', '--weights', wpath, '--num', '4', '--out', out,
            '--image-size', '32', '--style-dim', '32', '--channels', '8',
            '--max-channels', '32', '--nrow', '2']
    old = sys.argv
    try:
        for extra in ([], ['--truncation', '0.7'],
                      ['--mix-seed', '3', '--mix-layer', '2']):
            sys.argv = base + extra
            gen.main()
            im = pilImage.open(out)
            assert im.size[0] > 32 and im.size[1] > 32
            os.remove(out)
    finally:
        sys.argv = old


def test_host_step_counter_resumes_cadence():
    '''Lazy-reg/ADA cadence must derive from the restored step (VERDICT r1
    item 7): a counter created after --resume at step 17 continues 17, 18...
    so `i % d_k` branches stay phase-aligned with the pre-restart run.'''
    from animeface_tpu.nnutils.trainer import host_step_counter

    fresh = host_step_counter()
    state0 = {'step': jnp.int32(0)}
    assert [fresh(state0) for _ in range(3)] == [0, 1, 2]

    resumed = host_step_counter()
    state17 = {'step': jnp.int32(17)}
    assert [resumed(state17) for _ in range(3)] == [17, 18, 19]
    # the d_k=16 R1 schedule: step 32 is a penalty iter again
    idx = [resumed(state17) for _ in range(16)]
    assert any(i % 16 == 0 for i in idx)

    # states without a step field (non-standard recipes) start at 0
    nostep = host_step_counter()
    assert nostep({}) == 0


def test_mbsd_grouping_under_mesh():
    '''MinibatchStdDev sharding choice (SURVEY §2.5, VERDICT r1 item 8):
    'strided' reproduces the reference torch semantics on the global batch
    (numpy oracle) but gathers across devices; 'contiguous' is shard-local —
    its compiled HLO must contain NO collectives when group_size divides the
    per-device batch.'''
    from animeface_tpu.implementations.StyleGAN2.model import MiniBatchStdDev

    mesh = make_mesh((8,))
    N, H, W, C, G = 32, 4, 4, 8, 4          # per-device batch 4, G=4
    x_np = np.random.default_rng(0).normal(size=(N, H, W, C)).astype(np.float32)

    def oracle(x, grouping):
        if grouping == 'strided':
            y = x.reshape(G, N // G, H, W, C)
            y = y - y.mean(axis=0, keepdims=True)
            y = np.sqrt((y * y).mean(axis=0) + 1e-4)
            stat = y.mean(axis=(1, 2, 3))               # [N/G]
            stat = np.tile(stat, G)                     # torch .repeat = tile
        else:
            y = x.reshape(N // G, G, H, W, C)
            y = y - y.mean(axis=1, keepdims=True)
            y = np.sqrt((y * y).mean(axis=1) + 1e-4)
            stat = y.mean(axis=(1, 2, 3))
            stat = np.repeat(stat, G)
        return stat

    for grouping in ('strided', 'contiguous'):
        m = MiniBatchStdDev(group_size=G, grouping=grouping)
        fn = jax.jit(lambda v: m.apply({}, v))
        xs = shard_batch(jnp.asarray(x_np), mesh)
        lowered = fn.lower(xs)
        hlo = lowered.compile().as_text()
        y = np.asarray(fn(xs))
        np.testing.assert_allclose(y[:, 0, 0, -1], oracle(x_np, grouping),
                                   rtol=1e-5, atol=1e-6, err_msg=grouping)
        has_collective = any(op in hlo for op in
                             ('all-gather', 'all-to-all', 'collective-permute',
                              'all-reduce'))
        if grouping == 'contiguous':
            assert not has_collective, \
                'contiguous mbsd must be communication-free under dp'


def test_model_axis_tensor_parallel_matches_dp():
    '''The 'model' mesh axis (VERDICT r1 item 10): a StyleGAN2 train step on
    a (4, 2) dp x tp mesh — wide kernels output-feature-sharded via
    model_sharding — must produce the same metrics as pure dp, and the
    placement must actually shard something.'''
    from animeface_tpu.utils import EasyDict
    from animeface_tpu.nnutils import KeyGen
    from animeface_tpu.nnutils.loss import NonSaturatingLoss
    from animeface_tpu.implementations.StyleGAN2.utils import (
        build_models, build_train_step, make_optimizers)
    from animeface_tpu.parallel import MODEL_AXIS

    args = EasyDict(
        image_size=32, image_channels=3, style_dim=32, channels=8,
        max_channels=32, block_num_conv=2, map_num_layers=2, map_lr=0.01,
        disable_map_norm=False, mbsd_groups=2, lr=1e-3, beta1=0.0, beta2=0.99,
        g_k=8, d_k=16, r1_lambda=10.0, pl_lambda=2.0, policy='color',
    )

    def run(accel):
        keys = KeyGen(0)
        G, D = build_models(args, accel.compute_dtype)
        g_vars = G.init({'params': keys(), 'noise': keys(), 'mixing': keys()},
                        jnp.zeros((1, args.style_dim)))
        d_vars = D.init(keys(), jnp.zeros((1, 32, 32, 3)))
        g_tx, d_tx = make_optimizers(args)
        state = dict(
            rng=keys(), G=g_vars['params'], D=d_vars['params'],
            G_ema=jax.tree_util.tree_map(jnp.copy, g_vars['params']),
            g_opt=g_tx.init(g_vars['params']), d_opt=d_tx.init(d_vars['params']),
            pl_mean=jnp.float32(0.0), step=jnp.int32(0),
        )
        step = accel.jit_step(build_train_step(
            G, D, g_tx, d_tx, NonSaturatingLoss(), args.policy, 10.0, 2.0,
            16, 8, 0.999, do_r1=False, do_pl=False), donate_state=False)
        state = accel.prepare(state)
        batch = accel.shard_batch(
            jax.random.normal(KeyGen(7)(), (8, 32, 32, 3)))
        new_state, metrics = step(state, batch)
        jax.block_until_ready(new_state)
        return state, {k: float(v) for k, v in metrics.items()}

    accel_dp = Accelerator(mesh_shape=(8,), bf16=False)
    _, m_dp = run(accel_dp)

    accel_tp = Accelerator(mesh_shape=(4, 2), bf16=False, tp_min_features=16)
    assert MODEL_AXIS in accel_tp.mesh.axis_names
    state_tp, m_tp = run(accel_tp)

    # placement check: at least one kernel leaf is actually sharded on the
    # model axis (not fully replicated)
    sharded = [
        leaf for leaf in jax.tree_util.tree_leaves(state_tp['G'])
        if hasattr(leaf, 'sharding') and not leaf.sharding.is_fully_replicated
    ]
    assert sharded, 'tp mesh placed nothing on the model axis'

    for k in m_dp:
        assert abs(m_dp[k] - m_tp[k]) < 1e-3, (k, m_dp[k], m_tp[k])
