'''Device mesh and sharding helpers.

TPU-native replacement for the reference's single-device placement
(`nnutils/accelerate.py` explicitly documents "NOT implemented: ... TPU,
Multi-device", :5-16). Data parallelism over ICI is expressed as a
`jax.sharding.Mesh` with a leading 'data' axis; params live replicated, the
batch axis is sharded, and XLA inserts the psum gradient reductions
(replacing DDP/NCCL allreduce, SURVEY.md §2.5).

An optional trailing 'model' axis tensor-parallelizes the widest layers:
`model_sharding` places the output-feature dim of large kernels over it
(Megatron-style TP via GSPMD propagation — activations after a sharded-output
conv carry a sharded C axis; the next contraction psums over ICI). Enable
with `--mesh dp model`, e.g. `--mesh 4 2`. Shipped configs default to pure
DP; TP pays at >512px widths where per-chip HBM or conv FLOPs bind.
'''

from __future__ import annotations

import contextlib
from functools import partial
from typing import Iterable

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = 'data'
MODEL_AXIS = 'model'
SPATIAL_AXIS = 'spatial'

# Activation-sharding seam for spatial parallelism. A generator's synthesis
# stack starts from a REPLICATED latent, so GSPMD has no H-sharded operand to
# propagate from — without explicit constraints every G activation (and its
# saved-for-backward copy) stays replicated over the 'spatial' axis and sp
# buys no activation memory. `Accelerator.jit_step` pushes the mesh's spatial
# sharding here while the step traces; model code calls `constrain_spatial`
# at block seams (identity when no spatial axis is active — pure-dp traces
# are bit-identical to before).
_ACTIVATION_SHARDING: list = [None]


@contextlib.contextmanager
def activation_sharding(sharding):
    _ACTIVATION_SHARDING.append(sharding)
    try:
        yield
    finally:
        _ACTIVATION_SHARDING.pop()


def spatial_activation_sharding(mesh: Mesh):
    '''The [B,H,W,C] activation sharding for a mesh with a spatial axis
    (None otherwise): batch over 'data', image H over 'spatial'.'''
    if SPATIAL_AXIS not in mesh.axis_names:
        return None
    return NamedSharding(mesh, P(DATA_AXIS, SPATIAL_AXIS))


def constrain_spatial(x):
    '''Constrain an NHWC activation to the active spatial sharding (no-op
    outside an `activation_sharding` context or for non-4D values).'''
    s = _ACTIVATION_SHARDING[-1]
    if s is None or getattr(x, 'ndim', 0) != 4:
        return x
    return jax.lax.with_sharding_constraint(x, s)


def make_mesh(shape=(-1,), axis_names=None, devices=None) -> Mesh:
    '''Build a Mesh; a single -1 entry absorbs the remaining device count.'''
    devices = list(devices if devices is not None else jax.devices())
    shape = list(shape)
    if axis_names is None:
        axis_names = (DATA_AXIS, MODEL_AXIS)[:len(shape)] or (DATA_AXIS,)
    n = len(devices)
    neg = [i for i, s in enumerate(shape) if s == -1]
    assert len(neg) <= 1, 'at most one -1 in mesh shape'
    if neg:
        known = int(np.prod([s for s in shape if s != -1])) if len(shape) > 1 else 1
        assert n % known == 0, f'{n} devices not divisible by {known}'
        shape[neg[0]] = n // known
    want = int(np.prod(shape))
    assert want <= n, f'mesh {shape} needs {want} devices, have {n}'
    dev_array = np.asarray(devices[:want]).reshape(shape)
    return Mesh(dev_array, tuple(axis_names))


def data_sharding(mesh: Mesh, ndim: int = 4) -> NamedSharding:
    '''Shard the leading (batch) axis over the data axis; when the mesh has
    a 'spatial' axis, NHWC image batches additionally shard H over it
    (spatial parallelism for >512px synthesis — GSPMD inserts the halo
    exchanges for convolutions, the image-domain analogue of ring
    attention; SURVEY.md §5).'''
    spec = [None] * ndim
    spec[0] = DATA_AXIS
    if SPATIAL_AXIS in mesh.axis_names and ndim >= 3:
        spec[1] = SPATIAL_AXIS
    return NamedSharding(mesh, P(*spec))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh):
    '''Host array(s) -> device array(s) sharded on the batch axis.

    Multi-host: each process holds only its 1/process_count slice of the
    global batch (the loader's process shard); the global jax.Array is
    assembled from the per-process local slices without any cross-host
    data movement (`jax.make_array_from_process_local_data`).'''
    multiprocess = jax.process_count() > 1

    def put(x):
        sharding = data_sharding(mesh, np.ndim(x))
        if multiprocess:
            return jax.make_array_from_process_local_data(
                sharding, np.asarray(x))
        return jax.device_put(x, sharding)
    return jax.tree_util.tree_map(put, batch)


def replicate(tree, mesh: Mesh):
    '''Place a pytree replicated across the mesh.'''
    sh = replicated(mesh)
    return jax.tree_util.tree_map(partial(jax.device_put, device=sh), tree)


#: path-component names eligible for output-feature sharding. Keying on the
#: parameter-tree path (not just shape) keeps replicate-intended buffers —
#: const inputs, moment EMAs, any future large state entry — off the model
#: axis instead of silently paying GSPMD resharding collectives.
_TP_PARAM_NAMES = ('kernel', 'bias', 'weight', 'scale', 'embedding')


def model_sharding(tree, mesh: Mesh, min_features: int = 256):
    '''Tensor-parallel placement over the 'model' axis (Megatron-style).

    Leaves shard their last dim over MODEL_AXIS when BOTH hold:
      * the leaf's tree path ends in a parameter-like name
        (`_TP_PARAM_NAMES`: conv/dense kernels, biases, norm scales) —
        optimizer and EMA trees mirror param names, so they follow the same
        placement;
      * the last dim is >= min_features, divisible by the model-axis size,
        and floating-point.
    Everything else replicates. GSPMD propagates the rest: forward
    activations carry a sharded channel axis, contractions over it insert
    the psum, gradients mirror the placement.

    Falls back to full replication when the mesh has no model axis (or it
    has size 1), so callers can apply it unconditionally.
    '''
    if MODEL_AXIS not in mesh.axis_names or mesh.shape[MODEL_AXIS] == 1:
        return replicate(tree, mesh)
    m = mesh.shape[MODEL_AXIS]
    repl = replicated(mesh)

    def leaf_name(path):
        for entry in reversed(path):
            name = getattr(entry, 'key', getattr(entry, 'name', None))
            if isinstance(name, str):
                return name
        return ''

    def place(path, x):
        shape = getattr(x, 'shape', ())
        dtype = getattr(x, 'dtype', None)
        if (leaf_name(path) in _TP_PARAM_NAMES
                and len(shape) >= 1 and shape[-1] >= min_features
                and shape[-1] % m == 0 and dtype is not None
                and jax.numpy.issubdtype(dtype, jax.numpy.floating)):
            spec = [None] * (len(shape) - 1) + [MODEL_AXIS]
            return jax.device_put(x, NamedSharding(mesh, P(*spec)))
        return jax.device_put(x, repl)

    return jax.tree_util.tree_map_with_path(place, tree)


_DEQUANT = None


def dequantize_images(batch):
    '''Device-side inverse of the loaders' uint8 transfer encoding: any
    4-D uint8 leaf is a [0,255] image batch -> float32 in [-1,1] (the
    framework-wide image convention, dataset/_base.py:6). Leaves of other
    dtypes/ranks pass through. Jitted once, donates the uint8 buffer.'''
    global _DEQUANT
    if _DEQUANT is None:
        import jax.numpy as jnp

        def deq(x):
            if x.dtype == jnp.uint8 and x.ndim == 4:
                return x.astype(jnp.float32) / 127.5 - 1.0
            return x

        _DEQUANT = jax.jit(lambda b: jax.tree_util.tree_map(deq, b),
                           donate_argnums=0)
    return _DEQUANT(batch)


def _has_uint8_images(batch) -> bool:
    import jax.numpy as jnp
    return any(getattr(x, 'dtype', None) == jnp.uint8
               and getattr(x, 'ndim', 0) == 4
               for x in jax.tree_util.tree_leaves(batch))


def prefetch_to_device(iterator: Iterable, mesh: Mesh, size: int = 2):
    '''Overlap host->device transfer with compute: keep `size` sharded batches
    in flight (replacement for DataLoader pin_memory + non-blocking copies).

    Batches carrying uint8 image leaves (DataLoader(transfer_dtype='uint8'))
    are dequantized to the [-1,1] float convention ON DEVICE after the copy,
    so the host link moves 4x fewer bytes and train steps see the usual
    float batches.'''
    import collections
    buf = collections.deque()
    it = iter(iterator)

    def put(b):
        b = shard_batch(b, mesh)
        return dequantize_images(b) if _has_uint8_images(b) else b

    try:
        while True:
            while len(buf) < size:
                buf.append(put(next(it)))
            yield buf.popleft()
    except StopIteration:
        while buf:
            yield buf.popleft()


def find_replica_drift(tree, atol: float = 0.0) -> str | None:
    '''Return a description of the first drifted replicated leaf, or None.

    The intent of the reference's dormant `check_ddp_consistency`
    (thirdparty/stylegan2_ops/misc.py:175-187) — but actually wired into the
    training path (trainer.save_snapshot) rather than vendored-and-unused.
    Leaves that are deliberately NOT fully replicated (tensor-parallel kernel
    shards, sharded batches) are skipped: their shards differ by design.
    '''
    for path, leaf in jax.tree_util.tree_leaves_with_path(tree):
        if not isinstance(leaf, jax.Array):
            continue
        sharding = getattr(leaf, 'sharding', None)
        if sharding is None or not sharding.is_fully_replicated:
            continue
        shards = leaf.addressable_shards
        if len(shards) < 2:
            continue
        base = np.asarray(shards[0].data)
        for s in shards[1:]:
            data = np.asarray(s.data)
            if not np.allclose(base, data, atol=atol, equal_nan=True):
                err = float(np.max(np.abs(
                    data.astype(np.float64) - base.astype(np.float64))))
                return (f'{jax.tree_util.keystr(path)}: device '
                        f'{s.device} diverges from device '
                        f'{shards[0].device} (max |delta| = {err:g})')
    return None


def check_replica_consistency(tree, mesh: Mesh = None, atol: float = 0.0) -> bool:
    '''Boolean form of `find_replica_drift` (reference
    `check_ddp_consistency`, thirdparty/stylegan2_ops/misc.py:175).'''
    return find_replica_drift(tree, atol=atol) is None


def assert_replica_consistency(tree, name: str = '', atol: float = 0.0) -> None:
    '''Raise loudly when replicated state has drifted across devices.

    Called at checkpoint cadence by the shared trainer so silent replica
    divergence (a non-deterministic collective, a host-dependent branch)
    is caught when it happens, not when samples degrade.'''
    drift = find_replica_drift(tree, atol=atol)
    if drift is not None:
        raise RuntimeError(
            f'[{name}] replica consistency check FAILED at {drift}. '
            f'Replicated training state must be bit-identical on every '
            f'device; this run has diverged (non-deterministic op or '
            f'host-dependent branch?). Not checkpointing the drifted state.')
