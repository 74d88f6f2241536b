'''Accelerator: mesh placement + bf16 policy + jitted-step builder.

TPU-native successor of the reference `MiniAccelerator`
(`nnutils/accelerate.py:134`): where the reference wrapped model/optimizer/
dataloader objects to inject `.to(device)` and GradScaler AMP, here training
state is a pytree, the mesh handles placement, and bf16-on-TPU needs no loss
scaling — so the scaler plumbing collapses entirely. `prepare`, `backward`,
`autocast`, `update` survive as thin compatibility shims; the real API is
`jit_step` + `shard_batch` + `cast`.
'''

from __future__ import annotations

import contextlib
from functools import partial

import jax
import jax.numpy as jnp

from animeface_tpu.parallel import (
    make_mesh, data_sharding, replicated, shard_batch as _shard_batch,
    replicate as _replicate, prefetch_to_device, model_sharding,
    activation_sharding, spatial_activation_sharding,
)


class Accelerator:
    '''Holds the device mesh and precision policy; builds jitted train steps.

    >>> accel = Accelerator(mesh_shape=(-1,), bf16=True)
    >>> step = accel.jit_step(train_step)         # donates state, shards batch
    >>> state = accel.prepare(state)              # replicate once
    >>> for batch in accel.iter_loader(loader):   # sharded, prefetched
    ...     state, metrics = step(state, batch)
    '''

    def __init__(self, mesh_shape=(-1,), bf16: bool = True, devices=None,
                 axis_names=None, tp_min_features: int = 256):
        '''axis_names: override mesh axes, e.g. ('data', 'spatial') to shard
        image H across devices in addition to the batch axis. A 2-entry
        mesh_shape with default names is ('data', 'model'): params whose
        output-feature dim is >= tp_min_features are tensor-parallelized
        over the model axis (see parallel.model_sharding).'''
        self.mesh = make_mesh(mesh_shape, axis_names=axis_names,
                              devices=devices)
        self.bf16 = bf16
        self.tp_min_features = tp_min_features

    @property
    def compute_dtype(self):
        return jnp.bfloat16 if self.bf16 else jnp.float32

    @property
    def num_devices(self) -> int:
        return self.mesh.devices.size

    # ---- state / data placement ----

    def prepare(self, *trees):
        '''Place training state across the mesh (reference prepare):
        replicated under pure DP; with a >1 'model' axis, wide layers are
        tensor-parallelized (parallel.model_sharding).'''
        out = tuple(model_sharding(t, self.mesh,
                                   min_features=self.tp_min_features)
                    for t in trees)
        return out[0] if len(out) == 1 else out

    def shard_batch(self, batch):
        return _shard_batch(batch, self.mesh)

    def iter_loader(self, loader, prefetch: int = 2):
        yield from prefetch_to_device(loader, self.mesh, size=prefetch)

    def cast(self, tree):
        '''Cast array leaves to the compute dtype (AMP replacement).'''
        dt = self.compute_dtype
        return jax.tree_util.tree_map(
            lambda x: x.astype(dt) if jnp.issubdtype(x.dtype, jnp.floating) else x,
            tree)

    # ---- step compilation ----

    def jit_step(self, fn, donate_state: bool = True, static_argnums=()):
        '''jit `fn(state, batch, ...) -> (state, metrics)` over the mesh.

        State is replicated, batch sharded on its leading axis; XLA inserts
        the cross-device gradient psums. State donation reuses buffers.

        On a mesh with a 'spatial' axis the step traces inside an
        `activation_sharding` context so `parallel.constrain_spatial` seams
        in the models pin NHWC activations to (data, spatial) — without
        them G's activations (built up from a replicated latent) never
        H-shard and sp buys no memory.
        '''
        act_sharding = spatial_activation_sharding(self.mesh)
        if act_sharding is not None:
            inner = fn

            def fn(*a, **k):
                with activation_sharding(act_sharding):
                    return inner(*a, **k)

        return jax.jit(
            fn,
            donate_argnums=(0,) if donate_state else (),
            static_argnums=static_argnums,
        )

    def jit(self, fn, **kwargs):
        return jax.jit(fn, **kwargs)

    # ---- reference-API compatibility shims ----

    def backward(self, loss):
        raise RuntimeError(
            'Accelerator.backward does not exist under JAX: compute gradients '
            'with jax.grad inside the jitted step (see implementations/GAN).')

    @contextlib.contextmanager
    def autocast(self):
        # precision is a property of the module dtypes, not a context
        yield

    def update(self):
        pass

    def free_memory(self):
        for d in jax.devices():
            try:
                d.synchronize_all_activity()
            except Exception:
                pass


# Reference-name alias (`nnutils/accelerate.py:134`)
MiniAccelerator = Accelerator
