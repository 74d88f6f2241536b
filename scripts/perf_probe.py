'''Component-level timing for the StyleGAN2-256 train step on the local chip.

Usage: python scripts/perf_probe.py [batch] [image_size] [reps]
Times each phase of the adversarial step in isolation (jitted, donated where
safe) using concrete-value fetches for sync (axon's block_until_ready returns
early). Numbers are ms per call.
'''

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import optax

jax.config.update('jax_compilation_cache_dir', '/tmp/animeface_jax_cache')
jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)

from animeface_tpu.utils import EasyDict
from animeface_tpu.nnutils.accelerate import Accelerator
from animeface_tpu.nnutils import KeyGen, sample_nnoise, update_ema
from animeface_tpu.nnutils.loss import NonSaturatingLoss
from animeface_tpu.nnutils.diffaugment import diff_augment
from animeface_tpu.implementations.StyleGAN2.utils import (
    build_models, make_optimizers,
)
from animeface_tpu.implementations.StyleGAN2.model import Generator


def timeit(fn, *args, reps=20):
    out = fn(*args)
    jax.tree_util.tree_map(
        lambda x: float(jnp.sum(x).astype(jnp.float32)) if hasattr(x, 'dtype')
        else x, jax.tree_util.tree_leaves(out)[:1])
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    leaf = jax.tree_util.tree_leaves(out)[0]
    float(jnp.sum(leaf).astype(jnp.float32))
    return (time.perf_counter() - t0) / reps * 1e3


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    S = int(sys.argv[2]) if len(sys.argv) > 2 else 256
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 20

    args = EasyDict(
        image_size=S, image_channels=3, style_dim=512, channels=32,
        max_channels=512, block_num_conv=2, map_num_layers=8, map_lr=0.01,
        disable_map_norm=False, mbsd_groups=4, lr=1e-3, beta1=0.0, beta2=0.99,
        g_k=8, d_k=16, r1_lambda=10.0, pl_lambda=2.0,
        policy='color,translation', mesh=[-1], no_bf16=False, seed=0,
    )
    accel = Accelerator(mesh_shape=(-1,), bf16=True)
    keys = KeyGen(0)
    G, D = build_models(args, accel.compute_dtype)
    g_vars = G.init({'params': keys(), 'noise': keys(), 'mixing': keys()},
                    jnp.zeros((1, args.style_dim)))
    d_vars = D.init(keys(), jnp.zeros((1, S, S, 3)))
    g_params, d_params = g_vars['params'], d_vars['params']
    g_tx, d_tx = make_optimizers(args)
    g_opt, d_opt = g_tx.init(g_params), d_tx.init(d_params)
    loss = NonSaturatingLoss()

    real = jax.random.normal(keys(), (B, S, S, 3))
    z = sample_nnoise(keys(), (B, args.style_dim))
    k = {'noise': keys(), 'mixing': keys()}
    ak = keys()

    @jax.jit
    def g_fwd(g_params, z):
        fake, _ = G.apply({'params': g_params}, z, rngs=k)
        return fake

    fake = g_fwd(g_params, z)

    @jax.jit
    def d_fwd(d_params, img):
        return D.apply({'params': d_params}, img)

    @jax.jit
    def d_fwd2(d_params, a, b):
        return (D.apply({'params': d_params}, a),
                D.apply({'params': d_params}, b))

    @jax.jit
    def d_fwd2_vmap(d_params, a, b):
        return jax.vmap(lambda img: D.apply({'params': d_params}, img))(
            jnp.stack([a, b]))

    @jax.jit
    def augment(key, img):
        return diff_augment(key, img, args.policy)

    @jax.jit
    def d_phase(d_params, d_opt, real, fake):
        def d_loss_fn(p):
            rp = D.apply({'params': p}, diff_augment(ak, real, args.policy))
            fp = D.apply({'params': p}, diff_augment(ak, fake, args.policy))
            return loss.d_loss(rp, fp)
        d_loss, grads = jax.value_and_grad(d_loss_fn)(d_params)
        up, d_opt = d_tx.update(grads, d_opt, d_params)
        return optax.apply_updates(d_params, up), d_opt, d_loss

    @jax.jit
    def d_phase_vmap(d_params, d_opt, real, fake):
        def d_loss_fn(p):
            both = jax.vmap(lambda img: D.apply(
                {'params': p}, diff_augment(ak, img, args.policy)))(
                jnp.stack([real, fake]))
            return loss.d_loss(both[0], both[1])
        d_loss, grads = jax.value_and_grad(d_loss_fn)(d_params)
        up, d_opt = d_tx.update(grads, d_opt, d_params)
        return optax.apply_updates(d_params, up), d_opt, d_loss

    @jax.jit
    def g_phase(g_params, g_opt, d_params, z):
        def g_loss_fn(p):
            fake, _ = G.apply({'params': p}, z, rngs=k)
            fp = D.apply({'params': d_params},
                         diff_augment(ak, fake, args.policy))
            return loss.g_loss(fp)
        g_loss, grads = jax.value_and_grad(g_loss_fn)(g_params)
        up, g_opt = g_tx.update(grads, g_opt, g_params)
        return optax.apply_updates(g_params, up), g_opt, g_loss

    @jax.jit
    def ema(g, e):
        return update_ema(g, e, 0.999)

    @jax.jit
    def mapping(g_params, z):
        return G.apply({'params': g_params}, z, method=Generator.map_w)

    print(f'--- batch {B}, {S}px, bf16 (ms/call) ---')
    print(f'G fwd           : {timeit(g_fwd, g_params, z, reps=reps):8.2f}')
    print(f'mapping only    : {timeit(mapping, g_params, z, reps=reps):8.2f}')
    print(f'D fwd           : {timeit(d_fwd, d_params, real, reps=reps):8.2f}')
    print(f'D fwd x2 (2call): {timeit(d_fwd2, d_params, real, fake, reps=reps):8.2f}')
    print(f'D fwd x2 (vmap) : {timeit(d_fwd2_vmap, d_params, real, fake, reps=reps):8.2f}')
    print(f'diffaugment     : {timeit(augment, ak, real, reps=reps):8.2f}')
    print(f'D phase         : {timeit(d_phase, d_params, d_opt, real, fake, reps=reps):8.2f}')
    print(f'D phase (vmap)  : {timeit(d_phase_vmap, d_params, d_opt, real, fake, reps=reps):8.2f}')
    print(f'G phase         : {timeit(g_phase, g_params, g_opt, d_params, z, reps=reps):8.2f}')
    print(f'EMA             : {timeit(ema, g_params, g_params, reps=reps):8.2f}')


if __name__ == '__main__':
    main()
