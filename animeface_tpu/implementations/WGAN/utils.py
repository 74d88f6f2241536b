'''WGAN with weight clipping (reference `implementations/WGAN/utils.py`).

Model backbone is identical to DCGAN (reference WGAN/model.py diffs only in
whitespace), so the DCGAN Flax modules are reused. RMSprop(5e-5), clip 0.01,
n_critic=5. The critic-only vs critic+G phases are two separately-compiled
jitted steps selected host-side by `index % n_critic` (the reference's branch,
avoiding wasted G computation inside a lax.cond).
'''

from __future__ import annotations

import jax
import jax.numpy as jnp
import optax

from animeface_tpu.implementations.DCGAN.model import Generator, Discriminator
from animeface_tpu.utils import add_args, save_args
from animeface_tpu.nnutils import KeyGen, sample_nnoise
from animeface_tpu.nnutils.accelerate import Accelerator
from animeface_tpu.nnutils.loss import WGANLoss
from animeface_tpu.nnutils.trainer import (
    run_training, default_max_iters, host_step_counter)
from animeface_tpu.dataset import build_loader


def clip_tree(tree, clip_value: float):
    return jax.tree_util.tree_map(
        lambda x: jnp.clip(x, -clip_value, clip_value), tree)


def build_steps(G, D, g_tx, d_tx, loss, clip_value):

    def d_phase(state, real):
        rng, zkey = jax.random.split(state['rng'])
        z = sample_nnoise(zkey, (real.shape[0], G.latent_dim))
        fake, g_mut = G.apply(state['G'], z, train=True, mutable=['batch_stats'])

        def d_loss_fn(d_params):
            d_vars = {'params': d_params, 'batch_stats': state['D']['batch_stats']}
            real_prob, d_mut = D.apply(d_vars, real, train=True,
                                       mutable=['batch_stats'])
            fake_prob, d_mut = D.apply({'params': d_params, **d_mut},
                                       jax.lax.stop_gradient(fake),
                                       train=True, mutable=['batch_stats'])
            return loss.d_loss(real_prob, fake_prob), d_mut

        (d_loss, d_mut), d_grads = jax.value_and_grad(d_loss_fn, has_aux=True)(
            state['D']['params'])
        d_up, d_opt = d_tx.update(d_grads, state['d_opt'], state['D']['params'])
        d_params = clip_tree(optax.apply_updates(state['D']['params'], d_up),
                             clip_value)
        state = dict(state, rng=rng, D={'params': d_params, **d_mut},
                     d_opt=d_opt, step=state['step'] + 1)
        return state, z, g_mut, d_loss

    def critic_step(state, real):
        state, _, _, d_loss = d_phase(state, real)
        return state, dict(d=d_loss, g=jnp.float32(0.0))

    def full_step(state, real):
        state, z, g_mut, d_loss = d_phase(state, real)

        def g_loss_fn(g_params):
            fake, _ = G.apply({'params': g_params, **g_mut}, z,
                              train=True, mutable=['batch_stats'])
            fake_prob, _ = D.apply(state['D'], fake, train=True,
                                   mutable=['batch_stats'])
            return loss.g_loss(fake_prob)

        g_loss, g_grads = jax.value_and_grad(g_loss_fn)(state['G']['params'])
        g_up, g_opt = g_tx.update(g_grads, state['g_opt'], state['G']['params'])
        g_params = optax.apply_updates(state['G']['params'], g_up)
        state = dict(state, G={'params': g_params, **g_mut}, g_opt=g_opt)
        return state, dict(d=d_loss, g=g_loss)

    return critic_step, full_step


def train(args, max_iters, loader):
    accel = Accelerator(mesh_shape=tuple(args.mesh), bf16=not args.no_bf16)
    keys = KeyGen(args.seed)

    G = Generator(latent_dim=args.latent_dim, image_size=args.image_size,
                  dtype=accel.compute_dtype)
    D = Discriminator(image_size=args.image_size, dtype=accel.compute_dtype)
    g_vars = G.init(keys(), jnp.zeros((1, args.latent_dim)), train=True)
    d_vars = D.init(keys(), jnp.zeros((1, args.image_size, args.image_size, 3)),
                    train=True)

    g_tx = optax.rmsprop(args.lr)
    d_tx = optax.rmsprop(args.lr)
    state = dict(rng=keys(), G=g_vars, D=d_vars,
                 g_opt=g_tx.init(g_vars['params']),
                 d_opt=d_tx.init(d_vars['params']), step=jnp.int32(0))

    critic_step, full_step = build_steps(G, D, g_tx, d_tx, WGANLoss(),
                                         args.clip_value)
    jit_critic = accel.jit_step(critic_step)
    jit_full = accel.jit_step(full_step)
    n_critic = args.n_critic
    next_index = host_step_counter()

    def train_step(state, batch):
        if (next_index(state) + 1) % n_critic == 0:
            return jit_full(state, batch)
        return jit_critic(state, batch)

    const_z = sample_nnoise(keys(), (25, args.latent_dim))

    @jax.jit
    def sample_fn(state):
        return G.apply(state['G'], const_z, train=False)

    return run_training(
        name='WGAN', args=args, accel=accel, state=state, loader=loader,
        train_step=train_step, sample_fn=sample_fn,
        max_iters=max_iters, save_interval=args.save, nrow=5,
        ema_params_path=lambda s: s['G'],
    )


def main(parser):
    parser = add_args(parser, dict(
        epochs=[150, 'epochs to train'],
        latent_dim=[200, 'dimension of input latent'],
        lr=[0.00005, 'learning rate'],
        n_critic=[5, 'update G only every n_critic steps'],
        clip_value=[0.01, 'clip weights to [-clip_value, clip_value]'],
    ))
    args = parser.parse_args()
    save_args(args)

    loader = build_loader(args, 'image')
    max_iters = args.max_iters if args.max_iters >= 0 else len(loader) * args.epochs
    train(args, max_iters, loader)
