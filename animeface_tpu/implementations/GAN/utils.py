'''Vanilla GAN training recipe (reference `implementations/GAN/utils.py`).

The two optimizer phases run inside ONE jitted step: D update on
stop-gradiented fakes, then G update against the freshly-updated D (matching
the reference's optimizer_D.step()-before-G ordering). Data parallelism,
bf16 compute, and checkpoint-resume come from the shared runtime.
'''

from __future__ import annotations

import jax
import jax.numpy as jnp
import optax

from animeface_tpu.implementations.GAN.model import Generator, Discriminator
from animeface_tpu.utils import add_args, save_args
from animeface_tpu.nnutils import KeyGen, sample_nnoise
from animeface_tpu.nnutils.accelerate import Accelerator
from animeface_tpu.nnutils.loss import GANLoss
from animeface_tpu.nnutils.trainer import run_training, default_max_iters
from animeface_tpu.dataset import build_loader


def build_train_step(G, D, g_tx, d_tx, loss):
    '''jitted (state, real) -> (state, metrics). state is a plain dict pytree.'''

    def train_step(state, real):
        rng, zkey = jax.random.split(state['rng'])
        z = sample_nnoise(zkey, (real.shape[0], G.latent_dim))

        g_vars = state['G']
        fake, g_mut = G.apply(g_vars, z, train=True, mutable=['batch_stats'])

        # ---- D phase (fake detached) ----
        def d_loss_fn(d_params):
            real_prob = D.apply({'params': d_params}, real)
            fake_prob = D.apply({'params': d_params}, jax.lax.stop_gradient(fake))
            return loss.d_loss(real_prob, fake_prob)

        d_loss, d_grads = jax.value_and_grad(d_loss_fn)(state['D']['params'])
        d_up, d_opt = d_tx.update(d_grads, state['d_opt'], state['D']['params'])
        d_params = optax.apply_updates(state['D']['params'], d_up)

        # ---- G phase (against updated D; reference optimizer order) ----
        def g_loss_fn(g_params):
            fake2, _ = G.apply({'params': g_params, **g_mut}, z,
                               train=True, mutable=['batch_stats'])
            fake_prob = D.apply({'params': d_params}, fake2)
            return loss.g_loss(fake_prob)

        g_loss, g_grads = jax.value_and_grad(g_loss_fn)(g_vars['params'])
        g_up, g_opt = g_tx.update(g_grads, state['g_opt'], g_vars['params'])
        g_params = optax.apply_updates(g_vars['params'], g_up)

        new_state = dict(
            rng=rng,
            G={'params': g_params, **g_mut},
            D={'params': d_params},
            g_opt=g_opt, d_opt=d_opt,
            step=state['step'] + 1,
        )
        return new_state, dict(d=d_loss, g=g_loss)

    return train_step


def train(args, max_iters, loader, latent_dim, save_interval):
    accel = Accelerator(mesh_shape=tuple(args.mesh), bf16=not args.no_bf16)
    keys = KeyGen(args.seed)
    image_shape = (args.image_size, args.image_size, 3)

    G = Generator(latent_dim=latent_dim, image_shape=image_shape,
                  dtype=accel.compute_dtype)
    D = Discriminator(image_shape=image_shape, dtype=accel.compute_dtype)

    g_vars = G.init(keys(), jnp.zeros((1, latent_dim)), train=True)
    d_vars = D.init(keys(), jnp.zeros((1,) + image_shape))

    g_tx = optax.adam(1e-3, b1=0.9, b2=0.999)   # reference uses Adam defaults
    d_tx = optax.adam(1e-3, b1=0.9, b2=0.999)

    state = dict(
        rng=keys(),
        G=g_vars, D=d_vars,
        g_opt=g_tx.init(g_vars['params']),
        d_opt=d_tx.init(d_vars['params']),
        step=jnp.int32(0),
    )

    loss = GANLoss()
    train_step = accel.jit_step(build_train_step(G, D, g_tx, d_tx, loss))

    const_z = sample_nnoise(keys(), (16, latent_dim))

    @jax.jit
    def sample_fn(state):
        return G.apply(state['G'], const_z, train=False)

    return run_training(
        name='GAN', args=args, accel=accel, state=state, loader=loader,
        train_step=train_step, sample_fn=sample_fn,
        max_iters=max_iters, save_interval=save_interval,
        ema_params_path=lambda s: s['G'],
    )


def main(parser):
    parser = add_args(parser, {'latent-dim': [100, 'input latent dim']})
    args = parser.parse_args()
    save_args(args)

    loader = build_loader(args, 'image')
    max_iters = default_max_iters(args, loader)

    train(args, max_iters, loader, args.latent_dim, args.save)
