'''WGAN-gp (reference `implementations/WGAN_gp/utils.py`): the gradient-penalty
double-backward path. The penalty is an inner `jax.grad` w.r.t. the
interpolated input; the outer step `jax.grad` differentiates through it —
natively arbitrary-order (the capability torch needed conv2d_gradfix for).
Per-sample interpolation alpha matches the recipe's local penalty
(utils.py:69-90; unlike nnutils' shared-alpha variant). Adam(5e-5, 0.5, 0.999),
gp_gamma=10, n_critic=5.

Note: the penalty's inner grad flows through D's BatchNorm in train mode with
frozen batch statistics (functional apply), sidestepping torch's BN-double-
backward pitfalls.
'''

from __future__ import annotations

import jax
import jax.numpy as jnp
import optax

from animeface_tpu.implementations.DCGAN.model import Generator, Discriminator
from animeface_tpu.utils import add_args, save_args
from animeface_tpu.nnutils import KeyGen, sample_nnoise, sample_unoise
from animeface_tpu.nnutils.accelerate import Accelerator
from animeface_tpu.nnutils.loss import WGANLoss
from animeface_tpu.nnutils.trainer import run_training, host_step_counter
from animeface_tpu.dataset import build_loader


def per_sample_gradient_penalty(key, real, fake, d_apply):
    '''alpha ~ U[0,1] per sample; E[(||∇_x D(x̂)||₂ − 1)²].'''
    alpha = sample_unoise(key, (real.shape[0], 1, 1, 1))
    x_hat = real * alpha + fake * (1.0 - alpha)

    def summed(x):
        return jnp.sum(d_apply(x).astype(jnp.float32))
    grads = jax.grad(summed)(x_hat.astype(jnp.float32))
    g = grads.reshape(grads.shape[0], -1)
    norm = jnp.sqrt(jnp.sum(g * g, axis=1) + 1e-12)
    return jnp.mean((norm - 1.0) ** 2)


def build_steps(G, D, g_tx, d_tx, loss, gp_gamma):

    def d_phase(state, real):
        rng, zkey, akey = jax.random.split(state['rng'], 3)
        z = sample_nnoise(zkey, (real.shape[0], G.latent_dim))
        fake, g_mut = G.apply(state['G'], z, train=True, mutable=['batch_stats'])
        fake_sg = jax.lax.stop_gradient(fake)

        def d_loss_fn(d_params):
            d_vars = {'params': d_params, 'batch_stats': state['D']['batch_stats']}
            real_prob, d_mut = D.apply(d_vars, real, train=True,
                                       mutable=['batch_stats'])
            fake_prob, d_mut = D.apply({'params': d_params, **d_mut}, fake_sg,
                                       train=True, mutable=['batch_stats'])
            adv = loss.d_loss(real_prob, fake_prob)
            # penalty D uses the *current* params with frozen batch stats
            def d_apply(x):
                out, _ = D.apply({'params': d_params, **d_mut}, x,
                                 train=True, mutable=['batch_stats'])
                return out
            gp = per_sample_gradient_penalty(akey, real, fake_sg, d_apply)
            return adv + gp * gp_gamma, d_mut

        (d_loss, d_mut), d_grads = jax.value_and_grad(d_loss_fn, has_aux=True)(
            state['D']['params'])
        d_up, d_opt = d_tx.update(d_grads, state['d_opt'], state['D']['params'])
        d_params = optax.apply_updates(state['D']['params'], d_up)
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

    betas = (args.beta1, args.beta2)
    g_tx = optax.adam(args.lr, b1=betas[0], b2=betas[1])
    d_tx = optax.adam(args.lr, b1=betas[0], b2=betas[1])
    state = dict(rng=keys(), G=g_vars, D=d_vars,
                 g_opt=g_tx.init(g_vars['params']),
                 d_opt=d_tx.init(d_vars['params']), step=jnp.int32(0))

    critic_step, full_step = build_steps(G, D, g_tx, d_tx, WGANLoss(),
                                         args.gp_gamma)
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
        name='WGAN_gp', args=args, accel=accel, state=state, loader=loader,
        train_step=train_step, sample_fn=sample_fn,
        max_iters=max_iters, save_interval=args.save, nrow=5,
        ema_params_path=lambda s: s['G'],
    )


def main(parser):
    parser = add_args(parser, dict(
        epochs=[150, 'epochs to train'],
        latent_dim=[200, 'dimension of input latent'],
        lr=[5e-5, 'learning rate for both G and D'],
        beta1=[0.5, 'beta1'],
        beta2=[0.999, 'beta2'],
        n_critic=[5, 'train G only every n_critic steps'],
        gp_gamma=[10., 'gamma for gradient penalty'],
    ))
    args = parser.parse_args()
    save_args(args)

    loader = build_loader(args, 'image')
    max_iters = args.max_iters if args.max_iters >= 0 else len(loader) * args.epochs
    train(args, max_iters, loader)
