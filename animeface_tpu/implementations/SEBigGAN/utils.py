'''SEBigGAN recipe (reference `implementations/original/SEBigGAN/utils.py`):
hinge loss + the consistency-regularization family over DiffAugment views
and latent perturbations (comment at reference :153-156):

    real_lambda > 0 only                -> CR
    real_lambda, fake_lambda > 0        -> bCR
    latent_* > 0 only                   -> zCR
    all > 0                             -> ICR (the defaults)

D sees D(x), D(T(x)), D(G(z)), D(T(G(z))), D(G(z+n)) and adds MSE
consistency between the paired logits; G maximizes D(T(G(z))) and SUBTRACTS
latent_g_lambda * MSE(G(z), G(z+n)) (diversity term, reference :80).
Orthogonal init, EMA G for sampling.'''

from __future__ import annotations

import jax
import jax.numpy as jnp
import optax

from animeface_tpu.implementations.SEBigGAN.model import Generator, Discriminator
from animeface_tpu.utils import add_args, save_args
from animeface_tpu.nnutils import KeyGen, sample_nnoise, update_ema
from animeface_tpu.nnutils.accelerate import Accelerator
from animeface_tpu.nnutils.diffaugment import diff_augment
from animeface_tpu.nnutils.initialize import apply_init
from animeface_tpu.nnutils.loss import HingeLoss
from animeface_tpu.nnutils.trainer import run_training, default_max_iters
from animeface_tpu.dataset import build_loader


def _mse(a, b):
    return jnp.mean((a - b) ** 2)


def build_train_step(G, D, g_tx, d_tx, loss, policy, lambdas, noise_sigma,
                     z_dim, ema_decay=0.999):
    real_l, fake_l, lat_d_l, lat_g_l = lambdas

    def train_step(state, real):
        rng, zkey, nkey, a1, a2 = jax.random.split(state['rng'], 5)
        B = real.shape[0]
        z = sample_nnoise(zkey, (B, z_dim))
        n = sample_nnoise(nkey, (B, z_dim)) * noise_sigma
        aug = (lambda k, x: diff_augment(k, x, policy)) if policy \
            else (lambda k, x: x)

        gv = {'params': state['G']['params'],
              'batch_stats': state['G']['batch_stats']}
        fake, g_mut = G.apply(gv, z, train=True, mutable=['batch_stats'])
        fake_n, g_mut = G.apply({'params': gv['params'], **g_mut}, z + n,
                                train=True, mutable=['batch_stats'])
        fake_aug = aug(a1, fake)
        real_aug = aug(a2, real)
        fake_sg, fake_aug_sg, fake_n_sg = map(
            jax.lax.stop_gradient, (fake, fake_aug, fake_n))

        def d_loss_fn(d_params):
            m = {'batch_stats': state['D']['batch_stats']}
            run = lambda img, m: D.apply({'params': d_params, **m}, img,
                                         train=True, mutable=['batch_stats'])
            real_prob, m = run(real, m)
            real_aug_prob, m = run(real_aug, m)
            fake_prob, m = run(fake_sg, m)
            fake_aug_prob, m = run(fake_aug_sg, m)
            fake_n_prob, m = run(fake_n_sg, m)
            d_loss = loss.d_loss(real_prob, fake_prob)
            if real_l > 0:
                d_loss = d_loss + _mse(real_aug_prob, real_prob) * real_l
            if fake_l > 0:
                d_loss = d_loss + _mse(fake_aug_prob, fake_prob) * fake_l
            if lat_d_l > 0:
                d_loss = d_loss + _mse(fake_n_prob, fake_prob) * lat_d_l
            return d_loss, m

        (d_loss, d_mut), d_grads = jax.value_and_grad(
            d_loss_fn, has_aux=True)(state['D']['params'])
        d_up, d_opt = d_tx.update(d_grads, state['d_opt'],
                                  state['D']['params'])
        d_params = optax.apply_updates(state['D']['params'], d_up)

        def g_loss_fn(g_params):
            gm = {'batch_stats': state['G']['batch_stats']}
            f, gm = G.apply({'params': g_params, **gm}, z, train=True,
                            mutable=['batch_stats'])
            f_n, gm = G.apply({'params': g_params, **gm}, z + n, train=True,
                              mutable=['batch_stats'])
            f_aug = aug(a1, f)
            (prob), _ = D.apply({'params': d_params, **d_mut}, f_aug,
                                train=True, mutable=['batch_stats'])
            g_loss = loss.g_loss(prob)
            if lat_g_l > 0:
                # reference SUBTRACTS this (diversity), utils.py:80
                g_loss = g_loss - _mse(f, f_n) * lat_g_l
            return g_loss, gm

        (g_loss, g_mut2), g_grads = jax.value_and_grad(
            g_loss_fn, has_aux=True)(state['G']['params'])
        g_up, g_opt = g_tx.update(g_grads, state['g_opt'],
                                  state['G']['params'])
        g_params = optax.apply_updates(state['G']['params'], g_up)

        new_G = {'params': g_params, **g_mut2}
        return dict(rng=rng, G=new_G,
                    D={'params': d_params, **d_mut},
                    G_ema=update_ema(new_G, state['G_ema'], ema_decay),
                    g_opt=g_opt, d_opt=d_opt, step=state['step'] + 1), \
            dict(d=jnp.nan_to_num(d_loss), g=jnp.nan_to_num(g_loss))

    return train_step


def train(args, max_iters, loader):
    accel = Accelerator(mesh_shape=tuple(args.mesh), bf16=not args.no_bf16)
    keys = KeyGen(args.seed)

    G = Generator(image_size=args.image_size, z_dim=args.z_dim,
                  deep=args.deep, channels=args.channels,
                  use_sn=not args.g_disable_sn, att_name=args.g_att_name,
                  act_name=args.g_act_name, norm_name=args.g_norm_name,
                  dtype=accel.compute_dtype)
    D = Discriminator(image_size=args.image_size, deep=args.deep,
                      channels=args.channels,
                      use_sn=not args.d_disable_sn, att_name=args.d_att_name,
                      act_name=args.d_act_name, dtype=accel.compute_dtype)

    g_vars = G.init(keys(), jnp.zeros((2, args.z_dim)), train=True)
    d_vars = D.init(keys(), jnp.zeros((2, args.image_size, args.image_size, 3)),
                    train=True)
    # reference: init_weight_ortho on both (utils.py:186-187)
    g_vars = {**g_vars, 'params': apply_init(keys(), g_vars['params'],
                                             'ortho')}
    d_vars = {**d_vars, 'params': apply_init(keys(), d_vars['params'],
                                             'ortho')}

    g_tx = optax.adam(args.g_lr, b1=args.betas[0], b2=args.betas[1])
    d_tx = optax.adam(args.d_lr, b1=args.betas[0], b2=args.betas[1])
    state = dict(rng=keys(), G=g_vars, D=d_vars,
                 G_ema=jax.tree_util.tree_map(jnp.copy, g_vars),
                 g_opt=g_tx.init(g_vars['params']),
                 d_opt=d_tx.init(d_vars['params']), step=jnp.int32(0))

    train_step = accel.jit_step(build_train_step(
        G, D, g_tx, d_tx, HingeLoss(), args.policy,
        (args.real_lambda, args.fake_lambda, args.latent_d_lambda,
         args.latent_g_lambda), args.noise_sigma, args.z_dim))

    const_z = sample_nnoise(keys(), (16, args.z_dim))

    @jax.jit
    def sample_fn(state):
        return G.apply(state['G_ema'], const_z, train=False)

    return run_training(
        name='SEBigGAN', args=args, accel=accel, state=state, loader=loader,
        train_step=train_step, sample_fn=sample_fn,
        max_iters=max_iters, save_interval=args.save,
        ema_params_path=lambda s: s['G_ema'],
    )


def main(parser):
    # reference add_args schema (original/SEBigGAN/utils.py:138-166), verbatim
    parser = add_args(parser, dict(
        channels=[64, 'channel_width, multiplier'],
        deep=[False, 'deep model'],
        z_dim=[120, 'input latent dim'],
        g_disable_sn=[False, 'disable spectral norm'],
        g_att_name=['se', 'attention name'],
        g_act_name=['relu', 'activation function name'],
        g_norm_name=['bn', 'normalization layer name'],
        d_disable_sn=[False, 'disable spectral norm'],
        d_att_name=['se', 'attention name'],
        d_act_name=['relu', 'activation function name'],
        g_lr=[0.00005, 'learning rate for G'],
        d_lr=[0.0002, 'learning rate for D'],
        betas=[[0., 0.999], 'betas'],
        real_lambda=[10., 'lambda for consistency regularization on real'],
        fake_lambda=[10., 'lambda for consistency regularization on fake'],
        latent_d_lambda=[5., 'lambda for latent consistency regularization '
                             'on D'],
        latent_g_lambda=[0.5, 'lambda for latent consistency regularization '
                              'on G'],
        noise_sigma=[0.03, 'sigma for added noise in latent consistency '
                           'regularization'],
        policy=['color,translation', 'policy for diffaugmnet'],
    ))
    args = parser.parse_args()
    save_args(args)

    loader = build_loader(args, 'image')
    max_iters = default_max_iters(args, loader)
    train(args, max_iters, loader)
