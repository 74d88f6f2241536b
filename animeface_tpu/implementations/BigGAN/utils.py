'''BigGAN recipe (reference `implementations/BigGAN/utils.py`): hinge loss,
EMA G, DiffAugment.'''

from __future__ import annotations

import jax
import jax.numpy as jnp
import optax

from animeface_tpu.implementations.BigGAN.model import Generator, Discriminator
from animeface_tpu.utils import add_args, save_args
from animeface_tpu.nnutils import KeyGen, sample_nnoise, update_ema
from animeface_tpu.nnutils.accelerate import Accelerator
from animeface_tpu.nnutils.loss import HingeLoss
from animeface_tpu.nnutils.diffaugment import diff_augment
from animeface_tpu.nnutils.trainer import run_training, default_max_iters
from animeface_tpu.dataset import build_loader


def build_train_step(G, D, g_tx, d_tx, loss, policy, ema_decay=0.999,
                     use_ema=True):
    def train_step(state, real):
        rng, zkey, ar, af, ag = jax.random.split(state['rng'], 5)
        B = real.shape[0]
        z = sample_nnoise(zkey, (B, G.z_dim))

        fake, g_mut = G.apply(state['G'], z, train=True,
                              mutable=['batch_stats'])
        fake_sg = jax.lax.stop_gradient(fake)

        def d_loss_fn(d_params):
            d_vars = {'params': d_params, 'batch_stats': state['D']['batch_stats']}
            real_prob, d_mut = D.apply(d_vars, diff_augment(ar, real, policy),
                                       train=True, mutable=['batch_stats'])
            fake_prob, d_mut = D.apply({'params': d_params, **d_mut},
                                       diff_augment(af, fake_sg, policy),
                                       train=True, mutable=['batch_stats'])
            return loss.d_loss(real_prob, fake_prob), d_mut

        (d_loss, d_mut), d_grads = jax.value_and_grad(d_loss_fn, has_aux=True)(
            state['D']['params'])
        d_up, d_opt = d_tx.update(d_grads, state['d_opt'], state['D']['params'])
        d_params = optax.apply_updates(state['D']['params'], d_up)

        def g_loss_fn(g_params):
            fake2, _ = G.apply({'params': g_params, **g_mut}, z, train=True,
                               mutable=['batch_stats'])
            fake_prob, _ = D.apply({'params': d_params, **d_mut},
                                   diff_augment(ag, fake2, policy),
                                   train=True, mutable=['batch_stats'])
            return loss.g_loss(fake_prob)

        g_loss, g_grads = jax.value_and_grad(g_loss_fn)(state['G']['params'])
        g_up, g_opt = g_tx.update(g_grads, state['g_opt'], state['G']['params'])
        g_params = optax.apply_updates(state['G']['params'], g_up)

        new_G = {'params': g_params, **g_mut}
        out = dict(rng=rng, G=new_G, D={'params': d_params, **d_mut},
                   g_opt=g_opt, d_opt=d_opt, step=state['step'] + 1)
        if use_ema:       # reference keeps EMA only under --ema (utils.py:103)
            out['G_ema'] = {
                'params': update_ema(g_params, state['G_ema']['params'],
                                     ema_decay),
                'batch_stats': g_mut['batch_stats']}
        return out, dict(g=jnp.nan_to_num(g_loss), d=jnp.nan_to_num(d_loss))

    return train_step


def train(args, max_iters, loader):
    accel = Accelerator(mesh_shape=tuple(args.mesh), bf16=not args.no_bf16)
    keys = KeyGen(args.seed)

    G = Generator(image_size=args.image_size, z_dim=args.z_dim,
                  channels=args.channels, deep=args.deep,
                  use_sn=not args.disable_sn,
                  use_attention=not args.disable_attention,
                  att_name=args.att_name, dtype=accel.compute_dtype)
    D = Discriminator(image_size=args.image_size, channels=args.channels,
                      deep=args.deep, use_sn=not args.disable_sn,
                      use_attention=not args.disable_attention,
                      att_name=args.att_name, dtype=accel.compute_dtype)

    g_vars = G.init(keys(), jnp.zeros((2, args.z_dim)), train=True)
    d_vars = D.init(keys(), jnp.zeros((2, args.image_size, args.image_size, 3)),
                    train=True)

    g_tx = optax.adam(args.g_lr, b1=args.betas[0], b2=args.betas[1])
    d_tx = optax.adam(args.d_lr, b1=args.betas[0], b2=args.betas[1])
    state = dict(rng=keys(), G=g_vars, D=d_vars,
                 g_opt=g_tx.init(g_vars['params']),
                 d_opt=d_tx.init(d_vars['params']), step=jnp.int32(0))
    if args.ema:
        state['G_ema'] = jax.tree_util.tree_map(jnp.copy, g_vars)

    train_step = accel.jit_step(build_train_step(
        G, D, g_tx, d_tx, HingeLoss(), args.policy, use_ema=args.ema))

    const_z = sample_nnoise(keys(), (16, args.z_dim))

    @jax.jit
    def sample_fn(state):
        src = state['G_ema'] if args.ema else state['G']
        return G.apply(src, const_z, train=False)

    return run_training(
        name='BigGAN', args=args, accel=accel, state=state, loader=loader,
        train_step=train_step, sample_fn=sample_fn,
        max_iters=max_iters, save_interval=args.save,
        ema_params_path=lambda s: s['G_ema'] if args.ema else s['G'],
    )


def main(parser):
    # names/defaults mirror reference BigGAN/utils.py:94-101 (g_lr/d_lr:
    # BigGAN's TTUR gives G the larger rate); disable_* / att_name are
    # TPU-side extras over the reference schema
    parser = add_args(parser, dict(
        z_dim=[120, 'latent dimension'],
        channels=[64, 'channel width multiplier'],
        deep=[False, 'use deep model'],
        ema=[False, 'use EMA'],
        disable_sn=[False, 'disable spectral norm'],
        disable_attention=[False, 'disable self-attention'],
        att_name=['sa', 'attention type: sa (self-attention) or ll (lambda)'],
        g_lr=[2e-4, 'G learning rate'],
        d_lr=[5e-5, 'D learning rate'],
        betas=[[0., 0.999], 'betas'],
        policy=['color,translation', 'DiffAugment policy'],
    ))
    args = parser.parse_args()
    save_args(args)

    loader = build_loader(args, 'image')
    max_iters = default_max_iters(args, loader)
    train(args, max_iters, loader)
