'''AdaBelief study (reference `implementations/AdaBelief/utils.py`): the
StyleGAN2 backbone trained with the AdaBelief optimizer (variance of the
gradient-prediction error; reference vendors `thirdparty/adabelief/
AdaBelief.py:8` — here optax.adabelief provides the same update rule with
rectification). Non-saturating loss + R1 added EVERY step scaled by
`gp_lambda` (reference :52-56 — no lazy regularization, no path length, no
EMA in this recipe), betas default [0.1, 0.99] (reference :113, asserted
non-zero at :142).'''

from __future__ import annotations

import jax
import jax.numpy as jnp
import optax

from animeface_tpu.implementations.StyleGAN2.utils import build_models
from animeface_tpu.utils import add_args, save_args
from animeface_tpu.nnutils import KeyGen, sample_nnoise
from animeface_tpu.nnutils.accelerate import Accelerator
from animeface_tpu.nnutils.loss import NonSaturatingLoss
from animeface_tpu.nnutils.loss.penalty import r1_regularizer
from animeface_tpu.nnutils.diffaugment import diff_augment
from animeface_tpu.nnutils.trainer import run_training, default_max_iters
from animeface_tpu.dataset import build_loader


def build_adabelief_step(G, D, g_tx, d_tx, loss, policy, gp_lambda):
    '''Reference train loop body (:36-80): augment real AND fake, D step
    with additive every-step R1, G step on the same fake.'''

    def train_step(state, real):
        rng, zkey, akey_r, akey_f, nkey, mkey = \
            jax.random.split(state['rng'], 6)
        B = real.shape[0]

        real = diff_augment(akey_r, real, policy)
        z = sample_nnoise(zkey, (B, G.style_dim))
        fake, _ = G.apply({'params': state['G']}, z,
                          rngs={'noise': nkey, 'mixing': mkey})
        fake = diff_augment(akey_f, fake, policy)
        fake_sg = jax.lax.stop_gradient(fake)

        def d_loss_fn(d_params):
            d_apply = lambda img: D.apply({'params': d_params}, img)
            adv = loss.d_loss(d_apply(real), d_apply(fake_sg))
            if gp_lambda > 0:
                adv = adv + r1_regularizer(real, d_apply) * gp_lambda
            return adv

        d_loss, d_grads = jax.value_and_grad(d_loss_fn)(state['D'])
        d_up, d_opt = d_tx.update(d_grads, state['d_opt'], state['D'])
        d_params = optax.apply_updates(state['D'], d_up)

        def g_loss_fn(g_params):
            fake2, _ = G.apply({'params': g_params}, z,
                               rngs={'noise': nkey, 'mixing': mkey})
            fake2 = diff_augment(akey_f, fake2, policy)
            return loss.g_loss(D.apply({'params': d_params}, fake2))

        g_loss, g_grads = jax.value_and_grad(g_loss_fn)(state['G'])
        g_up, g_opt = g_tx.update(g_grads, state['g_opt'], state['G'])
        g_params = optax.apply_updates(state['G'], g_up)

        new_state = dict(state, rng=rng, G=g_params, D=d_params,
                         g_opt=g_opt, d_opt=d_opt,
                         step=state['step'] + 1)
        return new_state, {'D': d_loss, 'G': g_loss}

    return train_step


def train(args, max_iters, loader):
    accel = Accelerator(mesh_shape=tuple(args.mesh), bf16=not args.no_bf16)
    keys = KeyGen(args.seed)

    G, D = build_models(args, accel.compute_dtype)
    z0 = jnp.zeros((1, args.style_dim))
    g_vars = G.init({'params': keys(), 'noise': keys(), 'mixing': keys()}, z0)
    d_vars = D.init(keys(), jnp.zeros((1, args.image_size, args.image_size,
                                       args.image_channels)))
    g_params, d_params = g_vars['params'], d_vars['params']

    assert args.betas[0] != 0 and args.betas[1] != 0
    g_tx = optax.adabelief(args.lr, b1=args.betas[0], b2=args.betas[1])
    d_tx = optax.adabelief(args.lr, b1=args.betas[0], b2=args.betas[1])
    state = dict(
        rng=keys(), G=g_params, D=d_params,
        g_opt=g_tx.init(g_params), d_opt=d_tx.init(d_params),
        step=jnp.int32(0),
    )

    loss = NonSaturatingLoss()
    train_step = accel.jit_step(build_adabelief_step(
        G, D, g_tx, d_tx, loss, args.policy, args.gp_lambda))

    const_z = sample_nnoise(keys(), (16, args.style_dim))
    nk = keys()

    @jax.jit
    def sample_fn(state):
        images, _ = G.apply({'params': state['G']}, const_z,
                            rngs={'noise': nk})
        return images

    return run_training(
        name='AdaBelief', args=args, accel=accel, state=state, loader=loader,
        train_step=lambda state, batch: train_step(state, batch),
        sample_fn=sample_fn, max_iters=max_iters, save_interval=args.save,
        ema_params_path=lambda s: s['G'],
    )


def main(parser):
    parser = add_args(parser, dict(
        image_channels=[3, 'number of channels for the generated image'],
        style_dim=[512, 'style feature dimension'],
        channels=[32, 'channel width multiplier'],
        max_channels=[512, 'maximum channels'],
        block_num_conv=[2, 'number of convolution layers in residual block'],
        map_num_layers=[8, 'number of layers in mapping network'],
        map_lr=[0.01, 'learning rate for mapping network'],
        disable_map_norm=[False, 'disable pixel normalization'],
        mbsd_groups=[4, 'number of groups in mini-batch stddev'],
        lr=[0.001, 'learning rate'],
        betas=[[0.1, 0.99], 'betas'],
        gp_lambda=[10., 'lambda for r1'],
        policy=['color,translation', 'policy for DiffAugment'],
    ))
    args = parser.parse_args()
    save_args(args)

    loader = build_loader(args, 'image')
    max_iters = default_max_iters(args, loader)
    train(args, max_iters, loader)
