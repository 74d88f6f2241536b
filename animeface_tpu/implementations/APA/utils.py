'''APA — adaptive pseudo augmentation (reference `implementations/APA/`):
deceive D by replacing real images with (detached) fakes with adaptive
probability p (lambda_r heuristic on sign(D(real))), on the StyleGAN3
backbone with DiffAugment. The whole step, including the per-sample
real/fake swap and the p update, is one jitted function.'''

from __future__ import annotations

import jax
import jax.numpy as jnp
import optax

from animeface_tpu.implementations.StyleGAN3.utils import (
    STYLEGAN3_MODEL_ARGS, build_models, init_state, make_optimizers,
)
from animeface_tpu.utils import add_args, save_args
from animeface_tpu.nnutils import KeyGen, sample_nnoise, update_ema
from animeface_tpu.nnutils.accelerate import Accelerator
from animeface_tpu.nnutils.loss import NonSaturatingLoss, r1_regularizer
from animeface_tpu.nnutils.diffaugment import diff_augment
from animeface_tpu.nnutils.ada import ada_init_state, ada_update_p
from animeface_tpu.nnutils.trainer import (
    run_training, default_max_iters, host_step_counter)
from animeface_tpu.dataset import build_loader


def apa_augment(key, real, fake, p):
    '''Per-sample real->fake swap with probability p (reference model.py:101).'''
    cond = jax.random.uniform(key, (real.shape[0], 1, 1, 1)) < p
    alpha = cond.astype(real.dtype)
    return fake * alpha + real * (1 - alpha)


def build_train_step(G, D, g_tx, d_tx, loss, policy, gp_lambda, do_r1,
                     ema_decay=0.999, disable_apa=False):
    def train_step(state, real):
        rng, zkey, ar, af, akey = jax.random.split(state['rng'], 5)
        B = real.shape[0]
        z = sample_nnoise(zkey, (B, G.latent_dim))

        fake, g_mut = G.apply(
            {'params': state['G'], 'moments': state['G_moments']}, z,
            train=True, mutable=['moments'])
        fake_sg = jax.lax.stop_gradient(fake)
        real_aug = diff_augment(ar, real, policy)
        fake_aug = diff_augment(af, fake_sg, policy)
        # deceive D: mix fakes into the real batch with prob p
        # (--disable-apa trains the same loop without the swap, for
        # comparison — reference model.py:101 `disable`)
        real_aug_apa = real_aug if disable_apa else apa_augment(
            akey, real_aug, fake_aug, state['ada']['p'])

        def d_loss_fn(d_params):
            real_prob = D.apply({'params': d_params}, real_aug_apa)
            fake_prob = D.apply({'params': d_params}, fake_aug)
            adv = loss.d_loss(real_prob, fake_prob)
            if do_r1:
                d_apply = lambda img: D.apply({'params': d_params}, img)
                adv = adv + r1_regularizer(
                    jax.lax.stop_gradient(real_aug_apa), d_apply) * gp_lambda
            return adv, real_prob

        (d_loss, real_prob), d_grads = jax.value_and_grad(
            d_loss_fn, has_aux=True)(state['D'])
        d_up, d_opt = d_tx.update(d_grads, state['d_opt'], state['D'])
        d_params = optax.apply_updates(state['D'], d_up)

        def g_loss_fn(g_params):
            fake2, _ = G.apply(
                {'params': g_params, 'moments': state['G_moments']}, z,
                train=True, mutable=['moments'])
            fake2_aug = diff_augment(af, fake2, policy)
            fake_prob = D.apply({'params': d_params}, fake2_aug)
            return loss.g_loss(fake_prob)

        g_loss, g_grads = jax.value_and_grad(g_loss_fn)(state['G'])
        g_up, g_opt = g_tx.update(g_grads, state['g_opt'], state['G'])
        g_params = optax.apply_updates(state['G'], g_up)

        ada = (state['ada'] if disable_apa
               else ada_update_p(state['ada'], real_prob))  # lambda_r heuristic
        new_state = dict(
            state, rng=rng, G=g_params, D=d_params,
            G_moments=g_mut['moments'],
            G_ema=update_ema(g_params, state['G_ema'], ema_decay),
            g_opt=g_opt, d_opt=d_opt, ada=ada, step=state['step'] + 1,
        )
        return new_state, dict(g=jnp.nan_to_num(g_loss),
                               d=jnp.nan_to_num(d_loss), p=ada['p'])

    return train_step


def train(args, max_iters, loader, name='APA'):
    accel = Accelerator(mesh_shape=tuple(args.mesh), bf16=not args.no_bf16)
    keys = KeyGen(args.seed)

    G, D = build_models(args, accel.compute_dtype)
    g_tx, d_tx = make_optimizers(args)
    state, _ = init_state(args, G, D, g_tx, d_tx, keys)
    state['ada'] = ada_init_state(args.batch_size, args.apa_interval,
                                  args.apa_target_kimg, args.apa_threshold)

    loss = NonSaturatingLoss()
    disable = getattr(args, 'disable_apa', False)
    jit_plain = accel.jit_step(build_train_step(
        G, D, g_tx, d_tx, loss, args.policy, args.gp_lambda, do_r1=False,
        disable_apa=disable))
    jit_r1 = accel.jit_step(build_train_step(
        G, D, g_tx, d_tx, loss, args.policy, args.gp_lambda, do_r1=True,
        disable_apa=disable))
    next_index = host_step_counter()

    def train_step(state, batch):
        i = next_index(state)
        if args.gp_lambda > 0 and i % args.gp_every == 0:
            return jit_r1(state, batch)
        return jit_plain(state, batch)

    const_z = sample_nnoise(keys(), (getattr(args, 'num_test', 16),
                                     args.latent_dim))

    @jax.jit
    def sample_fn(state):
        return G.apply({'params': state['G_ema'],
                        'moments': state['G_moments']}, const_z)

    return run_training(
        name=name, args=args, accel=accel, state=state, loader=loader,
        train_step=train_step, sample_fn=sample_fn,
        max_iters=max_iters, save_interval=args.save,
        ema_params_path=lambda s: {'params': s['G_ema'],
                                   'moments': s['G_moments']},
    )


def main(parser):
    # the reference APA recipe exposes only "minimal controllable arguments"
    # (utils.py:113-129) and hardcodes the StyleGAN3 backbone defaults; we
    # mirror that surface plus the shared backbone knobs (declared extras:
    # the smokes shrink the model through them).
    parser = add_args(parser, dict(
        **STYLEGAN3_MODEL_ARGS,
        num_test=[16, 'number of images for eval'],
        apa_interval=[4, 'interval to update p.'],
        apa_target_kimg=[500, 'number of k images to expect apa probability '
                              'to reach 1.'],
        apa_threshold=[0.6, 'threshold to add or subtract from p.'],
        disable_apa=[False, 'disable APA. For comparing results.'],
        lr=[0.0025, 'learning rate'],
        map_lr_scale=[0.01, 'scale learning rate for mapping network'],
        betas=[[0., 0.99], 'betas'],
        gp_lambda=[10., 'lambda for gradient penalty'],
        gp_every=[16, 'calc gradient penalty every'],
        policy=['color,translation', 'policy for diffaugment'],
    ))
    args = parser.parse_args()
    save_args(args)

    loader = build_loader(args, 'image')
    max_iters = default_max_iters(args, loader)
    train(args, max_iters, loader)
