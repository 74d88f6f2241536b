'''DiffAugment study (reference `implementations/DiffAugment/`): PGGAN-style
progressive training with DiffAugment applied to both real and fake before D
(train_wgangp, utils.py:114), WGAN-gp + drift. Reuses the PGGAN models/phase
machine with an augmented step.'''

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import optax

from animeface_tpu.implementations.PGGAN.model import (
    Generator, Discriminator, RESOLUTIONS,
)
from animeface_tpu.implementations.PGGAN.utils import Step
from animeface_tpu.implementations.PGGAN import config
from animeface_tpu.utils import add_args, save_args, Status, save_image
from animeface_tpu.utils.argument import result_dir
from animeface_tpu.nnutils import KeyGen, sample_nnoise
from animeface_tpu.nnutils.accelerate import Accelerator
from animeface_tpu.nnutils.loss import WGANLoss
from animeface_tpu.nnutils.loss.penalty import gradient_penalty
from animeface_tpu.nnutils.diffaugment import diff_augment
from animeface_tpu.checkpoint import save_model
from animeface_tpu.dataset import build_dataset, DataLoader


def build_train_step(G, D, g_tx, d_tx, loss, gp_lambda, drift_eps, policy,
                     depth, g_mode, d_mode):
    def train_step(state, real):
        rng, zkey, gpkey, ar, af = jax.random.split(state['rng'], 5)
        B = real.shape[0]
        z = sample_nnoise(zkey, (B, G.latent_dim))
        alpha = state['alpha']

        fake = G.apply({'params': state['G']}, z, depth=depth, mode=g_mode,
                       alpha=alpha)
        fake_sg = jax.lax.stop_gradient(fake)
        real_aug = diff_augment(ar, real, policy)
        fake_aug = diff_augment(af, fake_sg, policy)

        def d_loss_fn(d_params):
            d_apply = lambda img: D.apply({'params': d_params}, img,
                                          depth=depth, mode=d_mode,
                                          alpha=alpha)
            real_prob = d_apply(real_aug)
            fake_prob = d_apply(fake_aug)
            adv = loss.d_loss(real_prob, fake_prob)
            gp = gradient_penalty(gpkey, real_aug, fake_aug, d_apply)
            drift = jnp.mean(real_prob ** 2)
            return adv + gp_lambda * gp + drift_eps * drift

        d_loss, d_grads = jax.value_and_grad(d_loss_fn)(state['D'])
        d_up, d_opt = d_tx.update(d_grads, state['d_opt'], state['D'])
        d_params = optax.apply_updates(state['D'], d_up)

        def g_loss_fn(g_params):
            fake2 = G.apply({'params': g_params}, z, depth=depth, mode=g_mode,
                            alpha=alpha)
            fake2_aug = diff_augment(af, fake2, policy)
            return loss.g_loss(D.apply({'params': d_params}, fake2_aug,
                                       depth=depth, mode=d_mode, alpha=alpha))

        g_loss, g_grads = jax.value_and_grad(g_loss_fn)(state['G'])
        g_up, g_opt = g_tx.update(g_grads, state['g_opt'], state['G'])
        g_params = optax.apply_updates(state['G'], g_up)

        new_alpha = jnp.minimum(1.0, alpha + state['alpha_delta'])
        return dict(state, rng=rng, G=g_params, D=d_params, g_opt=g_opt,
                    d_opt=d_opt, alpha=new_alpha, step=state['step'] + 1), \
            dict(d=d_loss, g=g_loss)

    return train_step


def train(args, dataset_factory):
    accel = Accelerator(mesh_shape=tuple(args.mesh), bf16=not args.no_bf16)
    keys = KeyGen(args.seed)

    max_depth = RESOLUTIONS.index(args.image_size)
    G = Generator(latent_dim=args.latent_dim, max_depth=max_depth,
                  dtype=accel.compute_dtype)
    D = Discriminator(max_depth=max_depth, dtype=accel.compute_dtype)
    g_params = G.init_all(keys())['params']
    d_params = D.init_all(keys())['params']

    loss = WGANLoss()
    out_dir = result_dir('DiffAugment')

    machine = Step(args.image_size, config.resl2num)
    total_iters = 0
    for resl in RESOLUTIONS[:max_depth + 1]:
        phases = 1 if resl == 4 else 4
        ds = dataset_factory(resl)
        nb = len(ds) // config.resl2batch_size[resl]
        total_iters += nb * config.resl2num[resl] * phases
    status = Status(total_iters, bar=not args.log_file, log_file=args.log_file)

    const_z = sample_nnoise(keys(), (16, args.latent_dim))
    rng = keys()
    running = True
    current_resl = -1
    g_tx = d_tx = g_opt = d_opt = None
    step_cache = {}
    alpha = jnp.float32(1.0)

    while running:
        resl = machine.current_resolution
        depth = RESOLUTIONS.index(resl)
        g_mode, d_mode = machine.get_mode()
        if resl != current_resl:
            current_resl = resl
            lr = config.resl2lr[resl]
            g_tx = optax.adam(lr, b1=config.betas[0], b2=config.betas[1])
            d_tx = optax.adam(lr, b1=config.betas[0], b2=config.betas[1])
            g_opt, d_opt = g_tx.init(g_params), d_tx.init(d_params)
            step_cache = {}

        dataset = dataset_factory(resl)
        loader = DataLoader(dataset, config.resl2batch_size[resl],
                            seed=args.seed)
        delta = 1.0 / max(1, len(loader)) * config.resl2num[resl]
        if machine.current_phase.endswith('transition'):
            alpha = jnp.float32(0.0)

        key = (depth, g_mode, d_mode)
        if key not in step_cache:
            step_cache[key] = accel.jit_step(build_train_step(
                G, D, g_tx, d_tx, loss, args.gp_lambda, args.drift_epsilon,
                args.policy, depth, g_mode, d_mode))
        jstep = step_cache[key]

        state = dict(rng=rng, G=g_params, D=d_params, g_opt=g_opt,
                     d_opt=d_opt, alpha=alpha,
                     alpha_delta=jnp.float32(delta),
                     step=jnp.int32(status.batches_done))
        for batch in accel.iter_loader(loader):
            state, metrics = jstep(state, batch)
            if status.batches_done % args.save == 0 and status.batches_done:
                import numpy as np
                imgs = G.apply({'params': state['G']}, const_z, depth=depth,
                               mode=g_mode, alpha=state['alpha'])
                save_image(np.asarray(imgs),
                           os.path.join(out_dir,
                                        f'{status.batches_done}.png'), nrow=4)
            status.update(**metrics)
        rng, g_params, d_params = state['rng'], state['G'], state['D']
        g_opt, d_opt, alpha = state['g_opt'], state['d_opt'], state['alpha']

        running = machine.step()
        machine.should_grow()

    status.plot_loss(os.path.join(out_dir, 'loss'))
    import numpy as np
    imgs = G.apply({'params': g_params}, const_z, depth=max_depth, mode='s')
    save_image(np.asarray(imgs), os.path.join(out_dir, 'final.png'), nrow=4)
    save_model(os.path.join(out_dir, 'G_final.msgpack'), g_params)
    return g_params, status


def main(parser):
    parser = add_args(parser, dict(
        latent_dim=[512, 'input latent dim'],
        gp_lambda=[10., 'lambda for gradient penalty'],
        drift_epsilon=[0.001, 'eps for drift'],
        policy=['color,translation', 'DiffAugment policy'],
    ))
    args = parser.parse_args()
    save_args(args)

    import copy

    def dataset_factory(resl):
        a = copy.copy(args)
        a.image_size = resl
        return build_dataset(a, 'image')

    train(args, dataset_factory)
