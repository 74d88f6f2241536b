'''StyleGAN v1 recipe (reference `implementations/StyleGAN/utils.py`):
PGGAN phase machine + non-saturating loss + WGAN-gp-style gradient penalty,
per-resolution schedules (config.py).'''

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import optax

from animeface_tpu.implementations.StyleGAN.model import (
    Generator, Discriminator, RESOLUTIONS,
)
from animeface_tpu.implementations.PGGAN.utils import Step
from animeface_tpu.implementations.PGGAN import config
from animeface_tpu.utils import add_args, save_args, Status, save_image
from animeface_tpu.utils.argument import result_dir
from animeface_tpu.nnutils import KeyGen, sample_nnoise
from animeface_tpu.nnutils.accelerate import Accelerator
from animeface_tpu.nnutils.loss import NonSaturatingLoss
from animeface_tpu.nnutils.loss.penalty import gradient_penalty
from animeface_tpu.dataset import build_dataset, DataLoader
from animeface_tpu.checkpoint import Checkpointer, save_model
from animeface_tpu.nnutils.trainer import check_sustained_nan

resl2num = {4: 2, 8: 2, 16: 3, 32: 4, 64: 4, 128: 4}  # StyleGAN config.py


def build_train_step(G, D, g_tx, d_tx, loss, gp_lambda, drift_epsilon,
                     depth, g_mode, d_mode):
    def train_step(state, real):
        rng, zkey, gpkey, nkey = jax.random.split(state['rng'], 4)
        B = real.shape[0]
        z = sample_nnoise(zkey, (B, G.latent_dim))
        alpha = state['alpha']

        fake = G.apply({'params': state['G']}, z, depth=depth, mode=g_mode,
                       alpha=alpha, rngs={'noise': nkey})
        fake_sg = jax.lax.stop_gradient(fake)

        def d_loss_fn(d_params):
            d_apply = lambda img: D.apply({'params': d_params}, img,
                                          depth=depth, mode=d_mode,
                                          alpha=alpha)
            real_prob = d_apply(real)
            adv = loss.d_loss(real_prob, d_apply(fake_sg))
            gp = gradient_penalty(gpkey, real, fake_sg, d_apply)
            # drift penalty (reference utils.py:152-155)
            drift = jnp.mean(jnp.square(real_prob))
            return adv + gp_lambda * gp + drift * drift_epsilon

        d_loss, d_grads = jax.value_and_grad(d_loss_fn)(state['D'])
        d_up, d_opt = d_tx.update(d_grads, state['d_opt'], state['D'])
        d_params = optax.apply_updates(state['D'], d_up)

        def g_loss_fn(g_params):
            fake2 = G.apply({'params': g_params}, z, depth=depth, mode=g_mode,
                            alpha=alpha, rngs={'noise': nkey})
            return loss.g_loss(D.apply({'params': d_params}, fake2,
                                       depth=depth, mode=d_mode, alpha=alpha))

        g_loss, g_grads = jax.value_and_grad(g_loss_fn)(state['G'])
        g_up, g_opt = g_tx.update(g_grads, state['g_opt'], state['G'])
        g_params = optax.apply_updates(state['G'], g_up)

        new_alpha = jnp.minimum(1.0, alpha + state['alpha_delta'])
        # alpha in the metrics: the growth-ramp trace is soak evidence
        return dict(state, rng=rng, G=g_params, D=d_params, g_opt=g_opt,
                    d_opt=d_opt, alpha=new_alpha, step=state['step'] + 1), \
            dict(d=d_loss, g=g_loss, alpha=alpha)

    return train_step


def train(args, dataset_factory):
    accel = Accelerator(mesh_shape=tuple(args.mesh), bf16=not args.no_bf16)
    keys = KeyGen(args.seed)

    max_depth = RESOLUTIONS.index(args.image_size)
    # reference passes the latent dim as the style width too (utils.py:237)
    G = Generator(latent_dim=args.latent_dim, style_dim=args.latent_dim,
                  max_depth=max_depth, dtype=accel.compute_dtype)
    D = Discriminator(max_depth=max_depth, dtype=accel.compute_dtype)
    g_params = G.init_all(keys())['params']
    d_params = D.init_all(keys())['params']

    loss = NonSaturatingLoss()
    out_dir = result_dir('StyleGAN')

    machine = Step(args.image_size, resl2num)
    total_iters = 0
    for resl in RESOLUTIONS[:max_depth + 1]:
        phases = 1 if resl == 4 else 4
        ds = dataset_factory(resl)
        nb = len(ds) // config.resl2batch_size[resl]
        total_iters += nb * resl2num[resl] * phases
    status = Status(total_iters, bar=not args.log_file, log_file=args.log_file)

    const_z = sample_nnoise(keys(), (16, args.latent_dim))
    sample_noise = keys()
    rng = keys()
    running = True
    current_resl = -1
    g_tx = d_tx = g_opt = d_opt = None
    step_cache = {}
    alpha = jnp.float32(1.0)
    skip_batches = 0   # mid-phase fast-forward after --resume

    # checkpoint/resume across the progressive phase machine — same design
    # as PGGAN/utils.py (the param/opt tree shapes are depth-independent:
    # init_all materializes every block up front)
    ckpt = Checkpointer(os.path.join(out_dir, 'checkpoint'), max_to_keep=3)
    if getattr(args, 'resume', None):
        tx0 = optax.adam(1e-3, b1=config.betas[0], b2=config.betas[1])
        template = dict(rng=rng, G=g_params, D=d_params,
                        g_opt=tx0.init(g_params), d_opt=tx0.init(d_params),
                        alpha=jnp.float32(0.), alpha_delta=jnp.float32(0.),
                        step=jnp.int32(0))
        restored, meta = Checkpointer(args.resume).restore(template)
        rng, g_params, d_params = restored['rng'], restored['G'], restored['D']
        g_opt, d_opt = restored['g_opt'], restored['d_opt']
        alpha = restored['alpha']
        m = meta['machine']
        machine.current_phase = m['current_phase']
        machine.current_resolution = int(m['current_resolution'])
        machine.skip_count = int(m['skip_count'])
        machine.grow_flag = bool(m['grow_flag'])
        skip_batches = int(meta['phase_batch_idx'])
        # growth-boundary snapshots carry the PREVIOUS resolution's Adam
        # moments; the fresh path re-initializes optimizers at every
        # resolution change, so resume must too (same fix as PGGAN)
        opt_fresh = meta.get('opt_fresh',
                             machine.current_phase == 'G_transition'
                             and machine.skip_count == 1
                             and skip_batches == 0)
        if opt_fresh:
            g_opt = d_opt = None   # loop top re-inits (current_resl = -1)
        else:
            current_resl = machine.current_resolution
            lr = config.resl2lr[current_resl]
            g_tx = optax.adam(lr, b1=config.betas[0], b2=config.betas[1])
            d_tx = optax.adam(lr, b1=config.betas[0], b2=config.betas[1])
        if meta.get('status'):
            status.load_state_dict(meta['status'])
        status.print(f'[resume] from {args.resume} @ step '
                     f'{status.batches_done} ({machine.current_phase} '
                     f'{machine.current_resolution}px, '
                     f'+{skip_batches} batches into the phase epoch)')

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
        delta = 1.0 / max(1, len(loader)) * resl2num[resl]
        # alpha resets once per growth (reference model grow()); it then
        # accumulates across every epoch of the transition phase — same fix
        # as PGGAN (the per-epoch reset was a sawtooth bug)
        if (machine.current_phase.endswith('transition')
                and machine.skip_count == 1 and not skip_batches):
            alpha = jnp.float32(0.0)

        key = (depth, g_mode, d_mode)
        if key not in step_cache:
            step_cache[key] = accel.jit_step(build_train_step(
                G, D, g_tx, d_tx, loss, args.gp_lambda, args.drift_epsilon,
                depth, g_mode, d_mode))
        jstep = step_cache[key]

        state = dict(rng=rng, G=g_params, D=d_params, g_opt=g_opt,
                     d_opt=d_opt, alpha=alpha,
                     alpha_delta=jnp.float32(delta),
                     step=jnp.int32(status.batches_done))

        def save_snapshot(state, phase_batch_idx):
            ckpt.save(status.batches_done, state, meta={
                'status': status.state_dict(),
                'machine': dict(
                    current_phase=machine.current_phase,
                    current_resolution=machine.current_resolution,
                    skip_count=machine.skip_count,
                    grow_flag=machine.grow_flag),
                'phase_batch_idx': phase_batch_idx,
                'opt_fresh': False,   # mid-phase: optimizers are live
            })

        for bi, batch in enumerate(accel.iter_loader(loader)):
            if bi < skip_batches:
                continue   # deterministic loader; resume lands mid-phase
            state, metrics = jstep(state, batch)
            # Update FIRST so the snapshot's Status history includes the
            # checkpointed batch (phase_batch_idx=bi+1 skips it on resume) —
            # round-4 advisor finding, mirrored from PGGAN.
            status.update(**metrics)
            if status.batches_done % args.save == 0 and status.batches_done:
                import numpy as np
                import json
                imgs = G.apply({'params': state['G']}, const_z, depth=depth,
                               mode=g_mode, alpha=state['alpha'],
                               rngs={'noise': sample_noise})
                save_image(np.asarray(imgs),
                           os.path.join(out_dir, f'{status.batches_done}.png'),
                           nrow=4)
                save_model(os.path.join(out_dir,
                                        f'G_{status.batches_done}.msgpack'),
                           state['G'])
                with open(os.path.join(
                        out_dir, f'G_{status.batches_done}.json'), 'w') as f:
                    json.dump(dict(resolution=resl, depth=depth, mode=g_mode,
                                   alpha=float(state['alpha'])), f)
                save_snapshot(state, bi + 1)
                check_sustained_nan(status, 'StyleGAN')
        skip_batches = 0
        rng, g_params, d_params = state['rng'], state['G'], state['D']
        g_opt, d_opt, alpha = state['g_opt'], state['d_opt'], state['alpha']

        running = machine.step()
        machine.should_grow()
        # phase-boundary snapshot: a kill during the growth re-trace resumes
        # at the first batch of the NEW phase/resolution; opt_fresh marks a
        # resolution change (resume re-inits instead of restoring moments)
        ckpt.save(status.batches_done,
                  dict(rng=rng, G=g_params, D=d_params, g_opt=g_opt,
                       d_opt=d_opt, alpha=alpha,
                       alpha_delta=jnp.float32(0.),
                       step=jnp.int32(status.batches_done)),
                  meta={
                      'status': status.state_dict(),
                      'machine': dict(
                          current_phase=machine.current_phase,
                          current_resolution=machine.current_resolution,
                          skip_count=machine.skip_count,
                          grow_flag=machine.grow_flag),
                      'phase_batch_idx': 0,
                      'opt_fresh': machine.current_resolution != resl,
                  })

    status.plot_loss(os.path.join(out_dir, 'loss'))
    import numpy as np
    imgs = G.apply({'params': g_params}, const_z, depth=max_depth, mode='s',
                   rngs={'noise': sample_noise})
    save_image(np.asarray(imgs), os.path.join(out_dir, 'final.png'), nrow=4)
    save_model(os.path.join(out_dir, 'G_final.msgpack'), g_params)
    return g_params, status


def main(parser):
    parser = add_args(parser, dict(
        latent_dim=[512, 'latent input dimension'],
        gp_lambda=[10., 'lambda for gradient penalty'],
        drift_epsilon=[0.0001, 'epsilon for drift'],
    ))
    args = parser.parse_args()
    save_args(args)

    import copy

    def dataset_factory(resl):
        a = copy.copy(args)
        a.image_size = resl
        return build_dataset(a, 'image')

    train(args, dataset_factory)
