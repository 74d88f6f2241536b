'''PGGAN training recipe (reference `implementations/PGGAN/utils.py`):
phase machine D_stab -> (G_trans -> G_stab -> D_trans -> D_stab) per
resolution, WGAN-gp + drift, per-resolution batch size / lr / epochs, alpha
ramp. Each (depth, g_mode, d_mode) is one compiled step; growing re-threads
params into fresh optimizers host-side (planned re-trace, SURVEY §3.3).'''

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import optax

from animeface_tpu.implementations.PGGAN.model import (
    Generator, Discriminator, RESOLUTIONS,
)
from animeface_tpu.implementations.PGGAN import config
from animeface_tpu.utils import add_args, save_args
from animeface_tpu.nnutils import KeyGen, sample_nnoise
from animeface_tpu.nnutils.accelerate import Accelerator
from animeface_tpu.nnutils.loss import WGANLoss
from animeface_tpu.nnutils.loss.penalty import gradient_penalty
from animeface_tpu.nnutils.trainer import run_training, check_sustained_nan
from animeface_tpu.dataset import build_dataset, DataLoader
from animeface_tpu.utils import Status, save_image
from animeface_tpu.utils.argument import result_dir
from animeface_tpu.checkpoint import Checkpointer, save_model
import os


class Step:
    '''Phase machine (reference Step, utils.py:17).'''

    ORDER = ['D_stablization', 'G_transition', 'G_stablization', 'D_transition']

    def __init__(self, max_resolution, resl2num):
        self.current_phase = 'D_stablization'
        self.current_resolution = 4
        self.max_resolution = max_resolution
        self.resl2num = resl2num
        self.skip_count = 1
        self.grow_flag = False

    def step(self) -> bool:
        if self.skip_count < self.resl2num[self.current_resolution]:
            self.skip_count += 1
            return True
        self.skip_count = 1
        if self.current_phase == 'D_stablization':
            self.current_phase = 'G_transition'
            self.current_resolution *= 2
            self.grow_flag = True
        elif self.current_phase == 'G_transition':
            self.current_phase = 'G_stablization'
        elif self.current_phase == 'G_stablization':
            self.current_phase = 'D_transition'
        elif self.current_phase == 'D_transition':
            self.current_phase = 'D_stablization'
        return self.current_resolution <= self.max_resolution

    def get_mode(self):
        return (('t' if self.current_phase == 'G_transition' else 's'),
                ('t' if self.current_phase == 'D_transition' else 's'))

    def should_grow(self):
        if self.grow_flag:
            self.grow_flag = False
            return True
        return False


def build_train_step(G, D, g_tx, d_tx, loss, gp_lambda, drift_eps,
                     depth, g_mode, d_mode):
    def train_step(state, real):
        rng, zkey, gpkey = jax.random.split(state['rng'], 3)
        B = real.shape[0]
        z = sample_nnoise(zkey, (B, G.latent_dim))
        alpha = state['alpha']

        fake = G.apply({'params': state['G']}, z, depth=depth, mode=g_mode,
                       alpha=alpha)
        fake_sg = jax.lax.stop_gradient(fake)

        def d_loss_fn(d_params):
            d_apply = lambda img: D.apply({'params': d_params}, img,
                                          depth=depth, mode=d_mode, alpha=alpha)
            real_prob = d_apply(real)
            fake_prob = d_apply(fake_sg)
            adv = loss.d_loss(real_prob, fake_prob)
            gp = gradient_penalty(gpkey, real, fake_sg, d_apply)
            drift = jnp.mean(real_prob ** 2)
            return adv + gp_lambda * gp + drift_eps * drift

        d_loss, d_grads = jax.value_and_grad(d_loss_fn)(state['D'])
        d_up, d_opt = d_tx.update(d_grads, state['d_opt'], state['D'])
        d_params = optax.apply_updates(state['D'], d_up)

        def g_loss_fn(g_params):
            fake2 = G.apply({'params': g_params}, z, depth=depth, mode=g_mode,
                            alpha=alpha)
            fake_prob = D.apply({'params': d_params}, fake2, depth=depth,
                                mode=d_mode, alpha=alpha)
            return loss.g_loss(fake_prob)

        g_loss, g_grads = jax.value_and_grad(g_loss_fn)(state['G'])
        g_up, g_opt = g_tx.update(g_grads, state['g_opt'], state['G'])
        g_params = optax.apply_updates(state['G'], g_up)

        new_alpha = jnp.minimum(1.0, alpha + state['alpha_delta'])
        # alpha in the metrics: the growth-ramp trace is first-class soak
        # evidence (each transition phase must show a clean 0 -> 1 ramp)
        return dict(state, rng=rng, G=g_params, D=d_params, g_opt=g_opt,
                    d_opt=d_opt, alpha=new_alpha, step=state['step'] + 1), \
            dict(d=d_loss, g=g_loss, alpha=alpha)

    return train_step


def train(args, dataset_factory):
    accel = Accelerator(mesh_shape=tuple(args.mesh), bf16=not args.no_bf16)
    keys = KeyGen(args.seed)

    max_depth = RESOLUTIONS.index(args.image_size)
    G = Generator(latent_dim=args.latent_dim, max_depth=max_depth,
                  dtype=accel.compute_dtype)
    D = Discriminator(max_depth=max_depth, dtype=accel.compute_dtype)
    g_vars = G.init_all(keys())
    d_vars = D.init_all(keys())

    loss = WGANLoss()
    out_dir = result_dir('PGGAN')

    resl2num = {r: config.resl2num[r] for r in RESOLUTIONS}
    machine = Step(args.image_size, resl2num)

    total_iters = 0
    for resl in RESOLUTIONS[:max_depth + 1]:
        phases = 1 if resl == 4 else 4
        ds = dataset_factory(resl)
        nb = len(ds) // config.resl2batch_size[resl]
        total_iters += nb * resl2num[resl] * phases
    status = Status(total_iters, bar=not args.log_file, log_file=args.log_file)

    g_params, d_params = g_vars['params'], d_vars['params']
    const_z = sample_nnoise(keys(), (16, args.latent_dim))
    rng = keys()

    running = True
    current_resl = -1
    g_tx = d_tx = None
    g_opt = d_opt = None
    step_cache = {}
    alpha = jnp.float32(1.0)
    skip_batches = 0   # mid-phase fast-forward after --resume

    # ---- checkpoint/resume (new capability vs the reference, SURVEY §5:
    # the phase machine, per-resolution optimizers, alpha ramp and Status
    # history are all part of the snapshot so a kill can land ANYWHERE —
    # including inside a growth transition — and resume exactly) ----
    ckpt = Checkpointer(os.path.join(out_dir, 'checkpoint'), max_to_keep=3)
    if getattr(args, 'resume', None):
        # template: the param/opt tree SHAPES are depth-independent
        # (init_all materializes every block up front), so one adam-shaped
        # template restores any phase's state
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
        # A growth-boundary snapshot carries the PREVIOUS resolution's Adam
        # moments, but the fresh path re-initializes optimizers at every
        # resolution change — restoring them would silently diverge from an
        # uninterrupted run (caught by the r4 soak's replayed-step metrics).
        # Snapshots record opt_fresh at save time; older ones infer it from
        # the post-growth signature.
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
        # alpha resets once per GROWTH (reference model.py:301-305 grow();
        # update_alpha then accumulates across every epoch of the transition
        # phase, :335-337) — skip_count==1 marks the phase's first epoch.
        # A mid-phase resume must not reset the restored ramp either.
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
            # checkpointed batch: phase_batch_idx=bi+1 skips it on resume, so
            # saving the pre-update history would lose that batch's metrics
            # and desync batches_done by one per seam (round-4 advisor).
            status.update(**metrics)
            if status.batches_done % args.save == 0 and status.batches_done:
                import numpy as np
                imgs = G.apply({'params': state['G']}, const_z, depth=depth,
                               mode=g_mode, alpha=state['alpha'])
                save_image(np.asarray(imgs),
                           os.path.join(out_dir, f'{status.batches_done}.png'),
                           nrow=4)
                save_model(os.path.join(out_dir,
                                        f'G_{status.batches_done}.msgpack'),
                           state['G'])
                # sidecar: progressive snapshots are only samplable knowing
                # their phase geometry (tools/fid_trend.py reads these)
                import json
                with open(os.path.join(
                        out_dir, f'G_{status.batches_done}.json'), 'w') as f:
                    json.dump(dict(resolution=resl, depth=depth, mode=g_mode,
                                   alpha=float(state['alpha'])), f)
                save_snapshot(state, bi + 1)
                check_sustained_nan(status, 'PGGAN')
        skip_batches = 0
        rng, g_params, d_params = state['rng'], state['G'], state['D']
        g_opt, d_opt, alpha = state['g_opt'], state['d_opt'], state['alpha']

        running = machine.step()
        machine.should_grow()   # optimizer re-init handled by resl change
        # phase-boundary snapshot: a kill during the growth re-trace resumes
        # at the first batch of the NEW phase/resolution. opt_fresh marks
        # that the next iteration re-initializes the optimizers (resolution
        # changed), so resume must NOT restore the stale Adam moments.
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
    imgs = G.apply({'params': g_params}, const_z, depth=max_depth, mode='s')
    save_image(np.asarray(imgs), os.path.join(out_dir, 'final.png'), nrow=4)
    save_model(os.path.join(out_dir, 'G_final.msgpack'), g_params)
    return g_params, status


def main(parser):
    parser = add_args(parser, dict(
        latent_dim=[100, 'input latent dimension'],
        gp_lambda=[10., 'lambda for gradient penalty'],
        drift_epsilon=[0.001, 'eps for drift'],
    ))
    args = parser.parse_args()
    save_args(args)

    import copy

    def dataset_factory(resl):
        a = copy.copy(args)
        a.image_size = resl
        return build_dataset(a, 'image')

    train(args, dataset_factory)
