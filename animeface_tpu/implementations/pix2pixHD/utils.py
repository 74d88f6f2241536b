'''pix2pixHD recipe (reference `implementations/pix2pixHD/utils.py`): the
two-phase coarse-to-fine protocol — first invocation trains ONLY the global
G at half resolution against the finest `g_d_scale` D scales and writes
`global_final.msgpack`; a second invocation resumes from it and trains the
local G at full resolution (all `l_d_scale` scales), unfreezing the whole G
after `fine_from` epochs (reference :216-218 re-inits the optimizer — here
frozen subtrees keep zero Adam moments, so unmasking is equivalent). LSGAN +
pix2pixHD feature matching (layer weight 4/len, :20-25), N(0,0.02) init
(:281), and per-epoch linear lr decay over the second half of training
(:27-29, :114-116: delta = lr/epochs/2).'''

from __future__ import annotations

import os

import numpy as np
import jax
import jax.numpy as jnp
import optax

from animeface_tpu.implementations.pix2pixHD.model import (
    Generator, Discriminator,
)
from animeface_tpu.utils import add_args, save_args, make_image_grid
from animeface_tpu.utils.argument import result_dir
from animeface_tpu.nnutils import KeyGen
from animeface_tpu.nnutils.accelerate import Accelerator
from animeface_tpu.nnutils.initialize import apply_init
from animeface_tpu.nnutils.loss import LSGANLoss
from animeface_tpu.nnutils.trainer import (
    run_training, host_step_counter,
)
from animeface_tpu.checkpoint import save_model, load_model
from animeface_tpu.dataset import build_dataset, DataLoader


def feature_matching(real_feats, fake_feats):
    '''Per-layer L1 with weight 4/len (reference utils.py:20-25).'''
    loss = 0.0
    w = 4.0 / len(real_feats)
    for rf, ff in zip(real_feats, fake_feats):
        loss = loss + jnp.mean(jnp.abs(jax.lax.stop_gradient(rf) - ff)) * w
    return loss


def _mask_grads(grads, keep_prefixes):
    '''Zero every top-level subtree whose name is not in keep_prefixes
    (None keeps everything). Frozen params then have exactly zero Adam
    updates and zero moments — matching the reference's separate/fresh
    optimizers per phase.'''
    if keep_prefixes is None:
        return grads
    return {k: (v if any(k.startswith(p) for p in keep_prefixes)
                else jax.tree_util.tree_map(jnp.zeros_like, v))
            for k, v in grads.items()}


def build_train_step(G, D, g_tx, d_tx, loss, feat_lambda, d_scale,
                     g_keep, d_keep, global_phase):
    def g_apply(params, line):
        if global_phase:
            return G.apply({'params': params}, line,
                           method=Generator.global_forward)
        fake, _ = G.apply({'params': params}, line)
        return fake

    def train_step(state, batch):
        image, line = batch
        rng = jax.random.split(state['rng'])[0]
        d_in = lambda x: jnp.concatenate([line, x], axis=-1)

        fake = g_apply(state['G'], line)
        fake_sg = jax.lax.stop_gradient(fake)

        def d_loss_fn(d_params):
            real_outs = D.apply({'params': d_params}, d_in(image))
            fake_outs = D.apply({'params': d_params}, d_in(fake_sg))
            d_loss = 0.0
            for i in range(d_scale):
                d_loss = d_loss + loss.d_loss(real_outs[i][0],
                                              fake_outs[i][0])
            return d_loss

        d_loss, d_grads = jax.value_and_grad(d_loss_fn)(state['D'])
        d_grads = _mask_grads(d_grads, d_keep)
        d_up, d_opt = d_tx.update(d_grads, state['d_opt'], state['D'])
        d_params = optax.apply_updates(state['D'], d_up)

        def g_loss_fn(g_params):
            fake2 = g_apply(g_params, line)
            real_outs = D.apply({'params': d_params}, d_in(image))
            fake_outs = D.apply({'params': d_params}, d_in(fake2))
            g_loss = 0.0
            for i in range(d_scale):
                g_loss = g_loss + loss.g_loss(fake_outs[i][0])
                if feat_lambda > 0:
                    g_loss = g_loss + feature_matching(
                        real_outs[i][1], fake_outs[i][1]) \
                        * feat_lambda / d_scale
            return g_loss

        g_loss, g_grads = jax.value_and_grad(g_loss_fn)(state['G'])
        g_grads = _mask_grads(g_grads, g_keep)
        g_up, g_opt = g_tx.update(g_grads, state['g_opt'], state['G'])
        g_params = optax.apply_updates(state['G'], g_up)

        return dict(rng=rng, G=g_params, D=d_params,
                    g_opt=g_opt, d_opt=d_opt, step=state['step'] + 1), \
            dict(d=jnp.nan_to_num(d_loss), g=jnp.nan_to_num(g_loss))

    return train_step


def _decay_schedule(base_lr, max_iters, steps_per_epoch):
    '''Constant, then −delta per epoch once past max_iters//2
    (reference update_lr :27 + the epoch-end hook :114-116).'''
    def sched(count):
        epochs = (max_iters + steps_per_epoch - 1) // steps_per_epoch
        delta = base_lr / max(epochs, 1) / 2
        half_epoch = (max_iters // 2 + 1) // max(steps_per_epoch, 1)
        decs = jnp.maximum(count // max(steps_per_epoch, 1) - half_epoch, 0)
        return jnp.maximum(base_lr - delta * decs, 0.0)
    return sched


def train(args, loader, test_batch, global_phase, global_ckpt,
          name='pix2pixHD'):
    accel = Accelerator(mesh_shape=tuple(args.mesh), bf16=not args.no_bf16)
    keys = KeyGen(args.seed)

    G = Generator(out_channels=args.target_channels, channels=args.channels,
                  local_num_blocks=args.local_num_blocks,
                  global_num_blocks=args.global_num_blocks,
                  global_num_downs=args.global_num_downs,
                  norm_name=args.g_norm_name, act_name=args.g_act_name,
                  dtype=accel.compute_dtype)
    D = Discriminator(channels=args.channels, num_scales=args.d_num_scale,
                      norm_name=args.d_norm_name, act_name=args.d_act_name,
                      dtype=accel.compute_dtype)

    full = args.image_size
    g_vars = G.init(keys(), jnp.zeros((1, full, full, args.input_channels)))
    d_res = full // 2 if global_phase else full
    d_vars = D.init(keys(), jnp.zeros(
        (1, d_res, d_res, args.input_channels + args.target_channels)))
    g_params = apply_init(keys(), g_vars['params'], 'N002')
    d_params = apply_init(keys(), d_vars['params'], 'N002')
    if not global_phase:
        saved = load_model(global_ckpt, {'G': g_params, 'D': d_params})
        g_params, d_params = saved['G'], saved['D']

    epochs = args.g_epochs if global_phase else args.l_epochs
    if args.max_iters and args.max_iters > 0:
        max_iters = args.max_iters
    else:
        max_iters = len(loader) * epochs
    sched = _decay_schedule(args.lr, max_iters, max(len(loader), 1))
    g_tx = optax.adam(sched, b1=args.betas[0], b2=args.betas[1])
    d_tx = optax.adam(sched, b1=args.betas[0], b2=args.betas[1])

    state = dict(rng=keys(), G=g_params, D=d_params,
                 g_opt=g_tx.init(g_params), d_opt=d_tx.init(d_params),
                 step=jnp.int32(0))

    loss = LSGANLoss()
    if global_phase:
        d_scale = min(args.g_d_scale, args.d_num_scale)
        d_keep = tuple(f'scale_{i}' for i in range(d_scale))
        jit_main = accel.jit_step(build_train_step(
            G, D, g_tx, d_tx, loss, args.feat_lambda, d_scale,
            ('global_g',), d_keep, True))
        steps = {'pre': jit_main, 'fine': jit_main}
        fine_from_iter = None
    else:
        d_scale = min(args.l_d_scale, args.d_num_scale)
        steps = {
            'pre': accel.jit_step(build_train_step(
                G, D, g_tx, d_tx, loss, args.feat_lambda, d_scale,
                ('local_g',), None, False)),
            'fine': accel.jit_step(build_train_step(
                G, D, g_tx, d_tx, loss, args.feat_lambda, d_scale,
                None, None, False)),
        }
        fine_from_iter = len(loader) * args.fine_from
    next_index = host_step_counter()

    def train_step(state, batch):
        i = next_index(state)
        if fine_from_iter is not None and i >= fine_from_iter:
            return steps['fine'](state, batch)
        return steps['pre'](state, batch)

    test_image = jnp.asarray(test_batch[0])
    test_line = jnp.asarray(test_batch[1])

    @jax.jit
    def _gen(state):
        if global_phase:
            return G.apply({'params': state['G']}, test_line,
                           method=Generator.global_forward)
        fake, _ = G.apply({'params': state['G']}, test_line)
        return fake

    def sample_fn(state):
        gen = np.asarray(_gen(state))
        line3 = np.repeat(np.asarray(test_line), 3, axis=-1) \
            if test_line.shape[-1] == 1 else np.asarray(test_line)
        return make_image_grid(line3, gen, np.asarray(test_image))

    out = run_training(
        name=name, args=args, accel=accel, state=state, loader=loader,
        train_step=train_step, sample_fn=sample_fn,
        max_iters=max_iters, save_interval=args.save, nrow=6,
        ema_params_path=lambda s: s['G'],
    )
    if global_phase:
        save_model(global_ckpt, {'G': jax.device_get(out[0]['G']),
                                 'D': jax.device_get(out[0]['D'])})
        print('global phase done; run the same command again to train the '
              'local generator.')
    return out


def main(parser):
    parser = add_args(parser, dict(
        num_test=[4, 'eval samples'],
        input_channels=[1, 'input image channels'],
        target_channels=[3, 'output image channels'],
        channels=[32, 'channel width multiplier'],
        local_num_blocks=[3, 'number of resblocks in local G'],
        global_num_blocks=[3, 'number of reblocks in global G'],
        global_num_downs=[4, 'number of down sampling blocks in global G'],
        g_norm_name=['in', 'normalization layer name'],
        g_act_name=['relu', 'activation function name'],
        d_num_scale=[3, 'number of scales'],
        d_norm_name=['in', 'normalization layer name'],
        d_act_name=['lrelu', 'activatoin function name'],
        g_epochs=[200, 'epochs to train global G'],
        g_d_scale=[2, 'number of scales in D when training global G'],
        l_epochs=[100, 'epochs to train local G'],
        l_d_scale=[3, 'number of scales in D when training local G'],
        fine_from=[10, 'when to start fine-tune when training local G'],
        lr=[0.0002, 'learning rate'],
        betas=[[0.5, 0.999], 'betas'],
        feat_lambda=[10., 'lambda for feature matching loss'],
    ))
    args = parser.parse_args()
    save_args(args)

    global_ckpt = os.path.join(result_dir('pix2pixHD'),
                               'global_final.msgpack')
    global_phase = not os.path.exists(global_ckpt)
    size = args.image_size // 2 if global_phase else args.image_size

    # the dataset is rebuilt at the phase resolution (reference :288/:311)
    phase_args = args
    orig_size = args.image_size
    args.image_size = size
    dataset = build_dataset(args, 'xdog')
    args.image_size = orig_size
    loader = DataLoader(dataset, args.batch_size, seed=args.seed)
    test_batch = next(iter(DataLoader(dataset, args.num_test, shuffle=False,
                                      num_workers=1)))
    train(phase_args, loader, test_batch, global_phase, global_ckpt)
