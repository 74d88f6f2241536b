'''CycleGAN recipe (reference `implementations/CycleGAN/utils.py:24-120,
143-232`): two generators (A<->B) + two patch discriminators, LSGAN + L1
cycle consistency; constant lr for `epochs`, then linear decay to ~0 over
`decay_epochs` (reference update_lr :20). add_args mirrors the reference
schema; `--max-iters` still overrides the epoch-derived count for smokes.'''

from __future__ import annotations

import jax
import jax.numpy as jnp
import optax

from animeface_tpu.implementations.CycleGAN.model import Generator, Discriminator
from animeface_tpu.utils import add_args, save_args, make_image_grid
from animeface_tpu.nnutils import KeyGen, apply_mutable
from animeface_tpu.nnutils.accelerate import Accelerator
from animeface_tpu.nnutils.loss import LSGANLoss
from animeface_tpu.nnutils.trainer import run_training, default_max_iters
from animeface_tpu.dataset import build_dataset, DataLoader


def build_train_step(G_ab, G_ba, D_a, D_b, g_tx, d_tx, loss, cycle_lambda):
    '''Domains: a = anime/line, b = photo/rgb.'''

    def train_step(state, batch):
        a, b = batch
        rng = jax.random.split(state['rng'])[0]
        extras = {k: {c: v for c, v in state[k].items() if c != 'params'}
                  for k in ('G_ab', 'G_ba', 'D_a', 'D_b')}

        fake_b, gab_mut = apply_mutable(G_ab, state['G_ab']['params'],
                                        extras['G_ab'], a, train=True)
        fake_a, gba_mut = apply_mutable(G_ba, state['G_ba']['params'],
                                        extras['G_ba'], b, train=True)
        fb_sg, fa_sg = map(jax.lax.stop_gradient, (fake_b, fake_a))

        def d_loss_fn(d_params):
            da, db = d_params
            ra, da_mut = apply_mutable(D_a, da, extras['D_a'], a, train=True)
            fa, da_mut = apply_mutable(D_a, da, da_mut, fa_sg, train=True)
            rb, db_mut = apply_mutable(D_b, db, extras['D_b'], b, train=True)
            fb, db_mut = apply_mutable(D_b, db, db_mut, fb_sg, train=True)
            return loss.d_loss(ra, fa) + loss.d_loss(rb, fb), (da_mut, db_mut)

        (d_loss, (da_mut, db_mut)), d_grads = jax.value_and_grad(
            d_loss_fn, has_aux=True)(
            (state['D_a']['params'], state['D_b']['params']))
        d_up, d_opt = d_tx.update(
            d_grads, state['d_opt'],
            (state['D_a']['params'], state['D_b']['params']))
        d_a, d_b = optax.apply_updates(
            (state['D_a']['params'], state['D_b']['params']), d_up)

        def g_loss_fn(g_params):
            gab, gba = g_params
            fb, gab_m = apply_mutable(G_ab, gab, extras['G_ab'], a, train=True)
            fa, gba_m = apply_mutable(G_ba, gba, extras['G_ba'], b, train=True)
            rec_a, _ = apply_mutable(G_ba, gba, gba_m, fb, train=True)
            rec_b, _ = apply_mutable(G_ab, gab, gab_m, fa, train=True)
            pb, _ = apply_mutable(D_b, d_b, db_mut, fb, train=True)
            pa, _ = apply_mutable(D_a, d_a, da_mut, fa, train=True)
            adv = loss.g_loss(pb) + loss.g_loss(pa)
            cyc = jnp.mean(jnp.abs(rec_a - a)) + jnp.mean(jnp.abs(rec_b - b))
            return adv + cyc * cycle_lambda, (gab_m, gba_m)

        (g_loss, (gab_mut, gba_mut)), g_grads = jax.value_and_grad(
            g_loss_fn, has_aux=True)(
            (state['G_ab']['params'], state['G_ba']['params']))
        g_up, g_opt = g_tx.update(
            g_grads, state['g_opt'],
            (state['G_ab']['params'], state['G_ba']['params']))
        g_ab, g_ba = optax.apply_updates(
            (state['G_ab']['params'], state['G_ba']['params']), g_up)

        return dict(rng=rng,
                    G_ab={'params': g_ab, **gab_mut},
                    G_ba={'params': g_ba, **gba_mut},
                    D_a={'params': d_a, **da_mut},
                    D_b={'params': d_b, **db_mut},
                    g_opt=g_opt, d_opt=d_opt, step=state['step'] + 1), \
            dict(d=jnp.nan_to_num(d_loss), g=jnp.nan_to_num(g_loss))

    return train_step


def make_decay_schedule(args, steps_per_epoch):
    '''Constant lr for `epochs`, linear decay to ~0 over `decay_epochs`
    (reference update_lr :20-22).'''
    const = args.lr
    return optax.join_schedules(
        [optax.constant_schedule(const),
         optax.linear_schedule(const, const / max(1, args.decay_epochs),
                               args.decay_epochs * steps_per_epoch)],
        [args.epochs * steps_per_epoch])


def train(args, max_iters, loader, test_batch, name='CycleGAN'):
    accel = Accelerator(mesh_shape=tuple(args.mesh), bf16=not args.no_bf16)
    keys = KeyGen(args.seed)

    # channel counts come from the CLI (reference CycleGAN/utils.py:203-220
    # passes line_channels/rgb_channels into every constructor); the data
    # batch is asserted against them so a mismatch fails here, not in jit
    a_ch, b_ch = int(args.rgb_channels), int(args.line_channels)
    assert (a_ch, b_ch) == (test_batch[0].shape[-1], test_batch[1].shape[-1]), \
        (f'--rgb-channels/--line-channels ({a_ch},{b_ch}) do not match the '
         f'dataset batch channels '
         f'({test_batch[0].shape[-1]},{test_batch[1].shape[-1]})')
    mk_g = lambda i, o: Generator(
        image_size=args.image_size, in_channels=i, out_channels=o,
        target_resl=args.downsample_to, channels=args.channels,
        max_channels=args.max_channels, num_blocks=args.num_blocks,
        block_num_conv=args.block_num_conv, norm_name=args.g_norm_name,
        act_name=args.g_act_name, use_sn=not args.g_disable_sn,
        use_bias=not args.g_disable_bias, dtype=accel.compute_dtype)
    mk_d = lambda: Discriminator(
        channels=args.channels, num_layers=args.num_layers,
        norm_name=args.d_norm_name, act_name=args.d_act_name,
        use_sn=not args.d_disable_sn, use_bias=not args.d_disable_bias,
        dtype=accel.compute_dtype)
    G_ab, G_ba = mk_g(a_ch, b_ch), mk_g(b_ch, a_ch)
    D_a, D_b = mk_d(), mk_d()

    shape = (1, args.image_size, args.image_size)
    gab_v = G_ab.init(keys(), jnp.zeros(shape + (a_ch,)))
    gba_v = G_ba.init(keys(), jnp.zeros(shape + (b_ch,)))
    da_v = D_a.init(keys(), jnp.zeros(shape + (a_ch,)))
    db_v = D_b.init(keys(), jnp.zeros(shape + (b_ch,)))

    sched = make_decay_schedule(args, max(1, len(loader)))
    g_tx = optax.adam(sched, b1=args.betas[0], b2=args.betas[1])
    d_tx = optax.adam(sched, b1=args.betas[0], b2=args.betas[1])
    state = dict(rng=keys(),
                 G_ab=dict(gab_v), G_ba=dict(gba_v),
                 D_a=dict(da_v), D_b=dict(db_v),
                 g_opt=g_tx.init((gab_v['params'], gba_v['params'])),
                 d_opt=d_tx.init((da_v['params'], db_v['params'])),
                 step=jnp.int32(0))

    train_step = accel.jit_step(build_train_step(
        G_ab, G_ba, D_a, D_b, g_tx, d_tx, LSGANLoss(), args.cycle_lambda))

    test_a = jnp.asarray(test_batch[0])

    @jax.jit
    def _gen(state):
        return G_ab.apply(state['G_ab'], test_a, train=False)

    def sample_fn(state):
        import numpy as np
        to3 = lambda x: np.repeat(x, 3, axis=-1) if x.shape[-1] == 1 else x
        gen = to3(np.asarray(_gen(state)))
        src = to3(np.asarray(test_a))
        return make_image_grid(src, gen)

    return run_training(
        name=name, args=args, accel=accel, state=state, loader=loader,
        train_step=train_step, sample_fn=sample_fn,
        max_iters=max_iters, save_interval=args.save, nrow=4,
        ema_params_path=lambda s: {'G_ab': s['G_ab'], 'G_ba': s['G_ba']},
    )


def main(parser):
    parser = add_args(parser, dict(
        line_channels=[1, 'number of channels of line art images'],
        rgb_channels=[3, 'number of channels of the generated images'],
        test_images=[6, 'number of images for test'],
        channels=[32, 'channel width multiplier'],
        max_channels=[1024, 'maximum channels width'],
        downsample_to=[32, 'bottom width'],
        num_blocks=[6, 'number of residual blocks'],
        block_num_conv=[2, 'number of conv in resblock'],
        g_disable_sn=[False, 'disable spectral norm'],
        g_disable_bias=[False, 'disable bias'],
        g_norm_name=['in', 'normalization layer name'],
        g_act_name=['relu', 'activation function name'],
        num_layers=[3, 'number of layers in PatchGAN D'],
        d_disable_sn=[False, 'disable spectral norm'],
        d_disable_bias=[False, 'disable bias'],
        d_norm_name=['in', 'normalization layer name'],
        d_act_name=['relu', 'activation function name'],
        epochs=[100, 'epochs to train with const lr'],
        decay_epochs=[1000, 'epochs to train with linearly decaying lr'],
        lr=[0.0002, 'learning rate'],
        betas=[[0.5, 0.999], 'betas'],
        cycle_lambda=[10., 'lambda for cycle consistency loss'],
    ))
    args = parser.parse_args()
    save_args(args)

    dataset = build_dataset(args, 'xdog')
    loader = DataLoader(dataset, args.batch_size, seed=args.seed)
    test_batch = next(iter(DataLoader(dataset, args.test_images,
                                      shuffle=False, num_workers=1)))
    if args.max_iters and args.max_iters > 0:
        max_iters = default_max_iters(args, loader)
    else:
        max_iters = len(loader) * (args.epochs + args.decay_epochs)
    train(args, max_iters, loader, test_batch)
