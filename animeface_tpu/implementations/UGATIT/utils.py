'''UGATIT recipe (reference `implementations/UGATIT/utils.py`): dual
generators/discriminators with LSGAN adv + CAM BCE + cycle + identity
losses.'''

from __future__ import annotations

import jax
import jax.numpy as jnp
import optax

from animeface_tpu.implementations.UGATIT.model import Generator, Discriminator
from animeface_tpu.utils import add_args, save_args, make_image_grid
from animeface_tpu.nnutils import KeyGen
from animeface_tpu.nnutils.accelerate import Accelerator
from animeface_tpu.nnutils.loss import LSGANLoss
from animeface_tpu.nnutils.loss.gan import _bce_with_logits
from animeface_tpu.nnutils.trainer import run_training, default_max_iters
from animeface_tpu.dataset import build_dataset, DataLoader


def _cam_bce(logit, target):
    t = jnp.ones_like(logit) if target else jnp.zeros_like(logit)
    return _bce_with_logits(logit, t)


def build_train_step(GA, GB, DA, DB, g_tx, d_tx, loss,
                     cycle_lambda, id_lambda, cam_lambda):
    '''Domains: A, B. GA: B->A, GB: A->B (reference naming).'''

    def train_step(state, batch):
        A, B = batch
        rng = jax.random.split(state['rng'])[0]

        def g_apply(params, model, x):
            return model.apply({'params': params}, x, train=True)

        AB, _ = g_apply(state['GB'], GB, A)
        BA, _ = g_apply(state['GA'], GA, B)
        AB_sg, BA_sg = map(jax.lax.stop_gradient, (AB, BA))

        def d_loss_fn(d_params):
            da, db = d_params
            (ra, ra_cam), da_mut = DA.apply(
                {'params': da, 'batch_stats': state['DA_bs']}, A, train=True,
                mutable=['batch_stats'])
            (rb, rb_cam), db_mut = DB.apply(
                {'params': db, 'batch_stats': state['DB_bs']}, B, train=True,
                mutable=['batch_stats'])
            (fa, fa_cam), da_mut = DA.apply(
                {'params': da, **da_mut}, BA_sg, train=True,
                mutable=['batch_stats'])
            (fb, fb_cam), db_mut = DB.apply(
                {'params': db, **db_mut}, AB_sg, train=True,
                mutable=['batch_stats'])
            adv = loss.d_loss(ra, fa) + loss.d_loss(rb, fb)
            cam = loss.d_loss(ra_cam, fa_cam) + loss.d_loss(rb_cam, fb_cam)
            return adv + cam, (da_mut['batch_stats'], db_mut['batch_stats'])

        (d_loss, (da_bs, db_bs)), d_grads = jax.value_and_grad(
            d_loss_fn, has_aux=True)((state['DA'], state['DB']))
        d_up, d_opt = d_tx.update(d_grads, state['d_opt'],
                                  (state['DA'], state['DB']))
        da_p, db_p = optax.apply_updates((state['DA'], state['DB']), d_up)

        def g_loss_fn(g_params):
            ga, gb = g_params
            ab, ab_cam = g_apply(gb, GB, A)
            ba, ba_cam = g_apply(ga, GA, B)
            aa, aa_cam = g_apply(ga, GA, A)       # identity
            bb, bb_cam = g_apply(gb, GB, B)
            aba, _ = g_apply(ga, GA, ab)           # cycle
            bab, _ = g_apply(gb, GB, ba)
            (fa, fa_cam), _ = DA.apply(
                {'params': da_p, 'batch_stats': da_bs}, ba, train=True,
                mutable=['batch_stats'])
            (fb, fb_cam), _ = DB.apply(
                {'params': db_p, 'batch_stats': db_bs}, ab, train=True,
                mutable=['batch_stats'])
            adv = loss.g_loss(fa) + loss.g_loss(fb) \
                + loss.g_loss(fa_cam) + loss.g_loss(fb_cam)
            cyc = jnp.mean(jnp.abs(aba - A)) + jnp.mean(jnp.abs(bab - B))
            ident = jnp.mean(jnp.abs(aa - A)) + jnp.mean(jnp.abs(bb - B))
            # generator CAM: translated -> 1, identity -> 0
            cam = _cam_bce(ba_cam, True) + _cam_bce(aa_cam, False) \
                + _cam_bce(ab_cam, True) + _cam_bce(bb_cam, False)
            return adv + cyc * cycle_lambda + ident * id_lambda \
                + cam * cam_lambda

        g_loss, g_grads = jax.value_and_grad(g_loss_fn)(
            (state['GA'], state['GB']))
        g_up, g_opt = g_tx.update(g_grads, state['g_opt'],
                                  (state['GA'], state['GB']))
        ga_p, gb_p = optax.apply_updates((state['GA'], state['GB']), g_up)

        return dict(rng=rng, GA=ga_p, GB=gb_p, DA=da_p, DB=db_p,
                    DA_bs=da_bs, DB_bs=db_bs,
                    g_opt=g_opt, d_opt=d_opt, step=state['step'] + 1), \
            dict(d=jnp.nan_to_num(d_loss), g=jnp.nan_to_num(g_loss))

    return train_step


def train(args, max_iters, loader, test_batch):
    accel = Accelerator(mesh_shape=tuple(args.mesh), bf16=not args.no_bf16)
    keys = KeyGen(args.seed)

    a_ch = int(test_batch[0].shape[-1])
    b_ch = int(test_batch[1].shape[-1])
    mk = lambda io: Generator(image_size=args.image_size,
                              channels=args.channels,
                              resblocks=args.resblocks,
                              adalinresblocks=args.adalinresblocks,
                              io_channels=io, dtype=accel.compute_dtype)
    GA, GB = mk(a_ch), mk(b_ch)   # GA: B->A requires a_ch==b_ch in reference;
    DA = Discriminator(channels=args.d_channels, dtype=accel.compute_dtype)
    DB = Discriminator(channels=args.d_channels, dtype=accel.compute_dtype)

    shape = (1, args.image_size, args.image_size)
    ga_v = GA.init(keys(), jnp.zeros(shape + (b_ch,)), train=True)
    gb_v = GB.init(keys(), jnp.zeros(shape + (a_ch,)), train=True)
    da_v = DA.init(keys(), jnp.zeros(shape + (a_ch,)), train=True)
    db_v = DB.init(keys(), jnp.zeros(shape + (b_ch,)), train=True)

    g_tx = optax.adam(args.lr, b1=args.betas[0], b2=args.betas[1])
    d_tx = optax.adam(args.lr, b1=args.betas[0], b2=args.betas[1])
    state = dict(rng=keys(),
                 GA=ga_v['params'], GB=gb_v['params'],
                 DA=da_v['params'], DB=db_v['params'],
                 DA_bs=da_v.get('batch_stats', {}),
                 DB_bs=db_v.get('batch_stats', {}),
                 g_opt=g_tx.init((ga_v['params'], gb_v['params'])),
                 d_opt=d_tx.init((da_v['params'], db_v['params'])),
                 step=jnp.int32(0))

    train_step = accel.jit_step(build_train_step(
        GA, GB, DA, DB, g_tx, d_tx, LSGANLoss(),
        args.cycle_lambda, args.id_lambda, args.cam_lambda))

    test_A = jnp.asarray(test_batch[0])

    @jax.jit
    def _gen(state):
        out, _ = GB.apply({'params': state['GB']}, test_A, train=False)
        return out

    def sample_fn(state):
        import numpy as np
        to3 = lambda x: np.repeat(x, 3, axis=-1) if x.shape[-1] == 1 else x
        return make_image_grid(to3(np.asarray(test_A)),
                               to3(np.asarray(_gen(state))))

    return run_training(
        name='UGATIT', args=args, accel=accel, state=state, loader=loader,
        train_step=train_step, sample_fn=sample_fn,
        max_iters=max_iters, save_interval=args.save, nrow=4,
        ema_params_path=lambda s: {'GA': s['GA'], 'GB': s['GB']},
    )


def main(parser):
    parser = add_args(parser, dict(
        num_test=[4, 'eval samples'],
        channels=[64, 'G channel width'],
        resblocks=[6, 'encoder res blocks'],
        adalinresblocks=[6, 'AdaLIN res blocks'],
        d_channels=[64, 'D channel width'],
        lr=[0.0001, 'learning rate'],
        betas=[[0.5, 0.999], 'betas'],
        cycle_lambda=[10., 'lambda for cycle'],
        id_lambda=[10., 'lambda for identity'],
        cam_lambda=[1000., 'lambda for CAM BCE'],
    ))
    args = parser.parse_args()
    save_args(args)

    dataset = build_dataset(args, 'celeba')
    loader = DataLoader(dataset, args.batch_size, seed=args.seed)
    test_batch = next(iter(DataLoader(dataset, args.num_test, shuffle=False,
                                      num_workers=1)))
    max_iters = default_max_iters(args, loader)
    train(args, max_iters, loader, test_batch)
