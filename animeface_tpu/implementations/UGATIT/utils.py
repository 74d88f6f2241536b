'''UGATIT recipe (reference `implementations/UGATIT/utils.py`): dual
generators + multi-scale CAM discriminators; LSGAN adv on probs AND cam
logits (:99-106), generator CAM BCE (translated->1, identity->0, :131-136),
cycle + identity L1, separate --g_lr/--d_lr Adam (:237-238).'''

from __future__ import annotations

import jax
import jax.numpy as jnp
import optax

from animeface_tpu.implementations.UGATIT.model import Generator, MultiScaleD
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
            ra, ra_cam = DA.apply({'params': da}, A)
            rb, rb_cam = DB.apply({'params': db}, B)
            fa, fa_cam = DA.apply({'params': da}, BA_sg)
            fb, fb_cam = DB.apply({'params': db}, AB_sg)
            adv = loss.d_loss(ra, fa) + loss.d_loss(rb, fb)
            cam = loss.d_loss(ra_cam, fa_cam) + loss.d_loss(rb_cam, fb_cam)
            return adv + cam

        d_loss, d_grads = jax.value_and_grad(d_loss_fn)(
            (state['DA'], state['DB']))
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
            fa, fa_cam = DA.apply({'params': da_p}, ba)
            fb, fb_cam = DB.apply({'params': db_p}, ab)
            adv = loss.g_loss(fa) + loss.g_loss(fb) \
                + loss.g_loss(fa_cam) + loss.g_loss(fb_cam)
            out = adv
            if id_lambda > 0:
                ident = jnp.mean(jnp.abs(aa - A)) + jnp.mean(jnp.abs(bb - B))
                out = out + ident * id_lambda
            if cycle_lambda > 0:
                cyc = jnp.mean(jnp.abs(aba - A)) + jnp.mean(jnp.abs(bab - B))
                out = out + cyc * cycle_lambda
            if cam_lambda > 0:
                # generator CAM: translated -> 1, identity -> 0
                cam = _cam_bce(ba_cam, True) + _cam_bce(aa_cam, False) \
                    + _cam_bce(ab_cam, True) + _cam_bce(bb_cam, False)
                out = out + cam * cam_lambda
            return out

        g_loss, g_grads = jax.value_and_grad(g_loss_fn)(
            (state['GA'], state['GB']))
        g_up, g_opt = g_tx.update(g_grads, state['g_opt'],
                                  (state['GA'], state['GB']))
        ga_p, gb_p = optax.apply_updates((state['GA'], state['GB']), g_up)

        return dict(rng=rng, GA=ga_p, GB=gb_p, DA=da_p, DB=db_p,
                    g_opt=g_opt, d_opt=d_opt, step=state['step'] + 1), \
            dict(d=jnp.nan_to_num(d_loss), g=jnp.nan_to_num(g_loss))

    return train_step


def train(args, max_iters, loader, test_batch):
    accel = Accelerator(mesh_shape=tuple(args.mesh), bf16=not args.no_bf16)
    keys = KeyGen(args.seed)

    # both domains are --image-channels wide (reference UGATIT/utils.py:
    # 216-229 passes image_channels into all four nets); asserted vs data
    a_ch = b_ch = int(args.image_channels)
    assert (a_ch, b_ch) == (test_batch[0].shape[-1], test_batch[1].shape[-1]), \
        (f'--image-channels {a_ch} does not match the dataset batch channels '
         f'({test_batch[0].shape[-1]},{test_batch[1].shape[-1]})')
    mk = lambda io: Generator(image_size=args.image_size, bottom=args.bottom,
                              channels=args.g_channels,
                              max_channels=args.g_max_channels,
                              resblocks=args.resblocks,
                              adalinresblocks=args.adalinresblocks,
                              act_name=args.g_act_name,
                              norm_name=args.norm_name, light=args.light,
                              io_channels=io, dtype=accel.compute_dtype)
    GA, GB = mk(a_ch), mk(b_ch)   # GA: B->A requires a_ch==b_ch in reference;
    mkd = lambda io: MultiScaleD(num_scale=args.num_scale,
                                 num_layers=args.num_layers,
                                 channels=args.d_channels,
                                 max_channels=args.d_max_channels,
                                 act_name=args.d_act_name, in_channels=io,
                                 dtype=accel.compute_dtype)
    DA, DB = mkd(a_ch), mkd(b_ch)

    shape = (1, args.image_size, args.image_size)
    ga_v = GA.init(keys(), jnp.zeros(shape + (b_ch,)), train=True)
    gb_v = GB.init(keys(), jnp.zeros(shape + (a_ch,)), train=True)
    da_v = DA.init(keys(), jnp.zeros(shape + (a_ch,)))
    db_v = DB.init(keys(), jnp.zeros(shape + (b_ch,)))

    g_tx = optax.adam(args.g_lr, b1=args.betas[0], b2=args.betas[1])
    d_tx = optax.adam(args.d_lr, b1=args.betas[0], b2=args.betas[1])
    state = dict(rng=keys(),
                 GA=ga_v['params'], GB=gb_v['params'],
                 DA=da_v['params'], DB=db_v['params'],
                 g_opt=g_tx.init((ga_v['params'], gb_v['params'])),
                 d_opt=d_tx.init((da_v['params'], db_v['params'])),
                 step=jnp.int32(0))

    train_step = accel.jit_step(build_train_step(
        GA, GB, DA, DB, g_tx, d_tx, LSGANLoss(),
        args.cycle_lambda, args.identity_lambda, args.cam_lambda))

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
        image_channels=[3, 'image channels'],
        bottom=[int, 'bottom size. if not specified, will be '
                     'image_size // 4'],
        g_channels=[64, 'minimum channel width'],
        g_max_channels=[512, 'maximum channel width'],
        resblocks=[6, 'number of residual blocks'],
        adalinresblocks=[6, 'number of adalin residual blocks'],
        g_act_name=['relu', 'activation function name'],
        norm_name=['in', 'normalization layer name'],
        light=[False, 'light weight'],
        num_scale=[2, 'number of scales for multi scale D'],
        num_layers=[3, 'number of layers'],
        d_channels=[64, 'minimum channel width'],
        d_max_channels=[512, 'maximum channel width'],
        d_act_name=['relu', 'activation function name'],
        g_lr=[0.0002, 'learning rate'],
        d_lr=[0.0002, 'learning rate'],
        betas=[[0.5, 0.999], 'betas'],
        cycle_lambda=[10., 'lambda for cycle consistency loss'],
        identity_lambda=[10., 'lambda for identity loss'],
        cam_lambda=[1000., 'lambda for CAM loss'],
    ))
    args = parser.parse_args()
    save_args(args)

    dataset = build_dataset(args, 'celeba')
    loader = DataLoader(dataset, args.batch_size, seed=args.seed)
    test_batch = next(iter(DataLoader(dataset, args.num_test, shuffle=False,
                                      num_workers=1)))
    max_iters = default_max_iters(args, loader)
    train(args, max_iters, loader, test_batch)
