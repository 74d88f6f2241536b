'''AniGAN recipe (reference `implementations/AniGAN/utils.py`): hinge adv on
two domain branches, feature matching on shared + branch features,
reconstruction G(B, B) ~ B, EMA G. Domains: A = anime, B = face.'''

from __future__ import annotations

import jax
import jax.numpy as jnp
import optax

from animeface_tpu.implementations.AniGAN.model import Generator, Discriminator
from animeface_tpu.implementations.pix2pixHD.utils import feature_matching
from animeface_tpu.utils import add_args, save_args, make_image_grid
from animeface_tpu.nnutils import KeyGen, update_ema
from animeface_tpu.nnutils.accelerate import Accelerator
from animeface_tpu.nnutils.loss import HingeLoss
from animeface_tpu.nnutils.trainer import run_training, default_max_iters
from animeface_tpu.dataset import build_dataset, DataLoader


def build_train_step(G, D, g_tx, d_tx, loss, rec_lambda, feature_lambda,
                     ema_decay=0.999):
    def train_step(state, batch):
        A, B = batch
        rng = jax.random.split(state['rng'])[0]

        fakeA = G.apply({'params': state['G']}, B, A)  # face content, anime style
        fakeB = G.apply({'params': state['G']}, A, B)
        fa_sg, fb_sg = map(jax.lax.stop_gradient, (fakeA, fakeB))

        def d_loss_fn(d_params):
            ra, _, _, _, _ = D.apply({'params': d_params}, A)
            _, rb, _, _, _ = D.apply({'params': d_params}, B)
            fa, _, _, _, _ = D.apply({'params': d_params}, fa_sg)
            _, fb, _, _, _ = D.apply({'params': d_params}, fb_sg)
            return loss.d_loss(ra, fa) + loss.d_loss(rb, fb)

        d_loss, d_grads = jax.value_and_grad(d_loss_fn)(state['D'])
        d_up, d_opt = d_tx.update(d_grads, state['d_opt'], state['D'])
        d_params = optax.apply_updates(state['D'], d_up)

        def g_loss_fn(g_params):
            fA = G.apply({'params': g_params}, B, A)
            fB = G.apply({'params': g_params}, A, B)
            recB = G.apply({'params': g_params}, B, B)
            _, _, sh_ra, ra_f, _ = D.apply({'params': d_params}, A)
            _, _, sh_rb, _, rb_f = D.apply({'params': d_params}, B)
            fa_p, _, sh_fa, fa_f, _ = D.apply({'params': d_params}, fA)
            _, fb_p, sh_fb, _, fb_f = D.apply({'params': d_params}, fB)
            fm = feature_matching(sh_ra, sh_fa) \
                + feature_matching(sh_rb, sh_fb) \
                + feature_matching(ra_f, fa_f) \
                + feature_matching(rb_f, fb_f)
            adv = loss.g_loss(fa_p) + loss.g_loss(fb_p)
            rec = jnp.mean(jnp.abs(recB - B))
            return adv + fm * feature_lambda + rec * rec_lambda

        g_loss, g_grads = jax.value_and_grad(g_loss_fn)(state['G'])
        g_up, g_opt = g_tx.update(g_grads, state['g_opt'], state['G'])
        g_params = optax.apply_updates(state['G'], g_up)

        return dict(rng=rng, G=g_params, D=d_params,
                    G_ema=update_ema(g_params, state['G_ema'], ema_decay),
                    g_opt=g_opt, d_opt=d_opt, step=state['step'] + 1), \
            dict(d=jnp.nan_to_num(d_loss), g=jnp.nan_to_num(g_loss))

    return train_step


def train(args, max_iters, loader, test_batch):
    accel = Accelerator(mesh_shape=tuple(args.mesh), bf16=not args.no_bf16)
    keys = KeyGen(args.seed)

    G = Generator(image_size=args.image_size, bottom_width=args.bottom_width,
                  channels=args.channels, dtype=accel.compute_dtype)
    D = Discriminator(image_size=args.image_size, channels=args.d_channels,
                      dtype=accel.compute_dtype)

    shape = (1, args.image_size, args.image_size, 3)
    g_vars = G.init(keys(), jnp.zeros(shape), jnp.zeros(shape))
    d_vars = D.init(keys(), jnp.zeros(shape))

    g_tx = optax.adam(args.lr, b1=args.betas[0], b2=args.betas[1])
    d_tx = optax.adam(args.lr, b1=args.betas[0], b2=args.betas[1])
    state = dict(rng=keys(), G=g_vars['params'], D=d_vars['params'],
                 G_ema=jax.tree_util.tree_map(jnp.copy, g_vars['params']),
                 g_opt=g_tx.init(g_vars['params']),
                 d_opt=d_tx.init(d_vars['params']), step=jnp.int32(0))

    train_step = accel.jit_step(build_train_step(
        G, D, g_tx, d_tx, HingeLoss(), args.rec_lambda, args.feature_lambda))

    test_A = jnp.asarray(test_batch[0])
    test_B = jnp.asarray(test_batch[1])

    @jax.jit
    def _gen(state):
        return G.apply({'params': state['G_ema']}, test_B, test_A)

    def sample_fn(state):
        import numpy as np
        return make_image_grid(np.asarray(test_B), np.asarray(test_A),
                               np.asarray(_gen(state)))

    return run_training(
        name='AniGAN', args=args, accel=accel, state=state, loader=loader,
        train_step=train_step, sample_fn=sample_fn,
        max_iters=max_iters, save_interval=args.save, nrow=6,
        ema_params_path=lambda s: s['G_ema'],
    )


def main(parser):
    parser = add_args(parser, dict(
        num_test=[4, 'eval samples'],
        bottom_width=[8, 'bottom width'],
        channels=[32, 'G channel width'],
        d_channels=[32, 'D channel width'],
        lr=[0.0002, 'learning rate'],
        betas=[[0.5, 0.999], 'betas'],
        rec_lambda=[10., 'lambda for reconstruction'],
        feature_lambda=[1., 'lambda for feature matching'],
    ))
    args = parser.parse_args()
    save_args(args)

    dataset = build_dataset(args, 'celeba')
    loader = DataLoader(dataset, args.batch_size, seed=args.seed)
    test_batch = next(iter(DataLoader(dataset, args.num_test, shuffle=False,
                                      num_workers=1)))
    max_iters = default_max_iters(args, loader)
    train(args, max_iters, loader, test_batch)
