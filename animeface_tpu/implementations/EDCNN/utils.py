'''EDCNN recipe (author-original, reference `implementations/original/EDCNN`):
reference-based colorization with Sobel-enhanced sketch encoder; LSGAN +
L1 + VGG losses.'''

from __future__ import annotations

import jax
import jax.numpy as jnp
import optax

from animeface_tpu.implementations.EDCNN.model import Generator, Discriminator
from animeface_tpu.implementations.SCFT.tps import tps_transform
from animeface_tpu.utils import add_args, save_args, make_image_grid
from animeface_tpu.nnutils import KeyGen
from animeface_tpu.nnutils.accelerate import Accelerator
from animeface_tpu.nnutils.loss import LSGANLoss
from animeface_tpu.nnutils.loss.vgg import VGGLoss
from animeface_tpu.nnutils.trainer import run_training, default_max_iters
from animeface_tpu.dataset import build_dataset, DataLoader


def build_train_step(G, D, g_tx, d_tx, loss, vgg, recon_lambda, style_lambda):
    def train_step(state, batch):
        real, sketch = batch
        rng, tk = jax.random.split(state['rng'])
        ref = tps_transform(tk, real)

        fake = G.apply({'params': state['G']}, sketch, ref)
        fake_sg = jax.lax.stop_gradient(fake)
        d_in = lambda img: jnp.concatenate([sketch, img], axis=-1)

        def d_loss_fn(d_params):
            d_vars = {'params': d_params,
                      'batch_stats': state['D']['batch_stats']}
            real_outs, d_mut = D.apply(d_vars, d_in(real), train=True,
                                       mutable=['batch_stats'])
            fake_outs, d_mut = D.apply({'params': d_params, **d_mut},
                                       d_in(fake_sg), train=True,
                                       mutable=['batch_stats'])
            d_loss = 0.0
            for (r, _), (f, _) in zip(real_outs, fake_outs):
                d_loss = d_loss + loss.d_loss(r, f)
            return d_loss, d_mut

        (d_loss, d_mut), d_grads = jax.value_and_grad(d_loss_fn, has_aux=True)(
            state['D']['params'])
        d_up, d_opt = d_tx.update(d_grads, state['d_opt'], state['D']['params'])
        d_params = optax.apply_updates(state['D']['params'], d_up)

        def g_loss_fn(g_params):
            fake2 = G.apply({'params': g_params}, sketch, ref)
            fake_outs, _ = D.apply({'params': d_params, **d_mut}, d_in(fake2),
                                   train=True, mutable=['batch_stats'])
            g_loss = 0.0
            for f, _ in fake_outs:
                g_loss = g_loss + loss.g_loss(f)
            g_loss = g_loss + jnp.mean(jnp.abs(fake2 - real)) * recon_lambda
            g_loss = g_loss + vgg.style_loss(real, fake2) * style_lambda
            return g_loss

        g_loss, g_grads = jax.value_and_grad(g_loss_fn)(state['G'])
        g_up, g_opt = g_tx.update(g_grads, state['g_opt'], state['G'])
        g_params = optax.apply_updates(state['G'], g_up)

        return dict(rng=rng, G=g_params, D={'params': d_params, **d_mut},
                    g_opt=g_opt, d_opt=d_opt, step=state['step'] + 1), \
            dict(d=jnp.nan_to_num(d_loss), g=jnp.nan_to_num(g_loss))

    return train_step


def train(args, max_iters, loader, test_batch):
    accel = Accelerator(mesh_shape=tuple(args.mesh), bf16=not args.no_bf16)
    keys = KeyGen(args.seed)

    sk_ch = int(test_batch[1].shape[-1])
    G = Generator(image_size=args.image_size, sketch_channels=sk_ch,
                  style_dim=args.style_dim, channels=args.channels,
                  dtype=accel.compute_dtype)
    D = Discriminator(num_scale=2, channels=args.d_channels, sn=False,
                      dtype=accel.compute_dtype)

    shape = (1, args.image_size, args.image_size)
    g_vars = G.init(keys(), jnp.zeros(shape + (sk_ch,)),
                    jnp.zeros(shape + (3,)))
    d_vars = D.init(keys(), jnp.zeros(shape + (3 + sk_ch,)), train=True)
    if 'batch_stats' not in d_vars:
        d_vars = {'params': d_vars['params'], 'batch_stats': {}}

    g_tx = optax.adam(args.lr, b1=args.betas[0], b2=args.betas[1])
    d_tx = optax.adam(args.lr, b1=args.betas[0], b2=args.betas[1])
    state = dict(rng=keys(), G=g_vars['params'], D=d_vars,
                 g_opt=g_tx.init(g_vars['params']),
                 d_opt=d_tx.init(d_vars['params']), step=jnp.int32(0))

    vgg = VGGLoss(vgg=16)
    train_step = accel.jit_step(build_train_step(
        G, D, g_tx, d_tx, LSGANLoss(), vgg, args.recon_lambda,
        args.style_lambda))

    test_real = jnp.asarray(test_batch[0])
    test_sketch = jnp.asarray(test_batch[1])

    @jax.jit
    def _gen(state):
        return G.apply({'params': state['G']}, test_sketch, test_real)

    def sample_fn(state):
        import numpy as np
        sk3 = np.repeat(np.asarray(test_sketch), 3, axis=-1) \
            if test_sketch.shape[-1] == 1 else np.asarray(test_sketch)
        return make_image_grid(sk3, np.asarray(test_real),
                               np.asarray(_gen(state)))

    return run_training(
        name='EDCNN', args=args, accel=accel, state=state, loader=loader,
        train_step=train_step, sample_fn=sample_fn,
        max_iters=max_iters, save_interval=args.save, nrow=6,
        ema_params_path=lambda s: s['G'],
    )


def main(parser):
    parser = add_args(parser, dict(
        num_test=[4, 'eval samples'],
        style_dim=[256, 'style dimension'],
        channels=[32, 'G channel width'],
        d_channels=[32, 'D channel width'],
        lr=[0.0002, 'learning rate'],
        betas=[[0.5, 0.999], 'betas'],
        recon_lambda=[10., 'lambda for L1'],
        style_lambda=[50., 'lambda for VGG style'],
    ))
    args = parser.parse_args()
    save_args(args)

    dataset = build_dataset(args, 'xdog')
    loader = DataLoader(dataset, args.batch_size, seed=args.seed)
    test_batch = next(iter(DataLoader(dataset, args.num_test, shuffle=False,
                                      num_workers=1)))
    max_iters = default_max_iters(args, loader)
    train(args, max_iters, loader, test_batch)
