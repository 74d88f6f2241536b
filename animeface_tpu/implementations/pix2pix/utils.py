'''pix2pix recipe (reference `implementations/pix2pix/utils.py`): LSGAN +
L1 pixelwise loss on auto-generated pairs.'''

from __future__ import annotations

import jax
import jax.numpy as jnp
import optax

from animeface_tpu.implementations.pix2pix.model import Generator, Discriminator
from animeface_tpu.utils import add_args, save_args, make_image_grid
from animeface_tpu.nnutils import KeyGen
from animeface_tpu.nnutils.accelerate import Accelerator
from animeface_tpu.nnutils.loss import LSGANLoss
from animeface_tpu.nnutils.trainer import run_training, default_max_iters
from animeface_tpu.dataset import build_dataset, DataLoader


def build_train_step(G, D, g_tx, d_tx, loss, pixelwise_gamma):
    def train_step(state, batch):
        # pairs: source (input) -> target image
        target, source = batch
        rng, dkey, gkey = jax.random.split(state['rng'], 3)

        fake = G.apply({'params': state['G']}, source, train=True,
                       rngs={'dropout': gkey})
        fake_sg = jax.lax.stop_gradient(fake)

        def d_loss_fn(d_params):
            real_prob = D.apply({'params': d_params},
                                jnp.concatenate([target, source], axis=-1))
            fake_prob = D.apply({'params': d_params},
                                jnp.concatenate([fake_sg, source], axis=-1))
            return loss.d_loss(real_prob, fake_prob)

        d_loss, d_grads = jax.value_and_grad(d_loss_fn)(state['D'])
        d_up, d_opt = d_tx.update(d_grads, state['d_opt'], state['D'])
        d_params = optax.apply_updates(state['D'], d_up)

        def g_loss_fn(g_params):
            fake2 = G.apply({'params': g_params}, source, train=True,
                            rngs={'dropout': gkey})
            fake_prob = D.apply({'params': d_params},
                                jnp.concatenate([fake2, source], axis=-1))
            adv = loss.g_loss(fake_prob)
            pix = jnp.mean(jnp.abs(fake2 - target))
            return adv + pix * pixelwise_gamma

        g_loss, g_grads = jax.value_and_grad(g_loss_fn)(state['G'])
        g_up, g_opt = g_tx.update(g_grads, state['g_opt'], state['G'])
        g_params = optax.apply_updates(state['G'], g_up)

        return dict(rng=rng, G=g_params, D=d_params, g_opt=g_opt,
                    d_opt=d_opt, step=state['step'] + 1), \
            dict(d=d_loss, g=g_loss)

    return train_step


def train(args, max_iters, loader, test_batch, name='pix2pix'):
    accel = Accelerator(mesh_shape=tuple(args.mesh), bf16=not args.no_bf16)
    keys = KeyGen(args.seed)

    src_ch = int(test_batch[1].shape[-1])
    tgt_ch = int(test_batch[0].shape[-1])
    G = Generator(image_size=args.image_size, image_channels=tgt_ch,
                  drop_out=args.drop_out, dtype=accel.compute_dtype)
    D = Discriminator(dtype=accel.compute_dtype)
    shape = (1, args.image_size, args.image_size)
    g_vars = G.init({'params': keys(), 'dropout': keys()},
                    jnp.zeros(shape + (src_ch,)))
    d_vars = D.init(keys(), jnp.zeros(shape + (tgt_ch + src_ch,)))

    g_tx = optax.adam(args.lr, b1=args.betas[0], b2=args.betas[1])
    d_tx = optax.adam(args.lr, b1=args.betas[0], b2=args.betas[1])
    state = dict(rng=keys(), G=g_vars['params'], D=d_vars['params'],
                 g_opt=g_tx.init(g_vars['params']),
                 d_opt=d_tx.init(d_vars['params']), step=jnp.int32(0))

    train_step = accel.jit_step(build_train_step(
        G, D, g_tx, d_tx, LSGANLoss(), args.pixelwise_gamma))

    test_target, test_source = (jnp.asarray(test_batch[0]),
                                jnp.asarray(test_batch[1]))

    @jax.jit
    def _gen(state):
        return G.apply({'params': state['G']}, test_source, train=False)

    def sample_fn(state):
        import numpy as np
        gen = np.asarray(_gen(state))
        src = np.asarray(test_source)
        if src.shape[-1] == 1:
            src = np.repeat(src, 3, axis=-1)
        return make_image_grid(src, np.asarray(test_target), gen)

    return run_training(
        name=name, args=args, accel=accel, state=state, loader=loader,
        train_step=train_step, sample_fn=sample_fn,
        max_iters=max_iters, save_interval=args.save, nrow=6,
        ema_params_path=lambda s: s['G'],
    )


def main(parser):
    parser = add_args(parser, dict(
        num_test=[4, 'eval samples'],
        drop_out=[0.0, 'dropout rate'],
        lr=[0.0005, 'learning rate'],
        betas=[[0.5, 0.999], 'betas'],
        pixelwise_gamma=[100., 'lambda for L1 loss'],
    ))
    args = parser.parse_args()
    save_args(args)

    dataset = build_dataset(args, 'xdog')
    loader = DataLoader(dataset, args.batch_size, seed=args.seed)
    test_batch = next(iter(DataLoader(dataset, args.num_test, shuffle=False,
                                      num_workers=1)))
    max_iters = default_max_iters(args, loader)
    # xdog pairs are (image, lineart); treat lineart (tiled to RGB in D via
    # concat) as the source domain
    train(args, max_iters, loader, test_batch)
