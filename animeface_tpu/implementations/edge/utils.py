'''edge study (reference `implementations/edge/utils.py`): StyleGAN2 trained
with blurred-edge images as additional FAKE examples for D until step
`edge_loss_from` — teaching D to reject soft edges. Datasets pair each image
with its pre-blurred twin (inline ImageBlur classes, utils.py:21-70); the
synthetic fallback box-blurs the procedural faces.'''

from __future__ import annotations

import glob
import random

import numpy as np
import jax
import jax.numpy as jnp
import optax
from PIL import Image as pilImage, ImageFilter

from animeface_tpu.implementations.StyleGAN2.model import Generator, Discriminator
from animeface_tpu.implementations.StyleGAN2.utils import (
    build_models, make_optimizers,
)
from animeface_tpu.utils import add_args, save_args
from animeface_tpu.nnutils import KeyGen, sample_nnoise, update_ema
from animeface_tpu.nnutils.accelerate import Accelerator
from animeface_tpu.nnutils.loss import NonSaturatingLoss, r1_regularizer
from animeface_tpu.nnutils.diffaugment import diff_augment
from animeface_tpu.nnutils.trainer import (
    run_training, default_max_iters, host_step_counter)
from animeface_tpu.dataset import DataLoader, Image, make_default_transform
from animeface_tpu.dataset._base import data_path
from animeface_tpu.dataset.synthetic import SyntheticImage


class AnimeFaceBlur(Image):
    '''(image, blurred) pairs from the `blur/` sibling directory (ref :44).'''

    def __init__(self, image_size):
        self.image_size = image_size
        super().__init__(make_default_transform(image_size))
        self.blurs = [p.replace('images', 'blur') for p in self.images]
        random.shuffle(self.blurs)

    def _load(self):
        return sorted(glob.glob(data_path('animefacedataset', 'images', '*')))

    def __getitem__(self, index):
        image = pilImage.open(self.images[index]).convert('RGB')
        blur = pilImage.open(self.blurs[index]).convert('RGB')
        return self.transform(image), self.transform(blur)


class SyntheticImageBlur(SyntheticImage):
    def __getitem__(self, index):
        img = super().__getitem__(index)
        pil = pilImage.fromarray(
            ((img * 0.5 + 0.5) * 255).astype(np.uint8))
        blur = pil.filter(ImageFilter.GaussianBlur(2))
        blur = np.asarray(blur, np.float32) / 255.0 * 2 - 1
        return img, blur


def build_train_step(G, D, g_tx, d_tx, loss, policy, r1_lambda, d_k,
                     do_r1, use_edge_loss, ema_decay=0.999):
    def train_step(state, batch):
        real, blur = batch
        rng, zkey, ar, ab, af, nkey, mkey = jax.random.split(state['rng'], 7)
        B = real.shape[0]
        z = sample_nnoise(zkey, (B, G.style_dim))

        fake, _ = G.apply({'params': state['G']}, z,
                          rngs={'noise': nkey, 'mixing': mkey})
        fake_sg = jax.lax.stop_gradient(fake)

        def d_loss_fn(d_params):
            if do_r1:
                d_apply = lambda img: D.apply({'params': d_params}, img)
                return r1_regularizer(real, d_apply) * r1_lambda * d_k
            real_prob = D.apply({'params': d_params},
                                diff_augment(ar, real, policy))
            fake_prob = D.apply({'params': d_params},
                                diff_augment(af, fake_sg, policy))
            d_loss = loss.d_loss(real_prob, fake_prob)
            if use_edge_loss:
                blur_prob = D.apply({'params': d_params},
                                    diff_augment(ab, blur, policy))
                d_loss = d_loss + loss.fake_loss(blur_prob)
            return d_loss

        d_loss, d_grads = jax.value_and_grad(d_loss_fn)(state['D'])
        d_up, d_opt = d_tx.update(d_grads, state['d_opt'], state['D'])
        d_params = optax.apply_updates(state['D'], d_up)

        def g_loss_fn(g_params):
            fake2, _ = G.apply({'params': g_params}, z,
                               rngs={'noise': nkey, 'mixing': mkey})
            fake_prob = D.apply({'params': d_params},
                                diff_augment(af, fake2, policy))
            return loss.g_loss(fake_prob)

        g_loss, g_grads = jax.value_and_grad(g_loss_fn)(state['G'])
        g_up, g_opt = g_tx.update(g_grads, state['g_opt'], state['G'])
        g_params = optax.apply_updates(state['G'], g_up)

        return dict(rng=rng, G=g_params, D=d_params,
                    G_ema=update_ema(g_params, state['G_ema'], ema_decay),
                    g_opt=g_opt, d_opt=d_opt, pl_mean=state['pl_mean'],
                    step=state['step'] + 1), \
            dict(G=jnp.nan_to_num(g_loss), D=jnp.nan_to_num(d_loss))

    return train_step


def train(args, max_iters, loader):
    accel = Accelerator(mesh_shape=tuple(args.mesh), bf16=not args.no_bf16)
    keys = KeyGen(args.seed)

    G, D = build_models(args, accel.compute_dtype)
    z0 = jnp.zeros((1, args.style_dim))
    g_vars = G.init({'params': keys(), 'noise': keys(), 'mixing': keys()}, z0)
    d_vars = D.init(keys(), jnp.zeros((1, args.image_size, args.image_size,
                                       args.image_channels)))
    g_params, d_params = g_vars['params'], d_vars['params']

    g_tx, d_tx = make_optimizers(args)
    state = dict(rng=keys(), G=g_params, D=d_params,
                 G_ema=jax.tree_util.tree_map(jnp.copy, g_params),
                 g_opt=g_tx.init(g_params), d_opt=d_tx.init(d_params),
                 pl_mean=jnp.float32(0.0), step=jnp.int32(0))

    loss = NonSaturatingLoss()
    import functools
    step_builder = functools.lru_cache(maxsize=4)(
        lambda do_r1, use_edge: accel.jit_step(build_train_step(
            G, D, g_tx, d_tx, loss, args.policy, args.r1_lambda, args.d_k,
            do_r1, use_edge)))
    next_index = host_step_counter()

    def train_step(state, batch):
        i = next_index(state)
        do_r1 = bool(args.r1_lambda > 0 and i % args.d_k == 0 and i != 0)
        use_edge = bool(args.edge_loss_from > i)
        return step_builder(do_r1, use_edge)(state, batch)

    const_z = sample_nnoise(keys(), (16, args.style_dim))
    nk = keys()

    @jax.jit
    def sample_fn(state):
        images, _ = G.apply({'params': state['G_ema']}, const_z,
                            rngs={'noise': nk})
        return images

    return run_training(
        name='edge', args=args, accel=accel, state=state, loader=loader,
        train_step=train_step, sample_fn=sample_fn,
        max_iters=max_iters, save_interval=args.save,
        ema_params_path=lambda s: s['G_ema'],
    )


def main(parser):
    parser = add_args(parser, dict(
        image_channels=[3, 'number of channels for generated images'],
        style_dim=[512, 'style code dimension'],
        channels=[32, 'channel width multiplier'],
        max_channels=[512, 'maximum channels width'],
        block_num_conv=[2, 'number of conv in residual'],
        map_num_layers=[8, 'number of layers mapping network'],
        map_lr=[0.01, 'learning rate for mapping network'],
        disable_map_norm=[False, 'disable pixel norm'],
        mbsd_groups=[4, 'mini batch stddev groups'],
        lr=[0.001, 'learning rate'],
        betas=[[0., 0.99], 'betas'],
        d_k=[16, 'calc gp every'],
        r1_lambda=[10., 'lambda for gp'],
        policy=['color,translation', 'policy for DiffAugment'],
        wait_edge_epoch=[0, 'epochs to wait before adding edge adv loss'],
    ))
    args = parser.parse_args()
    save_args(args)
    # make_optimizers consumes beta1/beta2; recipe has no path-length term
    args.beta1, args.beta2 = args.betas
    args.pl_lambda, args.g_k = 0.0, 8

    import os
    if args.synthetic_data or not os.path.isdir(args.data_root):
        dataset = SyntheticImageBlur(args.image_size,
                                     min(args.num_images or 2048, 10000),
                                     args.seed)
    else:
        dataset = AnimeFaceBlur(args.image_size)
    loader = DataLoader(dataset, args.batch_size, seed=args.seed)
    max_iters = default_max_iters(args, loader)
    # the blur adversarial term runs only WHILE batches_done < this bound
    # (reference quirk, utils.py:123 `edge_loss_from > status.batches_done`;
    # the default wait_edge_epoch=0 therefore never enables it)
    args.edge_loss_from = len(loader) * args.wait_edge_epoch
    train(args, max_iters, loader)
