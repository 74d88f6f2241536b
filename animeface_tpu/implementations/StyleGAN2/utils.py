'''StyleGAN2 training recipe (reference `implementations/StyleGAN2/utils.py`).

Reference semantics kept exactly:
  * lazy regularization REPLACES the adversarial loss on penalty iters
    (utils.py:71-79, 96-104): D does R1-only every d_k steps, G does
    path-length-only every g_k steps;
  * optimizer lr/beta rescaling by k/(k+1) when the penalty is on (:208-218);
  * R1 on the raw (un-augmented) reals; DiffAugment on both real and fake
    before D; EMA of G at decay .999; NaN losses logged as 0.

TPU-native execution: one fully-jitted step per (do_r1, do_pl) combination
(host selects by step index — python branching outside jit replaces torch's
per-iter graph rebuild), DiffAugment fused on-device into the D input path,
pl_mean lives in the device train state, bf16 compute / f32 params + EMA.
'''

from __future__ import annotations

import functools
import os

import numpy as np
import jax
import jax.numpy as jnp
import optax

from animeface_tpu.implementations.StyleGAN2.model import Generator, Discriminator
from animeface_tpu.utils import add_args, save_args
from animeface_tpu.nnutils import KeyGen, sample_nnoise, update_ema
from animeface_tpu.nnutils.accelerate import Accelerator
from animeface_tpu.nnutils.loss import NonSaturatingLoss, r1_regularizer
from animeface_tpu.nnutils.diffaugment import diff_augment
from animeface_tpu.nnutils.trainer import (
    run_training, default_max_iters, host_step_counter)
from animeface_tpu.dataset import build_loader


#: rematerialize the double-backward penalty branches (R1 / path-length):
#: trades ~few % FLOPs on 1-in-8/16 steps for the activation memory that
#: bounds the batch size (batch 160 OOMs HBM by ~0.4G in the R1 variant —
#: CLAUDE.md step-shape note). Off by default; the bench A/Bs it.
_REMAT_PENALTIES = os.environ.get('ANIMEFACE_REMAT_PENALTIES', '') == '1'


def pl_lengths(G, g_params, w, noise_rngs):
    '''Path-length |J^T y| per sample: grad of sum(images * noise) wrt w
    (reference pl_penalty, utils.py:17-29).'''
    # NOTE on remat: wrapping this in jax.checkpoint was measured to cost
    # 2.7% amortized step throughput while freeing no usable batch headroom
    # (batches must be multiples of 128 — XLA lane-pads the batch dim in
    # the double-backward layouts, so the next step up from 128 is 256,
    # far past HBM). Left un-rematted deliberately.
    def proj(w):
        images = G.apply({'params': g_params}, w, rngs=noise_rngs,
                         method=Generator.synthesize_from_w)
        num_pixels = images.shape[1] * images.shape[2]
        key = jax.random.fold_in(noise_rngs['noise'], 1)
        noise = jax.random.normal(key, images.shape) / np.sqrt(num_pixels)
        return jnp.sum(images * noise)
    grads = jax.grad(proj)(w.astype(jnp.float32))
    return jnp.sqrt(jnp.sum(grads * grads, axis=1) + 1e-12)


def build_train_step(G, D, g_tx, d_tx, loss, policy, r1_lambda, pl_lambda,
                     d_k, g_k, ema_decay, do_r1: bool, do_pl: bool,
                     augment_fn=None, ada_enabled: bool = False):
    '''One full iteration (D phase + G phase + EMA) as a pure function.

    `augment_fn(key, x, state) -> x_aug` lets StyleGAN2-ADA workloads plug
    the AugmentPipe in (default: DiffAugment with `policy`). `ada_enabled`
    threads the adaptive-p controller state (`state['ada']`) through the
    step; p updates from the global-batch D(real) sign statistic on
    adversarial iters (reference `implementations/ADA/utils.py:69`,
    `nnutils/ada.py:26`). R1-only iters carry the controller unchanged —
    under the reference's lazy-reg-replaces-loss semantics those iters
    produce no adversarial D(real) logits.
    '''

    if augment_fn is None:
        def augment_fn(key, x, state):
            return diff_augment(key, x, policy)

    def train_step(state, real):
        rng, zkey_d, zkey_g, akey_r, akey_f, akey_g, nkey_d, nkey_g, mkey = \
            jax.random.split(state['rng'], 9)
        B = real.shape[0]

        # ---------------- D phase ----------------
        z = sample_nnoise(zkey_d, (B, G.style_dim))
        fake, _ = G.apply({'params': state['G']}, z,
                          rngs={'noise': nkey_d, 'mixing': mkey})
        fake = jax.lax.stop_gradient(fake)

        if do_r1:
            def d_loss_fn(d_params):
                d_apply = lambda img: D.apply({'params': d_params}, img)
                if _REMAT_PENALTIES:
                    r1 = jax.checkpoint(
                        lambda img: r1_regularizer(img, d_apply))(real)
                else:
                    r1 = r1_regularizer(real, d_apply)
                return r1 * r1_lambda * d_k, jnp.zeros((B, 1))
        else:
            def d_loss_fn(d_params):
                # One stacked [2,B,...] vmapped D pass instead of two calls:
                # XLA merges the vmap axis into the conv batch (one 2B-batch
                # conv per layer, ~25% faster on TPU), while MinibatchStdDev
                # still sees real and fake separately (exact two-call
                # semantics; its strided groups must not mix the two).
                both = jax.vmap(lambda k, img: D.apply(
                    {'params': d_params}, augment_fn(k, img, state)))(
                    jnp.stack([akey_r, akey_f]), jnp.stack([real, fake]))
                return loss.d_loss(both[0], both[1]), both[0]

        (d_loss, real_prob), d_grads = jax.value_and_grad(
            d_loss_fn, has_aux=True)(state['D'])
        d_up, d_opt = d_tx.update(d_grads, state['d_opt'], state['D'])
        d_params = optax.apply_updates(state['D'], d_up)

        # ---------------- G phase ----------------
        z = sample_nnoise(zkey_g, (B, G.style_dim))

        if do_pl:
            def g_loss_fn(g_params):
                w = G.apply({'params': g_params}, z, method=Generator.map_w)
                if _REMAT_PENALTIES:
                    lengths = jax.checkpoint(
                        lambda gp, w_: pl_lengths(G, gp, w_,
                                                  {'noise': nkey_g})
                    )(g_params, w)
                else:
                    lengths = pl_lengths(G, g_params, w, {'noise': nkey_g})
                pl = jnp.mean((lengths - state['pl_mean']) ** 2)
                return pl * pl_lambda * g_k, jnp.mean(lengths)
            (g_loss, mean_len), g_grads = jax.value_and_grad(
                g_loss_fn, has_aux=True)(state['G'])
            pl_mean = state['pl_mean'] * 0.99 + mean_len * 0.01
        else:
            def g_loss_fn(g_params):
                fake, _ = G.apply({'params': g_params}, z,
                                  rngs={'noise': nkey_g, 'mixing': mkey})
                fake_aug = augment_fn(akey_g, fake, state)
                fake_prob = D.apply({'params': d_params}, fake_aug)
                return loss.g_loss(fake_prob)
            g_loss, g_grads = jax.value_and_grad(g_loss_fn)(state['G'])
            pl_mean = state['pl_mean']

        g_up, g_opt = g_tx.update(g_grads, state['g_opt'], state['G'])
        g_params = optax.apply_updates(state['G'], g_up)

        g_ema = update_ema(g_params, state['G_ema'], ema_decay)

        new_state = dict(
            state, rng=rng, G=g_params, D=d_params, G_ema=g_ema,
            g_opt=g_opt, d_opt=d_opt, pl_mean=pl_mean,
            step=state['step'] + 1,
        )
        metrics = dict(G=jnp.nan_to_num(g_loss), D=jnp.nan_to_num(d_loss))
        # R1 iters (replace-loss lazy reg) produce no adversarial D(real)
        # logits, but they still advance the controller cadence via ada_tick —
        # exactly one tick per training iteration, matching the reference ADA
        # recipe whose gp is ADDED (so it updates p every step;
        # reference nnutils/ada.py:26-36).
        if ada_enabled and not do_r1:
            from animeface_tpu.nnutils.ada import ada_update_p
            new_state['ada'] = ada_update_p(state['ada'], real_prob)
            metrics['p'] = new_state['ada']['p']
        elif ada_enabled:
            from animeface_tpu.nnutils.ada import ada_tick
            new_state['ada'] = ada_tick(state['ada'])
            metrics['p'] = new_state['ada']['p']
        return new_state, metrics

    return train_step


def build_models(args, compute_dtype):
    G = Generator(
        image_size=args.image_size, image_channels=args.image_channels,
        style_dim=args.style_dim, channels=args.channels,
        max_channels=args.max_channels, block_num_conv=args.block_num_conv,
        map_num_layers=args.map_num_layers,
        normalize_latent=not args.disable_map_norm, map_lr=args.map_lr,
        dtype=compute_dtype)
    D = Discriminator(
        image_size=args.image_size, image_channels=args.image_channels,
        channels=args.channels, max_channels=args.max_channels,
        block_num_conv=args.block_num_conv, mbsd_groups=args.mbsd_groups,
        mbsd_grouping=getattr(args, 'mbsd_grouping', 'strided'),
        dtype=compute_dtype)
    return G, D


def make_optimizers(args):
    '''Lazy-regularization lr/beta rescale (reference utils.py:208-218).'''
    betas = (args.beta1, args.beta2)
    if args.pl_lambda > 0:
        r = args.g_k / (args.g_k + 1)
        g_lr, g_betas = args.lr * r, (betas[0] ** r, betas[1] ** r)
    else:
        g_lr, g_betas = args.lr, betas
    if args.r1_lambda > 0:
        r = args.d_k / (args.d_k + 1)
        d_lr, d_betas = args.lr * r, (betas[0] ** r, betas[1] ** r)
    else:
        d_lr, d_betas = args.lr, betas
    g_tx = optax.adam(g_lr, b1=g_betas[0], b2=g_betas[1], eps=1e-8)
    d_tx = optax.adam(d_lr, b1=d_betas[0], b2=d_betas[1], eps=1e-8)
    return g_tx, d_tx


def train(args, max_iters, loader, name='StyleGAN2', ema_decay=0.999):
    accel = Accelerator(mesh_shape=tuple(args.mesh), bf16=not args.no_bf16)
    keys = KeyGen(args.seed)

    G, D = build_models(args, accel.compute_dtype)
    z0 = jnp.zeros((1, args.style_dim))
    g_vars = G.init({'params': keys(), 'noise': keys(), 'mixing': keys()}, z0)
    d_vars = D.init(keys(), jnp.zeros((1, args.image_size, args.image_size,
                                       args.image_channels)))
    g_params, d_params = g_vars['params'], d_vars['params']

    g_tx, d_tx = make_optimizers(args)
    state = dict(
        rng=keys(), G=g_params, D=d_params,
        # EMA bootstrap; jnp.copy so G/G_ema don't alias one donated buffer
        G_ema=jax.tree_util.tree_map(jnp.copy, g_params),
        g_opt=g_tx.init(g_params), d_opt=d_tx.init(d_params),
        pl_mean=jnp.float32(0.0), step=jnp.int32(0),
    )

    loss = NonSaturatingLoss()
    step_builder = functools.lru_cache(maxsize=4)(
        lambda do_r1, do_pl: accel.jit_step(build_train_step(
            G, D, g_tx, d_tx, loss, args.policy, args.r1_lambda,
            args.pl_lambda, args.d_k, args.g_k, ema_decay, do_r1, do_pl)))

    next_index = host_step_counter()

    def train_step(state, batch):
        i = next_index(state)
        do_r1 = bool(args.r1_lambda > 0 and i % args.d_k == 0 and i != 0)
        do_pl = bool(args.pl_lambda > 0 and i % args.g_k == 0 and i != 0)
        return step_builder(do_r1, do_pl)(state, batch)

    const_z = sample_nnoise(keys(), (16, args.style_dim))
    sample_noise_key = keys()

    @jax.jit
    def sample_fn(state):
        images, _ = G.apply({'params': state['G_ema']}, const_z,
                            rngs={'noise': sample_noise_key})
        return images

    return run_training(
        name=name, args=args, accel=accel, state=state, loader=loader,
        train_step=train_step, sample_fn=sample_fn,
        max_iters=max_iters, save_interval=args.save,
        ema_params_path=lambda s: s['G_ema'],
    )


STYLEGAN2_ARGS = dict(
    image_channels=[3, 'number of channels for the generated image'],
    style_dim=[512, 'style feature dimension'],
    channels=[32, 'channel width multiplier'],
    max_channels=[512, 'maximum channels'],
    block_num_conv=[2, 'conv layers per residual block'],
    map_num_layers=[8, 'layers in the mapping network'],
    map_lr=[0.01, 'learning-rate multiplier for the mapping network'],
    disable_map_norm=[False, 'disable pixel norm in mapping network'],
    mbsd_groups=[4, 'groups for minibatch stddev'],
    mbsd_grouping=['strided', 'minibatch-stddev grouping: strided (reference '
                   'torch semantics, cross-device gather under dp) or '
                   'contiguous (shard-local, no collective)'],
    lr=[0.001, 'learning rate'],
    beta1=[0., 'beta1'],
    beta2=[0.99, 'beta2'],
    g_k=[8, 'lazy regularization: path length every g_k iters'],
    d_k=[16, 'lazy regularization: R1 every d_k iters'],
    r1_lambda=[10., 'lambda for r1'],
    pl_lambda=[0., 'lambda for path length'],
    policy=['color,translation', 'policy for DiffAugment'],
)


def main(parser):
    parser = add_args(parser, STYLEGAN2_ARGS)
    args = parser.parse_args()
    save_args(args)

    loader = build_loader(args, 'image')
    max_iters = default_max_iters(args, loader)
    train(args, max_iters, loader)
