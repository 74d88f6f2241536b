'''ContraD recipe (reference `implementations/ContraD/utils.py`): D trunk
learns from NT-Xent (two views of reals, :52) + supervised-contrastive
(reals vs fakes, :22) losses; the adversarial head trains on stop-gradiented
features with non-saturating loss + every-step R1 (:121 — "no lazy
regularization"); G trains through the full D. `augmentation` picks the
view transform: 'diff' = DiffAugment with `policy` (:318), 'simclr' =
random-resized-crop/flip/jitter/grayscale views (:323-334, on-device
here).'''

from __future__ import annotations

import jax
import jax.numpy as jnp
import optax

from animeface_tpu.implementations.ContraD.model import (
    Generator, Discriminator,
)
from animeface_tpu.utils import add_args, save_args
from animeface_tpu.nnutils import KeyGen, sample_nnoise, update_ema
from animeface_tpu.nnutils.accelerate import Accelerator
from animeface_tpu.nnutils.loss import NonSaturatingLoss, r1_regularizer
from animeface_tpu.nnutils.diffaugment import (
    diff_augment, rand_brightness, rand_saturation, rand_contrast,
)
from animeface_tpu.ops import grid_sample
from animeface_tpu.nnutils.trainer import run_training, default_max_iters
from animeface_tpu.dataset import build_loader


def simclr_augment(key, x, min_scale=0.2):
    '''Random resized crop + hflip + color jitter + random grayscale
    (reference get_simclr_transform, simclr.py — on-device).'''
    N, H, W, C = x.shape
    ks = jax.random.split(key, 8)
    # random resized crop via affine grid sample
    scale = jax.random.uniform(ks[0], (N,), minval=min_scale, maxval=1.0)
    max_off = 1.0 - scale
    ox = jax.random.uniform(ks[1], (N,), minval=-1, maxval=1) * max_off
    oy = jax.random.uniform(ks[2], (N,), minval=-1, maxval=1) * max_off
    flip = jnp.where(jax.random.uniform(ks[3], (N,)) < 0.5, -1.0, 1.0)
    coords = (2 * jnp.arange(W) + 1) / W - 1
    gx = coords[None, None, :] * (scale * flip)[:, None, None] + ox[:, None, None]
    gy = coords[None, :, None] * scale[:, None, None] + oy[:, None, None]
    grid = jnp.stack([jnp.broadcast_to(gx, (N, H, W)),
                      jnp.broadcast_to(gy, (N, H, W))], axis=-1)
    x = grid_sample(x, grid)
    # color jitter
    x = rand_brightness(ks[4], x)
    x = rand_saturation(ks[5], x)
    x = rand_contrast(ks[6], x)
    # random grayscale
    gray = jnp.mean(x, axis=-1, keepdims=True)
    to_gray = (jax.random.uniform(ks[7], (N, 1, 1, 1)) < 0.2).astype(x.dtype)
    return x * (1 - to_gray) + gray * to_gray


def _normalize(x):
    return x / (jnp.linalg.norm(x, axis=-1, keepdims=True) + 1e-12)


def nt_xent_loss(out1, out2, temperature=0.1):
    '''SimCLR NT-Xent (reference utils.py:52).'''
    out1, out2 = _normalize(out1), _normalize(out2)
    N = out1.shape[0]
    outputs = jnp.concatenate([out1, out2], axis=0)
    sim = outputs @ outputs.T / temperature
    sim = sim - jnp.eye(2 * N) * 5e4
    lsm = jax.nn.log_softmax(sim, axis=1)
    pos = jnp.concatenate([jnp.diagonal(lsm[:N, N:]),
                           jnp.diagonal(lsm[N:, :N])])
    return -jnp.sum(pos) / (2 * N)


def supervised_contrastive_loss(out1, out2, others, temperature=0.1):
    '''SupCon over (real view 1, real view 2) as positives vs fakes
    (reference utils.py:22).'''
    out1, out2, others = _normalize(out1), _normalize(out2), _normalize(others)
    N = out1.shape[0]
    outputs = jnp.concatenate([out1, out2, others], axis=0)
    T = outputs.shape[0]
    sim = outputs @ outputs.T / temperature
    sim = sim - jnp.eye(T) * 5e4
    mask = jnp.zeros((T, T)).at[2 * N:, 2 * N:].set(1.0)
    mask = mask * (1 - jnp.eye(T))
    sim = sim[2 * N:]
    mask = mask[2 * N:]
    mask = mask / jnp.sum(mask, axis=1, keepdims=True)
    lsm = jax.nn.log_softmax(sim, axis=1)
    return -jnp.mean(jnp.sum(lsm * mask, axis=1))


def build_train_step(G, D, g_tx, d_tx, loss, augment, r1_lambda, con_lambda,
                     dis_lambda, temperature, ema_decay=0.999):
    def train_step(state, real):
        rng, zkey, a1, a2, af, nkey, mkey = jax.random.split(state['rng'], 7)
        B = real.shape[0]
        z = sample_nnoise(zkey, (B, G.style_dim))

        fake, _ = G.apply({'params': state['G']}, z,
                          rngs={'noise': nkey, 'mixing': mkey})
        fake_sg = jax.lax.stop_gradient(fake)

        def d_loss_fn(d_params):
            real_1 = augment(a1, real)
            real_2 = augment(a2, real)
            fake_ = augment(af, fake_sg)
            real_prob, con1, supcon1 = D.apply(
                {'params': d_params}, real_1, stop_grad=True)
            _, con2, supcon2 = D.apply(
                {'params': d_params}, real_2, stop_grad=True)
            fake_prob, _, supcon_f = D.apply(
                {'params': d_params}, fake_, stop_grad=True)

            def d_apply(img):
                out, _, _ = D.apply({'params': d_params}, img,
                                    stop_grad=False)
                return out
            r1 = r1_regularizer(real, d_apply) * r1_lambda
            d_loss = loss.d_loss(real_prob, fake_prob) * dis_lambda + r1
            d_loss = d_loss + nt_xent_loss(con1, con2, temperature)
            d_loss = d_loss + supervised_contrastive_loss(
                supcon1, supcon2, supcon_f, temperature) * con_lambda
            return d_loss

        d_loss, d_grads = jax.value_and_grad(d_loss_fn)(state['D'])
        d_up, d_opt = d_tx.update(d_grads, state['d_opt'], state['D'])
        d_params = optax.apply_updates(state['D'], d_up)

        def g_loss_fn(g_params):
            fake2, _ = G.apply({'params': g_params}, z,
                               rngs={'noise': nkey, 'mixing': mkey})
            fake_ = augment(af, fake2)
            fake_prob, _, _ = D.apply({'params': d_params}, fake_,
                                      stop_grad=False)
            return loss.g_loss(fake_prob)

        g_loss, g_grads = jax.value_and_grad(g_loss_fn)(state['G'])
        g_up, g_opt = g_tx.update(g_grads, state['g_opt'], state['G'])
        g_params = optax.apply_updates(state['G'], g_up)

        return dict(rng=rng, G=g_params, D=d_params,
                    G_ema=update_ema(g_params, state['G_ema'], ema_decay),
                    g_opt=g_opt, d_opt=d_opt, step=state['step'] + 1), \
            dict(d=jnp.nan_to_num(d_loss), g=jnp.nan_to_num(g_loss))

    return train_step


def train(args, max_iters, loader):
    accel = Accelerator(mesh_shape=tuple(args.mesh), bf16=not args.no_bf16)
    keys = KeyGen(args.seed)

    G = Generator(image_size=args.image_size,
                  image_channels=args.image_channels,
                  style_dim=args.style_dim,
                  channels=args.channels, max_channels=args.max_channels,
                  block_num_conv=args.block_num_conv,
                  map_num_layers=args.map_num_layers, map_lr=args.map_lr,
                  normalize_latent=not args.disable_map_norm,
                  dtype=accel.compute_dtype)
    D = Discriminator(image_size=args.image_size,
                      image_channels=args.image_channels,
                      channels=args.channels, max_channels=args.max_channels,
                      block_num_conv=args.block_num_conv,
                      mbsd_groups=args.mbsd_groups,
                      mbsd_grouping=getattr(args, 'mbsd_grouping', 'strided'),
                      projection_features=args.projection_features,
                      hidden_features=args.hidden_features,
                      act_name=args.d_act_name,
                      dtype=accel.compute_dtype)

    g_vars = G.init({'params': keys(), 'noise': keys(), 'mixing': keys()},
                    jnp.zeros((1, args.style_dim)))
    d_vars = D.init(keys(), jnp.zeros((2, args.image_size, args.image_size,
                                       args.image_channels)))

    g_tx = optax.adam(args.lr, b1=args.betas[0], b2=args.betas[1])
    d_tx = optax.adam(args.lr, b1=args.betas[0], b2=args.betas[1])
    state = dict(rng=keys(), G=g_vars['params'], D=d_vars['params'],
                 G_ema=jax.tree_util.tree_map(jnp.copy, g_vars['params']),
                 g_opt=g_tx.init(g_vars['params']),
                 d_opt=d_tx.init(d_vars['params']), step=jnp.int32(0))

    if args.augmentation == 'simclr':
        augment = simclr_augment
    else:
        augment = lambda key, x: diff_augment(key, x, args.policy)

    train_step = accel.jit_step(build_train_step(
        G, D, g_tx, d_tx, NonSaturatingLoss(), augment, args.r1_lambda,
        args.con_lambda, args.dis_lambda, args.temperature))

    const_z = sample_nnoise(keys(), (16, args.style_dim))
    nk = keys()

    @jax.jit
    def sample_fn(state):
        images, _ = G.apply({'params': state['G_ema']}, const_z,
                            rngs={'noise': nk})
        return images

    return run_training(
        name='ContraD', args=args, accel=accel, state=state, loader=loader,
        train_step=train_step, sample_fn=sample_fn,
        max_iters=max_iters, save_interval=args.save,
        ema_params_path=lambda s: s['G_ema'],
    )


def main(parser):
    parser = add_args(parser, dict(
        image_channels=[3, 'number of channels for the generated image'],
        style_dim=[512, 'style feature dimension'],
        channels=[32, 'channel width multiplier'],
        max_channels=[512, 'maximum channels'],
        block_num_conv=[2, 'number of convolution layers in residual block'],
        map_num_layers=[4, 'number of layers in mapping network'],
        map_lr=[0.01, 'learning rate for mapping network'],
        disable_map_norm=[False, 'disable pixel norm'],
        mbsd_groups=[4, 'mini batch stddev group size'],
        lr=[0.001, 'learning rate'],
        betas=[[0., 0.99], 'betas'],
        r1_lambda=[0.5, 'lambda for r1'],
        policy=['color,translation', 'policy for DiffAugment'],
        augmentation=['diff', 'augmentation to perform'],
        projection_features=[256, 'output feature dimensions for projection'],
        hidden_features=[256, 'dimensions for hidden layers'],
        d_act_name=['lrelu', 'activation function for D'],
        con_lambda=[1., 'lambda for contrastive loss'],
        dis_lambda=[1., 'lambda for adversarial loss'],
        temperature=[0.1, 'temperature used to calculate NTXent loss'],
    ))
    args = parser.parse_args()
    save_args(args)

    loader = build_loader(args, 'image')
    max_iters = default_max_iters(args, loader)
    train(args, max_iters, loader)
