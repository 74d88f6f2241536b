'''SinGAN recipe (reference `implementations/SinGAN/utils.py`): train one
scale at a time on a single image pyramid — non-saturating loss + gradient
penalty centered at `gp_type` (:87-97), reconstruction loss with fixed noise
(:105-117), D_step/G_step inner optimization loops (:85,103), noise_amp for
the next scale = 0.1 * recon RMSE at the current scale
(model.py:146-149), per-scale warm start (model.py:153-157).

The reference's `test_size` eval is declared but disabled there too
(`test = None`, utils.py:184); the arg is kept for schema parity.
'''

from __future__ import annotations

import os

import numpy as np
import jax
import jax.numpy as jnp
import optax

from animeface_tpu.implementations.SinGAN.model import (
    SingleScaleGenerator, SingleScaleDiscriminator, pyramid_forward,
    resize_img, gnoise, scale_channels,
)
from animeface_tpu.utils import add_args, save_args, Status, save_image
from animeface_tpu.utils.argument import result_dir
from animeface_tpu.nnutils import KeyGen
from animeface_tpu.nnutils.accelerate import Accelerator
from animeface_tpu.nnutils.loss import NonSaturatingLoss
from animeface_tpu.nnutils.loss.penalty import gradient_penalty
from animeface_tpu.checkpoint import save_model


def pyramid_sizes(max_size, min_size, scale_factor):
    '''Edge lengths of the training pyramid (reference load_real,
    utils.py:18-24). Reproduces the reference loop exactly: the first entry
    is max_size itself and the LAST appended value may fall below min_size
    (the loop condition tests the previous value).'''
    sizes = []
    tmp_size = max_size
    while tmp_size > min_size:
        tmp_size = round(max_size * scale_factor ** len(sizes))
        sizes.append(tmp_size)
    return sorted(sizes)


def load_real(args, out_dir):
    '''-> (image [1,H,W,3] in [-1,1], (h,w) per scale). Mirrors reference
    load_real (utils.py:13-49): shorter edge -> size, aspect preserved.'''
    if args.synthetic_data:
        from animeface_tpu.dataset.synthetic import _face_image
        image = _face_image(np.random.default_rng(args.seed), args.max_size)
    else:
        from PIL import Image
        pil = Image.open(args.image_path).convert('RGB')
        image = np.asarray(pil, dtype=np.float32) / 127.5 - 1.0
    image = jnp.asarray(image)[None]  # [1,H,W,3]
    H, W = image.shape[1:3]
    sizes, xy_sizes, reals = pyramid_sizes(
        args.max_size, args.min_size, args.scale_factor), [], []
    for size in sizes:
        scale = size / min(H, W)
        hw = (round(H * scale), round(W * scale))
        xy_sizes.append(hw)
        reals.append(resize_img(image, hw))
        if args.save_real:
            save_image(np.asarray(reals[-1]),
                       os.path.join(out_dir, 'sample_{}x{}.png'.format(*hw)),
                       nrow=1)
    return reals, xy_sizes


def train(args):
    accel = Accelerator(mesh_shape=(1,), bf16=not args.no_bf16)
    keys = KeyGen(args.seed)
    out_dir = result_dir('SinGAN')
    loss = NonSaturatingLoss()
    img_out = not args.disable_img_out
    bias = not args.disable_bias

    reals, sizes = load_real(args, out_dir)
    num_scale = len(sizes)
    g_chs, d_chs = scale_channels(args.channels, num_scale)

    gens, disc = [], []
    g_vars_list, d_vars_list = [], []
    for s in range(num_scale):
        G = SingleScaleGenerator(
            channels=g_chs[s], kernel_size=args.kernel_size,
            norm_layer=args.norm_layer, num_layers=args.num_layers,
            img_channels=args.img_channels, img_out=img_out, use_bias=bias,
            dtype=accel.compute_dtype)
        D = SingleScaleDiscriminator(
            channels=d_chs[s], kernel_size=args.kernel_size,
            norm_layer=args.norm_layer, num_layers=args.num_layers,
            use_bias=bias, dtype=accel.compute_dtype)
        gv = G.init(keys(), jnp.zeros((1, *sizes[s], 3)),
                    jnp.zeros((1, *sizes[s], 3)), train=True)
        dv = D.init(keys(), jnp.zeros((1, *sizes[s], 3)), train=True)
        gens.append(G)
        disc.append(D)
        g_vars_list.append(dict(gv))
        d_vars_list.append(dict(dv))

    def g_aux(v):
        return {k: c for k, c in v.items() if k != 'params'}

    rec_noise = gnoise(keys(), sizes[0])
    noise_amps = [1.0]

    epochses = [args.epochs + s * args.increase for s in range(num_scale)]
    status = Status(sum(epochses), bar=not args.log_file,
                    log_file=args.log_file)

    for s in range(num_scale):
        g_tx = optax.adam(args.lr, b1=args.betas[0], b2=args.betas[1])
        d_tx = optax.adam(args.lr, b1=args.betas[0], b2=args.betas[1])
        g_opt = g_tx.init(g_vars_list[s]['params'])
        d_opt = d_tx.init(d_vars_list[s]['params'])
        amps = tuple(noise_amps)
        frozen_g = [g_vars_list[i] for i in range(num_scale)]
        real = reals[s]

        def step_fn(g_vars_s, d_vars, g_opt, d_opt, key):
            nkeys = (args.D_step + 2 * args.G_step + 1) * (s + 1) + 4
            subkeys = list(jax.random.split(key, nkeys))
            kit = iter(subkeys)

            def fwd(p_s, aux_s, rec=False):
                params = [frozen_g[i]['params'] for i in range(num_scale)]
                auxes = [g_aux(frozen_g[i]) for i in range(num_scale)]
                params[s] = p_s
                auxes[s] = aux_s
                ks = [next(kit) for _ in range(s + 1)]
                return pyramid_forward(
                    gens, params, auxes, sizes, amps, ks, s,
                    rec_noise=rec_noise if rec else None)

            g_params, g_aux_s = g_vars_s['params'], g_aux(g_vars_s)
            d_params, d_aux = d_vars['params'], g_aux(d_vars)

            # --- D_step discriminator updates (reference :85-101) ---
            d_loss = jnp.float32(0.0)
            for _ in range(args.D_step):
                fake, _ = fwd(g_params, g_aux_s)
                fake = jax.lax.stop_gradient(fake)
                gp_key = next(kit)

                def d_loss_fn(dp, fake=fake, gp_key=gp_key, d_aux=d_aux):
                    rp, mut = disc[s].apply({'params': dp, **d_aux}, real,
                                            train=True,
                                            mutable=['batch_stats'])
                    fp, mut = disc[s].apply({'params': dp, **mut}, fake,
                                            train=True,
                                            mutable=['batch_stats'])
                    adv = loss.d_loss(rp, fp)

                    def d_apply(img):
                        out, _ = disc[s].apply({'params': dp, **mut}, img,
                                               train=True,
                                               mutable=['batch_stats'])
                        return out

                    gp = gradient_penalty(gp_key, real, fake, d_apply,
                                          center=args.gp_type)
                    return adv + gp * args.gp_lambda, mut

                (d_loss, d_aux), d_grads = jax.value_and_grad(
                    d_loss_fn, has_aux=True)(d_params)
                d_up, d_opt = d_tx.update(d_grads, d_opt, d_params)
                d_params = optax.apply_updates(d_params, d_up)

            # --- G_step generator updates (reference :103-119) ---
            g_loss = rec_loss = jnp.float32(0.0)
            fake = real
            for _ in range(args.G_step):
                def g_loss_fn(p_s, g_aux_s=g_aux_s):
                    fake, mut = fwd(p_s, g_aux_s)
                    rec, _ = fwd(p_s, g_aux_s, rec=True)
                    fp, _ = disc[s].apply({'params': d_params, **d_aux},
                                          fake, train=True,
                                          mutable=['batch_stats'])
                    rec_loss = jnp.mean(
                        (rec - real.astype(jnp.float32)) ** 2)
                    return (loss.g_loss(fp) + rec_loss * args.rec_alpha,
                            (mut[s], rec_loss, fake))

                (g_loss, (g_aux_s, rec_loss, fake)), g_grads = \
                    jax.value_and_grad(g_loss_fn, has_aux=True)(g_params)
                g_up, g_opt = g_tx.update(g_grads, g_opt, g_params)
                g_params = optax.apply_updates(g_params, g_up)

            return ({'params': g_params, **g_aux_s},
                    {'params': d_params, **d_aux},
                    g_opt, d_opt, d_loss, g_loss, fake)

        jstep = jax.jit(step_fn)
        g_vars_s, d_vars = g_vars_list[s], d_vars_list[s]
        for epoch in range(1, epochses[s] + 1):
            (g_vars_s, d_vars, g_opt, d_opt,
             d_loss, g_loss, fake) = jstep(g_vars_s, d_vars, g_opt, d_opt,
                                           keys())
            if status.batches_done % args.save == 0:
                save_image(np.asarray(fake),
                           os.path.join(out_dir, f'{s}_{epoch}.jpg'), nrow=1)
            status.update(d=d_loss, g=g_loss)
        g_vars_list[s] = dict(g_vars_s)
        d_vars_list[s] = dict(d_vars)

        # per-scale sample + progress (reference :121-127, model.py:146-157)
        ks = list(jax.random.split(keys(), num_scale + 1))
        fake, _ = pyramid_forward(
            gens, [v['params'] for v in g_vars_list],
            [g_aux(v) for v in g_vars_list], sizes, tuple(noise_amps),
            ks, s, train=False)
        save_image(np.asarray(fake), os.path.join(out_dir, f'scale_{s}.jpg'),
                   nrow=1)
        if s + 1 < num_scale:
            rec, _ = pyramid_forward(
                gens, [v['params'] for v in g_vars_list],
                [g_aux(v) for v in g_vars_list], sizes, tuple(noise_amps),
                ks, s, rec_noise=rec_noise, train=False)
            rmse = float(jnp.sqrt(jnp.mean(
                (rec - reals[s].astype(jnp.float32)) ** 2)))
            noise_amps.append(0.1 * rmse)
            # warm start unless the channel width just doubled
            if (s + 1) % 4 != 0:
                g_vars_list[s + 1] = jax.tree_util.tree_map(
                    jnp.copy, g_vars_list[s])

    status.plot_loss(os.path.join(out_dir, 'loss'))
    save_model(os.path.join(out_dir, 'G_final.msgpack'),
               {'vars': g_vars_list, 'noise_amps': jnp.asarray(noise_amps)})
    return g_vars_list, status


def main(parser):
    parser = add_args(parser, dict(
        image_path=['./data/animefacedataset/images/63568_2019.jpg',
                    'path to image'],
        max_size=[220, 'max size when training'],
        min_size=[25, 'min size when training'],
        scale_factor=[0.7, 'scale factor for resizing the training image'],
        save_real=[False, 'save real samples'],
        img_channels=[3, 'image channels'],
        channels=[32, 'channel width multiplier'],
        kernel_size=[3, 'kernel size of convolution layers'],
        norm_layer=['bn', 'normalization layer name'],
        num_layers=[5, 'number of layers for each scale'],
        disable_img_out=[False, 'disable Tanh on output'],
        disable_bias=[False, 'disable bias'],
        epochs=[3000, 'epochs to train each scale'],
        increase=[0, 'epochs to increase in each scale'],
        G_step=[3, 'number of G optimization steps'],
        D_step=[3, 'number of D optimization steps'],
        lr=[0.0005, 'learning rate'],
        betas=[[0.5, 0.999], 'betas'],
        gp_type=[0., 'center for gradient penalty'],
        gp_lambda=[0.1, 'lambda for gradient penalty'],
        rec_alpha=[10., 'alpha for reconstruction loss'],
        test_size=[500, 'size of test image'],
    ))
    args = parser.parse_args()
    save_args(args)

    if args.max_iters > 0:
        args.epochs = max(1, args.max_iters)
        args.increase = 0
    train(args)
