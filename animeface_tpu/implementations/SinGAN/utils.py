'''SinGAN recipe (reference `implementations/SinGAN/utils.py`): train one
scale at a time on a single image pyramid — zero-centered gradient penalty,
reconstruction loss with fixed noise, noise_amp from recon RMSE (:59-137).'''

from __future__ import annotations

import os

import numpy as np
import jax
import jax.numpy as jnp
import optax

from animeface_tpu.implementations.SinGAN.model import (
    SingleScaleGenerator, SingleScaleDiscriminator, pyramid_forward,
    resize_img,
)
from animeface_tpu.utils import add_args, save_args, Status, save_image
from animeface_tpu.utils.argument import result_dir
from animeface_tpu.nnutils import KeyGen
from animeface_tpu.nnutils.accelerate import Accelerator
from animeface_tpu.nnutils.loss import WGANLoss
from animeface_tpu.nnutils.loss.penalty import gradient_penalty
from animeface_tpu.dataset import build_dataset
from animeface_tpu.checkpoint import save_model


def make_sizes(max_size, min_size, scale_factor):
    sizes = [max_size]
    while round(sizes[-1] * scale_factor) >= min_size:
        sizes.append(round(sizes[-1] * scale_factor))
    return list(reversed(sizes))


def train(args, image):
    accel = Accelerator(mesh_shape=(1,), bf16=not args.no_bf16)
    keys = KeyGen(args.seed)
    out_dir = result_dir('SinGAN')
    loss = WGANLoss()

    sizes = make_sizes(args.image_size, args.min_size, args.scale_factor)
    num_scale = len(sizes)
    reals = [jnp.asarray(resize_img(image[None], s)) for s in sizes]

    gens, disc = [], []
    g_param_list, g_bs_list, d_vars_list = [], [], []
    ch = args.channels
    for s in range(num_scale):
        G = SingleScaleGenerator(channels=ch, num_layers=args.num_layers,
                                 dtype=accel.compute_dtype)
        D = SingleScaleDiscriminator(channels=ch, num_layers=args.num_layers,
                                     dtype=accel.compute_dtype)
        gv = G.init(keys(), jnp.zeros((1, sizes[s], sizes[s], 3)),
                    jnp.zeros((1, sizes[s], sizes[s], 3)), train=True)
        dv = D.init(keys(), jnp.zeros((1, sizes[s], sizes[s], 3)), train=True)
        gens.append(G)
        disc.append(D)
        g_param_list.append(gv['params'])
        g_bs_list.append(gv.get('batch_stats', {}))
        d_vars_list.append(dv)
        if (s + 1) % 4 == 0:
            ch *= 2

    rec_noise = jax.random.normal(keys(), (1, sizes[0], sizes[0], 1))
    noise_amps = [1.0]

    total = num_scale * args.epochs_per_scale
    status = Status(total, bar=not args.log_file, log_file=args.log_file)

    for s in range(num_scale):
        g_tx = optax.adam(args.lr, b1=args.betas[0], b2=args.betas[1])
        d_tx = optax.adam(args.lr, b1=args.betas[0], b2=args.betas[1])
        g_opt = g_tx.init(g_param_list[s])
        d_opt = d_tx.init(d_vars_list[s]['params'])
        amps = tuple(noise_amps)

        def step_fn(g_params_s, g_bs, d_vars, g_opt, d_opt, key):
            keys_ = list(jax.random.split(key, num_scale + 2))
            params = list(g_param_list)
            params[s] = g_params_s

            def gen_fake(p_s, bs):
                ps = list(params)
                ps[s] = p_s
                fake, new_bs = pyramid_forward(
                    gens, ps, bs, sizes, amps, keys_, s)
                return fake, new_bs

            def gen_rec(p_s, bs):
                ps = list(params)
                ps[s] = p_s
                rec, _ = pyramid_forward(
                    gens, ps, bs, sizes, amps, keys_, s, rec_noise=rec_noise)
                return rec

            fake, _ = gen_fake(g_params_s, g_bs_list[:s] + [g_bs] +
                               g_bs_list[s + 1:])
            fake_sg = jax.lax.stop_gradient(fake)
            real = reals[s]

            def d_loss_fn(d_params):
                dv = {'params': d_params,
                      'batch_stats': d_vars['batch_stats']}
                rp, d_mut = disc[s].apply(dv, real, train=True,
                                          mutable=['batch_stats'])
                fp, d_mut = disc[s].apply({'params': d_params, **d_mut},
                                          fake_sg, train=True,
                                          mutable=['batch_stats'])
                adv = loss.d_loss(rp, fp)
                def d_apply(img):
                    out, _ = disc[s].apply({'params': d_params, **d_mut}, img,
                                           train=True,
                                           mutable=['batch_stats'])
                    return out
                gp = gradient_penalty(keys_[-1], real, fake_sg, d_apply,
                                      center=0.0)
                return adv + gp * args.gp_lambda, d_mut

            (d_loss, d_mut), d_grads = jax.value_and_grad(
                d_loss_fn, has_aux=True)(d_vars['params'])
            d_up, d_opt = d_tx.update(d_grads, d_opt, d_vars['params'])
            d_params = optax.apply_updates(d_vars['params'], d_up)
            new_d_vars = {'params': d_params, **d_mut}

            def g_loss_fn(p_s):
                bs_all = g_bs_list[:s] + [g_bs] + g_bs_list[s + 1:]
                fake2, new_bs = gen_fake(p_s, bs_all)
                fp, _ = disc[s].apply(new_d_vars, fake2, train=True,
                                      mutable=['batch_stats'])
                rec = gen_rec(p_s, bs_all)
                rec_loss = jnp.mean((rec - real) ** 2)
                return loss.g_loss(fp) + rec_loss * args.rec_alpha, \
                    (new_bs[s], rec_loss)

            (g_loss, (new_g_bs, rec_loss)), g_grads = jax.value_and_grad(
                g_loss_fn, has_aux=True)(g_params_s)
            g_up, g_opt = g_tx.update(g_grads, g_opt, g_params_s)
            g_params_s = optax.apply_updates(g_params_s, g_up)

            return (g_params_s, new_g_bs, new_d_vars, g_opt, d_opt,
                    d_loss, g_loss, rec_loss)

        jstep = jax.jit(step_fn)
        g_bs = g_bs_list[s]
        d_vars = d_vars_list[s]
        g_params_s = g_param_list[s]
        last_rec = jnp.float32(0.0)
        for epoch in range(args.epochs_per_scale):
            (g_params_s, g_bs, d_vars, g_opt, d_opt,
             d_loss, g_loss, last_rec) = jstep(
                g_params_s, g_bs, d_vars, g_opt, d_opt, keys())
            status.update(d=d_loss, g=g_loss)
        g_param_list[s] = g_params_s
        g_bs_list[s] = g_bs
        d_vars_list[s] = d_vars

        # save per-scale sample + compute next noise_amp from recon RMSE
        fake, _ = pyramid_forward(gens, g_param_list, g_bs_list, sizes,
                                  tuple(noise_amps),
                                  list(jax.random.split(keys(), num_scale + 2)),
                                  s, train=False)
        save_image(np.asarray(fake), os.path.join(out_dir, f'scale_{s}.jpg'),
                   nrow=1)
        if s + 1 < num_scale:
            rec, _ = pyramid_forward(gens, g_param_list, g_bs_list, sizes,
                                     tuple(noise_amps),
                                     list(jax.random.split(
                                         keys(), num_scale + 2)),
                                     s, rec_noise=rec_noise, train=False)
            up_rec = resize_img(rec, sizes[s + 1])
            rmse = float(jnp.sqrt(jnp.mean((up_rec - reals[s + 1]) ** 2)))
            noise_amps.append(args.noise_amp_scale * rmse)

    status.plot_loss(os.path.join(out_dir, 'loss'))
    save_model(os.path.join(out_dir, 'G_final.msgpack'),
               {'params': g_param_list, 'noise_amps': jnp.asarray(noise_amps)})
    return g_param_list, status


def main(parser):
    parser = add_args(parser, dict(
        min_size=[25, 'minimum pyramid size'],
        scale_factor=[0.75, 'scale factor between pyramid levels'],
        channels=[32, 'channel width'],
        num_layers=[5, 'conv layers per scale'],
        epochs_per_scale=[2000, 'training steps per scale'],
        lr=[5e-4, 'learning rate'],
        betas=[[0.5, 0.999], 'betas'],
        gp_lambda=[0.1, 'lambda for zero-centered gp'],
        rec_alpha=[10., 'lambda for reconstruction'],
        noise_amp_scale=[0.1, 'noise amplitude scale'],
    ))
    args = parser.parse_args()
    save_args(args)

    dataset = build_dataset(args, 'image')
    image = jnp.asarray(dataset[0])
    if args.max_iters > 0:
        args.epochs_per_scale = max(1, args.max_iters)
    train(args, image)
