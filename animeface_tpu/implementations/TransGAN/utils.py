'''TransGAN recipe (reference `implementations/TransGAN/utils.py:112-147`):
non-saturating + R1, DiffAugment, optional EMA, generic adv loop. add_args
names/defaults mirror the reference schema (`gp_every` is a TPU-side extra:
the reference applies gp every step; gp_every=1 recovers that). The
reference trains with dropout 0.1 in both G and D — the training steps pass
a 'dropout' rng to enable it; samplers do not (= torch eval mode).'''

from __future__ import annotations

import jax.numpy as jnp
import optax

from animeface_tpu.implementations.TransGAN.model import Generator, Discriminator
from animeface_tpu.utils import add_args, save_args
from animeface_tpu.nnutils.loss import NonSaturatingLoss
from animeface_tpu.nnutils.simple_gan import run_simple_gan
from animeface_tpu.nnutils.trainer import default_max_iters
from animeface_tpu.dataset import build_loader


def main(parser):
    parser = add_args(parser, dict(
        image_channels=[3, 'channels of the output image'],
        latent_dim=[128, 'dimension of latent input'],
        g_depths=[[5, 4, 2], 'number of transformer blocks per resolution'],
        bottom_width=[8, 'first resolution'],
        g_embed_dim=[1024, 'dimension of embedding in G. times of 4'],
        g_num_heads=[4, 'number of heads in multi-head attention in G'],
        g_mlp_ratio=[4, 'ratio for hidden features in mlp in G'],
        g_use_qkv_bias=[False, 'use bias for query, key and value in G'],
        g_dropout=[0.1, 'dropout probability in G'],
        g_attn_dropout=[0.1, 'dropout probability for heatmap in G'],
        g_act_name=['gelu', 'activation function in G'],
        g_norm_name=['ln', 'normalization layer name in G (fixed: ln)'],
        patch_size=[8, 'size of each patch'],
        d_depth=[7, 'number of encoders in D'],
        d_embed_dim=[384, 'dimension of embedding in D. times of 4'],
        d_num_heads=[4, 'number of heads in multi-head attention in D'],
        d_mlp_ratio=[4, 'ratio for hidden features in mlp in D'],
        d_use_qkv_bias=[False, 'use bias for query, key and value in D'],
        d_dropout=[0.1, 'dropout probability in D'],
        d_attn_dropout=[0.1, 'dropout probability for heatmap in D'],
        d_act_name=['gelu', 'activation function in D'],
        d_norm_name=['ln', 'normalization layer name in D (fixed: ln)'],
        lr=[0.00001, 'learning rate'],
        ttur=[False, 'use TTUR'],
        beta1=[0.5, 'beta1'],
        beta2=[0.999, 'beta2'],
        gp_lambda=[10., 'lambda for gradient penalty'],
        gp_every=[16, 'R1 every N steps (TPU lazy-reg extra)'],
        policy=['color,translation', 'policy for DiffAugment'],
        ema=[False, 'exponential moving average'],
        ema_decay=[0.999, 'decay for EMA'],
    ))
    args = parser.parse_args()
    save_args(args)

    loader = build_loader(args, 'image')
    max_iters = default_max_iters(args, loader)

    need = Generator.depths_len_from_target_width(args.image_size,
                                                  args.bottom_width)
    depths = list(args.g_depths)
    while len(depths) < need:
        depths.append(depths[-1])
    depths = depths[:need]

    dtype = jnp.float32 if args.no_bf16 else jnp.bfloat16
    G = Generator(depths=tuple(depths), latent_dim=args.latent_dim,
                  image_channels=args.image_channels,
                  bottom_width=args.bottom_width, embed_dim=args.g_embed_dim,
                  num_heads=args.g_num_heads, mlp_ratio=args.g_mlp_ratio,
                  qkv_bias=args.g_use_qkv_bias, dropout=args.g_dropout,
                  attn_dropout=args.g_attn_dropout, act_name=args.g_act_name,
                  dtype=dtype)
    D = Discriminator(depth=args.d_depth, image_size=args.image_size,
                      patch_size=args.patch_size,
                      image_channels=args.image_channels,
                      embed_dim=args.d_embed_dim, num_heads=args.d_num_heads,
                      mlp_ratio=args.d_mlp_ratio,
                      qkv_bias=args.d_use_qkv_bias, dropout=args.d_dropout,
                      attn_dropout=args.d_attn_dropout,
                      act_name=args.d_act_name, dtype=dtype)

    g_lr, d_lr = ((args.lr / 2, args.lr * 2) if args.ttur
                  else (args.lr, args.lr))   # reference :203-205
    g_rngs = ('dropout',) if (args.g_dropout or args.g_attn_dropout) else ()
    d_rngs = ('dropout',) if (args.d_dropout or args.d_attn_dropout) else ()

    run_simple_gan(
        'TransGAN', args, loader, max_iters, G, D, NonSaturatingLoss(),
        jnp.zeros((1, args.latent_dim)),
        jnp.zeros((1, args.image_size, args.image_size, 3)),
        args.latent_dim,
        g_tx=optax.adam(g_lr, b1=args.beta1, b2=args.beta2),
        d_tx=optax.adam(d_lr, b1=args.beta1, b2=args.beta2),
        gp_lambda=args.gp_lambda, gp_every=args.gp_every, policy=args.policy,
        ema_decay=args.ema_decay, use_ema=args.ema,
        g_rngs=g_rngs, d_rngs=d_rngs)
