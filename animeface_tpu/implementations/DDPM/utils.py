'''DDPM training recipe (reference `implementations/DDPM/utils.py`):
epsilon-prediction MSE at uniform random t, EMA model for sampling, ancestral
sampling via the lax.scan loop.'''

from __future__ import annotations

import jax
import jax.numpy as jnp
import optax

from animeface_tpu.implementations.DDPM.model import UNet, GaussianDiffusion
from animeface_tpu.utils import add_args, save_args
from animeface_tpu.nnutils import KeyGen, update_ema
from animeface_tpu.nnutils.accelerate import Accelerator
from animeface_tpu.nnutils.trainer import run_training, default_max_iters
from animeface_tpu.dataset import build_loader


def build_train_step(model, diffusion, tx, ema_decay=0.999):
    def train_step(state, real):
        rng, tkey, nkey = jax.random.split(state['rng'], 3)
        B = real.shape[0]
        t = jax.random.randint(tkey, (B,), 0, diffusion.timesteps)

        def loss_fn(params):
            x_noisy, noise = diffusion.q_sample(nkey, real, t)
            pred = model.apply({'params': params}, x_noisy, t)
            return jnp.mean((pred - noise) ** 2)

        loss, grads = jax.value_and_grad(loss_fn)(state['params'])
        up, opt = tx.update(grads, state['opt'], state['params'])
        params = optax.apply_updates(state['params'], up)
        ema = update_ema(params, state['ema'], ema_decay)
        return dict(rng=rng, params=params, ema=ema, opt=opt,
                    step=state['step'] + 1), \
            dict(loss=jnp.nan_to_num(loss))

    return train_step


def train(args, max_iters, loader):
    accel = Accelerator(mesh_shape=tuple(args.mesh), bf16=not args.no_bf16)
    keys = KeyGen(args.seed)

    model = UNet(image_size=args.image_size, bottom=args.bottom,
                 in_channels=args.image_channels, channels=args.channels,
                 attn_resls=tuple(args.attn_resls), attn_heads=args.attn_heads,
                 num_res=args.num_res, dtype=accel.compute_dtype)
    diffusion = GaussianDiffusion(args.timesteps)

    variables = model.init(
        keys(), jnp.zeros((1, args.image_size, args.image_size,
                           args.image_channels)),
        jnp.zeros((1,), jnp.int32))

    tx = optax.adam(args.lr, b1=args.betas[0], b2=args.betas[1])
    state = dict(rng=keys(), params=variables['params'],
                 ema=jax.tree_util.tree_map(jnp.copy, variables['params']),
                 opt=tx.init(variables['params']), step=jnp.int32(0))
    train_step = accel.jit_step(build_train_step(model, diffusion, tx))

    sample_key = keys()
    test_shape = (args.num_test, args.image_size, args.image_size,
                  args.image_channels)

    @jax.jit
    def sample_fn(state):
        model_fn = lambda x, t: model.apply({'params': state['ema']}, x, t)
        return diffusion.p_sample_loop(sample_key, model_fn, test_shape)

    return run_training(
        name='DDPM', args=args, accel=accel, state=state, loader=loader,
        train_step=train_step, sample_fn=sample_fn,
        max_iters=max_iters, save_interval=args.save,
        ema_params_path=lambda s: s['ema'],
    )


def main(parser):
    parser = add_args(parser, dict(
        num_test=[16, 'number of images to generate for eval'],
        image_channels=[3, 'image channels'],
        bottom=[8, 'bottom resolution of UNet'],
        channels=[32, 'channel width multiplier'],
        attn_resls=[[16], 'resolutions to apply self-attention'],
        attn_heads=[8, 'attention heads'],
        num_res=[1, 'res blocks per resolution'],
        timesteps=[1000, 'diffusion timesteps'],
        lr=[2e-5, 'learning rate'],
        betas=[[0.9, 0.999], 'adam betas'],
    ))
    args = parser.parse_args()
    save_args(args)

    loader = build_loader(args, 'image')
    max_iters = default_max_iters(args, loader)
    train(args, max_iters, loader)
