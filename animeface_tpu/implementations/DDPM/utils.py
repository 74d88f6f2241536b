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
        rng, tkey, nkey, dkey = jax.random.split(state['rng'], 4)
        B = real.shape[0]
        t = jax.random.randint(tkey, (B,), 0, diffusion.timesteps)

        def loss_fn(params):
            x_noisy, noise = diffusion.q_sample(nkey, real, t)
            pred = model.apply({'params': params}, x_noisy, t, train=True,
                               rngs={'dropout': dkey})
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
                 attn_resls=tuple(args.attn_resls), attn_heads=args.attn_head,
                 time_affine=args.time_affine, dropout=args.dropout,
                 num_res=args.num_res, norm_name=args.norm_name,
                 act_name=args.act_name, dtype=accel.compute_dtype)
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
        model_fn = lambda x, t: model.apply({'params': state['ema']}, x, t,
                                            train=False)
        return diffusion.p_sample_loop(sample_key, model_fn, test_shape)

    # reference samples on a SLOWER cadence than checkpointing because the
    # T-step ancestral loop is expensive (utils.py:18 `sample=1000` arg)
    return run_training(
        name='DDPM', args=args, accel=accel, state=state, loader=loader,
        train_step=train_step, sample_fn=sample_fn,
        max_iters=max_iters, save_interval=args.save,
        sample_interval=args.sample,
        ema_params_path=lambda s: s['ema'],
    )


def main(parser):
    # reference add_args schema (utils.py:75-96), verbatim
    parser = add_args(parser, dict(
        num_test=[16, 'number of test smaples'],
        image_channels=[3, 'image channels'],
        bottom=[16, 'bottom width'],
        channels=[32, 'channel width mutiplier'],
        attn_resls=[[16], 'resolution to apply attention'],
        attn_head=[8, 'heads for MHA'],
        time_affine=[False, 'adaptive normalization'],
        dropout=[0., 'dropout'],
        num_res=[1, 'number of residual blocks in one resolution'],
        norm_name=['gn', 'normalization layer name'],
        act_name=['swish', 'activation layer name'],
        timesteps=[1000, 'number of time steps in forward/backward '
                         'diffusion process'],
        lr=[2e-5, 'learning rate'],
        betas=[[0.9, 0.999], 'betas'],
        sample=[10000, 'sample very. inference takes time hence different '
                       'arg for testing.'],
    ))
    args = parser.parse_args()
    save_args(args)

    loader = build_loader(args, 'image')
    max_iters = default_max_iters(args, loader)
    train(args, max_iters, loader)
