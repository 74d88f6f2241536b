'''AE training recipe (reference `implementations/AE/utils.py`): MSE (tanh) or
BCE-with-logits (sigmoid) reconstruction, Adam defaults, best-loss tracking.'''

from __future__ import annotations

import jax
import jax.numpy as jnp
import optax

from animeface_tpu.implementations.AE.model import AE
from animeface_tpu.utils import add_args, save_args
from animeface_tpu.nnutils import KeyGen
from animeface_tpu.nnutils.accelerate import Accelerator
from animeface_tpu.nnutils.trainer import run_training, default_max_iters
from animeface_tpu.dataset import build_loader


def build_train_step(model, tx, output_act):
    def criterion(out, target):
        if output_act == 'sigmoid':
            target01 = target * 0.5 + 0.5
            return jnp.mean(optax.sigmoid_binary_cross_entropy(out, target01))
        return jnp.mean((out - target) ** 2)

    def train_step(state, batch):
        def loss_fn(params):
            out, mut = model.apply(
                {'params': params, 'batch_stats': state['model']['batch_stats']},
                batch, train=True, mutable=['batch_stats'])
            return criterion(out, batch), mut

        (loss, mut), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state['model']['params'])
        up, opt = tx.update(grads, state['opt'], state['model']['params'])
        params = optax.apply_updates(state['model']['params'], up)
        return dict(state, model={'params': params, **mut}, opt=opt,
                    step=state['step'] + 1), dict(loss=loss)

    return train_step


def train(args, max_iters, loader):
    accel = Accelerator(mesh_shape=tuple(args.mesh), bf16=not args.no_bf16)
    keys = KeyGen(args.seed)

    model = AE(enc_dim=args.enc_dim, image_size=args.image_size,
               min_size=args.min_size, num_layers=args.num_layers,
               img_channels=args.img_channels, channels=args.channels,
               norm_name=args.norm_name, act_name=args.act_name,
               up_mode=args.up_mode, output_act=args.output_act,
               dtype=accel.compute_dtype)
    variables = model.init(keys(), jnp.zeros(
        (1, args.image_size, args.image_size, args.img_channels)), train=True)
    # norm_name != 'bn' has no batch_stats collection; keep the state shape
    variables = {'params': variables['params'],
                 'batch_stats': variables.get('batch_stats', {})}

    tx = optax.adam(1e-3)
    state = dict(rng=keys(), model=variables,
                 opt=tx.init(variables['params']), step=jnp.int32(0))
    train_step = accel.jit_step(build_train_step(model, tx, args.output_act))

    # reconstruction grid on a fixed batch
    const_batch = jnp.asarray(next(iter(loader))[:16])

    @jax.jit
    def sample_fn(state):
        out = model.apply(state['model'], const_batch, train=False)
        if args.output_act == 'sigmoid':
            out = jax.nn.sigmoid(out) * 2.0 - 1.0
        return out

    return run_training(
        name='AE', args=args, accel=accel, state=state, loader=loader,
        train_step=train_step, sample_fn=sample_fn,
        max_iters=max_iters, save_interval=args.save,
        ema_params_path=lambda s: s['model'],
    )


def main(parser):
    # reference add_args schema (utils.py:69-80), verbatim
    parser = add_args(parser, dict(
        enc_dim=[128, 'dimension to encode to'],
        min_size=[8, 'minimum size before flatten'],
        num_layers=[int, 'number of layers in encoder. if not given, '
                         'will be calculated from --min-size'],
        img_channels=[3, 'number of channels of the images'],
        channels=[64, 'channel width multiplier'],
        norm_name=['bn', 'normalization layer name'],
        act_name=['relu', 'activation function name'],
        up_mode=['bilinear', 'upsample mode'],
        output_act=['tanh', 'output activation.'],
    ))
    args = parser.parse_args()
    save_args(args)

    loader = build_loader(args, 'image')
    max_iters = default_max_iters(args, loader)
    train(args, max_iters, loader)
