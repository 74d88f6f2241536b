'''FourierFeatures recipe (reference `implementations/FourierFeatures/utils.py`):
fit one image from coords with MSE, track PSNR, save prediction|target grids.'''

from __future__ import annotations

import os

import numpy as np
import jax
import jax.numpy as jnp
import optax

from animeface_tpu.implementations.FourierFeatures.model import MLP, make_coords
from animeface_tpu.utils import add_args, save_args, save_image, Status
from animeface_tpu.utils.argument import result_dir
from animeface_tpu.nnutils import KeyGen
from animeface_tpu.nnutils.accelerate import Accelerator
from animeface_tpu.dataset import build_dataset
from animeface_tpu.checkpoint import save_model


def train(args, max_iters, image):
    accel = Accelerator(mesh_shape=(1,), bf16=not args.no_bf16)
    keys = KeyGen(args.seed)
    out_dir = result_dir('FourierFeatures')

    model = MLP(use_map=not args.no_map, map_size=args.map_size,
                map_scale=args.map_scale, dtype=accel.compute_dtype)
    H, W, C = image.shape
    coords = make_coords(H, W).reshape(-1, 2)
    target = jnp.asarray(image.reshape(-1, C) * 0.5 + 0.5)  # [0,1]

    variables = model.init({'params': keys()}, coords[:1])
    tx = optax.adam(args.lr)
    state = dict(variables=variables, opt=tx.init(variables['params']),
                 step=jnp.int32(0))

    @jax.jit
    def train_step(state, _=None):
        def loss_fn(params):
            out = model.apply({'params': params,
                               'consts': state['variables'].get('consts', {})},
                              coords)
            return jnp.mean((out - target) ** 2)
        loss, grads = jax.value_and_grad(loss_fn)(state['variables']['params'])
        up, opt = tx.update(grads, state['opt'])
        params = optax.apply_updates(state['variables']['params'], up)
        variables = dict(state['variables'], params=params)
        return dict(variables=variables, opt=opt, step=state['step'] + 1), loss

    status = Status(max_iters, bar=not args.log_file, log_file=args.log_file)
    best_psnr, best_params = -999.0, None
    while not status.is_end():
        state, loss = train_step(state)
        psnr = -10.0 * float(jnp.log10(loss + 1e-12))
        if psnr > best_psnr:
            best_psnr = psnr
        if status.batches_done % args.save == 0:
            out = model.apply(state['variables'], coords).reshape(H, W, C)
            grid = np.stack([np.asarray(out), np.asarray(target).reshape(H, W, C)])
            save_image(grid * 2 - 1, os.path.join(
                out_dir, f'{status.batches_done}.jpg'), nrow=2)
        status.update(PSNR=psnr)
    save_model(os.path.join(out_dir, 'model.msgpack'), state['variables'])
    status.plot_loss(os.path.join(out_dir, 'loss'))
    status.print(f'best PSNR: {best_psnr:.2f}')
    return state


def main(parser):
    parser = add_args(parser, dict(
        no_map=[False, 'disable fourier feature mapping'],
        map_size=[256, 'fourier feature mapping size'],
        map_scale=[10., 'scale of gaussian features'],
        lr=[1e-3, 'learning rate'],
    ))
    args = parser.parse_args()
    save_args(args)

    dataset = build_dataset(args, 'image')
    image = dataset[0]
    max_iters = args.max_iters if args.max_iters > 0 else 2000
    train(args, max_iters, image)
