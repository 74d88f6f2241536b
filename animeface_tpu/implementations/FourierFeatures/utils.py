'''FourierFeatures recipe (reference `implementations/FourierFeatures/utils.py`):
fit one image from coords with MSE, track PSNR, save prediction|target grids.

Reference behavior kept: trains on the half-resolution `[::2, ::2]` subgrid
and evaluates the best-PSNR model on the full grid (`prepair_data`,
reference utils.py:65-82), best checkpoint + `best.jpg` + train-seq gif.
'''

from __future__ import annotations

import glob
import os

import numpy as np
import jax
import jax.numpy as jnp
import optax

from animeface_tpu.implementations.FourierFeatures.model import MLP, make_coords
from animeface_tpu.utils import add_args, save_args, save_image, Status
from animeface_tpu.utils.misc import gif_from_files
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
                map_scale=args.map_scale, num_layers=args.num_layers,
                hid_channels=args.hid_channels, act_name=args.act_name,
                norm_name=args.norm_name, dtype=accel.compute_dtype)
    H, W, C = image.shape
    full_coords = make_coords(H, W).reshape(-1, 2)
    full_target = jnp.asarray(image.reshape(-1, C) * 0.5 + 0.5)  # [0,1]
    # reference trains at half resolution (utils.py:80 `[:, :, ::2, ::2]`)
    tH, tW = (H + 1) // 2, (W + 1) // 2
    coords = make_coords(H, W)[::2, ::2].reshape(-1, 2)
    target = jnp.asarray((image * 0.5 + 0.5)[::2, ::2].reshape(-1, C))

    variables = model.init({'params': keys()}, coords[:1])
    tx = optax.adam(args.lr, b1=args.betas[0], b2=args.betas[1])
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
    best_psnr, best_variables = -999.0, state['variables']
    while not status.is_end():
        state, loss = train_step(state)
        psnr = -10.0 * float(jnp.log10(loss + 1e-12))
        if psnr > best_psnr:
            best_psnr = psnr
            best_variables = state['variables']
        if status.batches_done % args.save == 0:
            out = model.apply(state['variables'], coords).reshape(tH, tW, C)
            grid = np.stack([np.asarray(out),
                             np.asarray(target).reshape(tH, tW, C)])
            save_image(grid * 2 - 1, os.path.join(
                out_dir, f'{status.batches_done}.jpg'), nrow=2)
        status.update(PSNR=psnr)

    # best-model eval on the FULL grid (reference utils.py:54-61)
    save_model(os.path.join(out_dir, 'model.msgpack'), best_variables)
    out = model.apply(best_variables, full_coords).reshape(H, W, C)
    grid = np.stack([np.asarray(out),
                     np.asarray(full_target).reshape(H, W, C)])
    save_image(grid * 2 - 1, os.path.join(out_dir, 'best.jpg'), nrow=2)
    seq = sorted(glob.glob(os.path.join(out_dir, '*.jpg')))
    if len(seq) > 1:
        gif_from_files(seq, os.path.join(out_dir, 'train-seq.gif'))
    status.plot_loss(os.path.join(out_dir, 'loss'))
    status.print(f'best PSNR: {best_psnr:.2f}')
    return state


def main(parser):
    # reference add_args schema (utils.py:85-96), verbatim
    parser = add_args(parser, dict(
        path=['/usr/src/data/danbooru/2020/0638/1115638.jpg',
              'path to image'],
        no_map=[False, 'do not use fourier feature mapping'],
        map_size=[256, 'fourier feature mapping size'],
        map_scale=[10., 'scale for B'],
        num_layers=[4, 'number of layers in MLP'],
        hid_channels=[256, 'hidden channel width'],
        act_name=['relu', 'activation function name'],
        norm_name=['bn', 'normalization layer name'],
        lr=[0.001, 'learning rate'],
        betas=[[0.9, 0.999], 'betas'],
    ))
    args = parser.parse_args()
    save_args(args)

    if os.path.isfile(args.path):
        from PIL import Image
        img = Image.open(args.path).convert('RGB')
        s = args.image_size
        img = img.resize((max(s, int(img.width * s / img.height)),
                          max(s, int(img.height * s / img.width))))
        left = (img.width - s) // 2
        top = (img.height - s) // 2
        img = img.crop((left, top, left + s, top + s))
        image = np.asarray(img, dtype=np.float32) / 127.5 - 1.0
    else:
        dataset = build_dataset(args, 'image')
        image = dataset[0]
    max_iters = args.max_iters if args.max_iters > 0 else 2000
    train(args, max_iters, image)
