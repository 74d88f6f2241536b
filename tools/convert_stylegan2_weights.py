'''Convert the reference StyleGAN2 Generator checkpoint (torch) to flax msgpack.

Target artifact: the published animeface 128px StyleGAN2 G
(`/root/reference/weights.md:1-40`: image_size=128, style_dim=512,
channels=32, max_channels=512, block_num_conv=2, map_num_layers=8,
map_lr=0.01). Works for any config of the same architecture
(`/root/reference/implementations/StyleGAN2/model.py:335-369`).

    python tools/convert_stylegan2_weights.py StyleGAN2_animeface_128pix.pt G.msgpack
    python tools/generate.py StyleGAN2 --weights G.msgpack --image-size 128 ...

Exact-parity mapping (torch NCHW / OIHW -> flax NHWC / HWIO):
  map.map.{2i}.linear.layer.{weight,bias} -> map/ELRDense_{i}/{kernel.T,bias}
  const [1,S,4,4]                          -> const [1,4,4,S]
  synthesis.input.*                        -> synthesis/input/*
  synthesis.input_to_image.conv.*          -> synthesis/input_to_image/ModulatedConv_0/*
  synthesis.blocks.{i}.block.{2+3j}.*      -> synthesis/StyleBlock_{i}/ModulatedConv_{j}/*
  synthesis.to_images.{i}.conv.*           -> synthesis/ToImage_{i}/ModulatedConv_0/*
ModulatedConv2d: weight OIkk -> kernel HWIO (transpose 2,3,1,0), bias
[1,O,1,1] -> [O]; affine = ELR Linear -> affine/{kernel.T,bias}. The
equalized-lr coefficient gain/sqrt(fan) is applied at apply-time in both
frameworks, so raw weights transfer unchanged. Dropped: InjectNoise.scale
(dead code in the reference forward, model.py:80-87) and Blur2d kernel
buffers (fixed constants).

Golden parity is asserted by tests/test_stylegan2_convert.py (synthetic
state dict, torch reference forward as oracle; with $ANIMEFACE_SG2_WEIGHTS
set, against the real artifact too).
'''

from __future__ import annotations

import sys

import numpy as np


def _t(x):
    return np.asarray(x.detach().cpu().numpy() if hasattr(x, 'detach') else x)


def _modconv(sd, prefix):
    '''torch ModulatedConv2d params at `prefix` -> flax ModulatedConv dict.'''
    w = _t(sd[f'{prefix}.weight'])                      # [O, I, kh, kw]
    return {
        'kernel': w.transpose(2, 3, 1, 0),              # HWIO
        'bias': _t(sd[f'{prefix}.bias']).reshape(-1),   # [1,O,1,1] -> [O]
        'affine': {
            'kernel': _t(sd[f'{prefix}.affine.layer.weight']).T,
            'bias': _t(sd[f'{prefix}.affine.layer.bias']),
        },
    }


def convert_generator(sd) -> dict:
    '''Reference G state_dict -> flax params tree for
    animeface_tpu.implementations.StyleGAN2.model.Generator.'''
    params = {}

    # mapping network: MapLinear at even indices of the Sequential
    map_idx = sorted({int(k.split('.')[2]) for k in sd
                      if k.startswith('map.map.')})
    mapping = {}
    for i, idx in enumerate(map_idx):
        mapping[f'ELRDense_{i}'] = {
            'kernel': _t(sd[f'map.map.{idx}.linear.layer.weight']).T,
            'bias': _t(sd[f'map.map.{idx}.linear.layer.bias']),
        }
    params['map'] = mapping

    params['const'] = _t(sd['const']).transpose(0, 2, 3, 1)  # [1,4,4,S]

    syn = {
        'input': _modconv(sd, 'synthesis.input'),
        'input_to_image': {
            'ModulatedConv_0': _modconv(sd, 'synthesis.input_to_image.conv')},
    }
    n_blocks = len({int(k.split('.')[2]) for k in sd
                    if k.startswith('synthesis.blocks.')})
    for i in range(n_blocks):
        conv_pos = sorted(
            int(k.split('.')[4]) for k in sd
            if k.startswith(f'synthesis.blocks.{i}.block.')
            and k.endswith('.weight') and not k.endswith('.layer.weight')
            and _t(sd[k]).ndim == 4)
        syn[f'StyleBlock_{i}'] = {
            f'ModulatedConv_{j}': _modconv(sd, f'synthesis.blocks.{i}.block.{pos}')
            for j, pos in enumerate(conv_pos)}
        syn[f'ToImage_{i}'] = {
            'ModulatedConv_0': _modconv(sd, f'synthesis.to_images.{i}.conv')}
    params['synthesis'] = syn
    return params


def main():
    if len(sys.argv) != 3:
        print(__doc__)
        sys.exit(1)
    src, dst = sys.argv[1], sys.argv[2]
    import torch
    sd = torch.load(src, map_location='cpu', weights_only=True)
    if 'state_dict' in sd:
        sd = sd['state_dict']
    params = convert_generator(sd)

    sys.path.insert(0, '.')
    from animeface_tpu.checkpoint import save_model
    save_model(dst, params)
    n = sum(int(np.prod(np.shape(v))) for v in
            __import__('jax').tree_util.tree_leaves(params))
    print(f'wrote G params ({n:,} scalars) -> {dst}')


if __name__ == '__main__':
    main()
