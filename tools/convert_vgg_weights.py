'''Convert torchvision VGG16/VGG19 weights to the flax .npz layout.

The perceptual-loss recipes (SRGAN, ESRGAN, pix2pixHD, SCFT, SPADE, GANILLA,
UGATIT, ...) match the reference (`nnutils/loss/vgg.py:15-69`, pretrained
torchvision VGG) only when real ImageNet weights are present. Run once on
any machine that has the checkpoint (this container has no egress):

    # on a machine with torchvision:
    python -c "import torch, torchvision; \
        torch.save(torchvision.models.vgg16(weights='IMAGENET1K_V1').state_dict(), 'vgg16.pth')"
    python tools/convert_vgg_weights.py vgg16.pth vgg16.npz
    export ANIMEFACE_VGG_WEIGHTS=/path/to/vgg16.npz

The .npz keys mirror the flax module tree of
`animeface_tpu.nnutils.loss.vgg.VGGFeatures`: `conv{block}_{i}/kernel`
(HWIO) and `conv{block}_{i}/bias`, plus a `__layers__` marker (16 or 19).
`VGGLoss` also accepts the raw .pth (torch used as a deserializer only),
but the .npz path is torch-free at train time.
'''

from __future__ import annotations

import sys

import numpy as np

# conv layout per block (same table as nnutils/loss/vgg.py)
_CFG = {16: (2, 2, 3, 3, 3), 19: (2, 2, 4, 4, 4)}


def convert(state_dict) -> dict:
    '''torchvision vgg state dict -> {flax key: array} (classifier dropped).'''
    conv_keys = sorted(
        (k for k in state_dict
         if k.startswith('features') and k.endswith('.weight')
         and getattr(state_dict[k], 'ndim', 0) == 4),
        key=lambda k: int(k.split('.')[1]))
    n_convs = len(conv_keys)
    layers = {13: 16, 16: 19}.get(n_convs)
    if layers is None:
        raise ValueError(
            f'{n_convs} conv layers in features: not a VGG16 (13) or VGG19 (16) '
            f'state dict')

    def to_np(t):
        return np.asarray(t.detach().cpu().numpy() if hasattr(t, 'detach') else t)

    out = {'__layers__': np.int32(layers)}
    it = iter(conv_keys)
    for block, per_block in enumerate(_CFG[layers]):
        for i in range(per_block):
            wk = next(it)
            bk = wk.replace('.weight', '.bias')
            out[f'conv{block}_{i}/kernel'] = \
                to_np(state_dict[wk]).transpose(2, 3, 1, 0)  # OIHW -> HWIO
            out[f'conv{block}_{i}/bias'] = to_np(state_dict[bk])
    return out


def main():
    if len(sys.argv) != 3:
        print(__doc__)
        sys.exit(1)
    src, dst = sys.argv[1], sys.argv[2]
    import torch
    sd = torch.load(src, map_location='cpu', weights_only=True)
    if 'state_dict' in sd:
        sd = sd['state_dict']
    flat = convert(sd)
    np.savez(dst, **flat)
    print(f'wrote {len(flat)} arrays -> {dst}')


if __name__ == '__main__':
    main()
