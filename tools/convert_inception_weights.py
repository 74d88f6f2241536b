'''Convert pytorch-fid InceptionV3 weights to the flax .npz layout.

Run once on any machine that has the checkpoint (this container has no
egress to fetch it):

    python tools/convert_inception_weights.py pt_inception-2015-12-05.pth \
        inception_fid.npz
    export ANIMEFACE_INCEPTION_WEIGHTS=/path/to/inception_fid.npz

Accepts either the pytorch-fid checkpoint or a torchvision
`inception_v3` state_dict (fc/AuxLogits are dropped).
'''

from __future__ import annotations

import sys

import numpy as np


def convert(state_dict) -> dict:
    out = {}
    for key, tensor in state_dict.items():
        if key.startswith(('fc.', 'AuxLogits.')):
            continue
        val = np.asarray(tensor.detach().cpu().numpy()
                         if hasattr(tensor, 'detach') else tensor)
        parts = key.split('.')
        # <block...>.conv.weight / <block...>.bn.{weight,bias,running_*}
        if parts[-2] == 'conv' and parts[-1] == 'weight':
            # OIHW -> HWIO
            val = val.transpose(2, 3, 1, 0)
            out['params/' + '/'.join(parts[:-1]) + '/kernel'] = val
        elif parts[-2] == 'bn':
            base = '/'.join(parts[:-1])
            if parts[-1] == 'weight':
                out[f'params/{base}/scale'] = val
            elif parts[-1] == 'bias':
                out[f'params/{base}/bias'] = val
            elif parts[-1] == 'running_mean':
                out[f'batch_stats/{base}/mean'] = val
            elif parts[-1] == 'running_var':
                out[f'batch_stats/{base}/var'] = val
        # num_batches_tracked and anything else: drop
    return out


def main():
    if len(sys.argv) != 3:
        print(__doc__)
        sys.exit(1)
    src, dst = sys.argv[1], sys.argv[2]
    import torch
    sd = torch.load(src, map_location='cpu', weights_only=False)
    if hasattr(sd, 'state_dict'):
        sd = sd.state_dict()
    if 'state_dict' in sd:
        sd = sd['state_dict']
    flat = convert(sd)
    np.savez(dst, **flat)
    print(f'wrote {len(flat)} arrays -> {dst}')


if __name__ == '__main__':
    main()
