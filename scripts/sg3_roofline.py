'''StyleGAN3-T 256px step roofline: XLA cost analysis of the full train
step (FLOPs + bytes) -> v5e compute/HBM ceilings. Compiles on CPU (no TPU
needed); the FLOP count is backend-independent, so this anchors the
hardware-normalized throughput comparison for PERF_NOTES.

    python scripts/sg3_roofline.py [batch]
'''

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
# CPU by default (FLOP counts are backend-independent); set
# ANIMEFACE_PLATFORM=axon to compile on the TPU and get ITS post-fusion
# byte counts instead
jax.config.update('jax_platforms',
                  os.environ.get('ANIMEFACE_PLATFORM', 'cpu'))
jax.config.update('jax_compilation_cache_dir', '/tmp/animeface_jax_cache')
import jax.numpy as jnp

from animeface_tpu.utils import EasyDict
from animeface_tpu.nnutils import KeyGen
from animeface_tpu.nnutils.loss import NonSaturatingLoss
from animeface_tpu.implementations.StyleGAN3.utils import (
    build_models, build_train_step, make_optimizers, init_state)

V5E_BF16_TFLOPS = 197.0
V5E_HBM_GBS = 819.0


def main(batch=32, image_size=256):
    args = EasyDict(
        image_size=image_size, image_channels=3, latent_dim=512,
        style_dim=512, num_layers=14, map_num_layers=2, channels=32,
        max_channels=512, no_pixel_norm=False, d_channels=32,
        d_max_channels=512, mbsd_group_size=4, mbsd_channels=1, bottom=4,
        lr=0.0025, map_lr_scale=0.01, betas=[0., 0.99], gp_lambda=3.,
        gp_every=16, policy='color,translation', mesh=[-1], no_bf16=False,
        seed=0,
    )
    keys = KeyGen(0)
    G, D = build_models(args, jnp.bfloat16)
    G = G.clone(flrelu_memory='pack')
    g_tx, d_tx = make_optimizers(args)
    state, _ = init_state(args, G, D, g_tx, d_tx, keys)
    loss = NonSaturatingLoss()

    x = jnp.zeros((batch, image_size, image_size, 3), jnp.float32)
    for do_r1, tag in ((False, 'plain'), (True, 'r1')):
        step = build_train_step(G, D, g_tx, d_tx, loss, args.policy,
                                args.gp_lambda, do_r1=do_r1)
        lowered = jax.jit(step).lower(state, x)
        cost = lowered.compile().cost_analysis()
        if isinstance(cost, (list, tuple)):
            cost = cost[0]
        fl = cost.get('flops', float('nan'))
        by = cost.get('bytes accessed', float('nan'))
        t_mxu = fl / (V5E_BF16_TFLOPS * 1e12)
        t_hbm = by / (V5E_HBM_GBS * 1e9)
        print(f'{tag:6s}: {fl / 1e12:7.2f} TFLOP  {by / 1e9:7.1f} GB  '
              f'-> v5e floors: compute {t_mxu * 1e3:7.1f} ms, '
              f'HBM {t_hbm * 1e3:7.1f} ms  '
              f'({fl / batch / 1e9:.1f} GFLOP/img)', flush=True)


if __name__ == '__main__':
    main(*(int(a) for a in sys.argv[1:]))
