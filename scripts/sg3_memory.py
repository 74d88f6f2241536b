'''StyleGAN3 256px batch>32 feasibility: compile-time HBM accounting
(round-5; VERDICT r4 item 1's refutation arm).

The remote TPU compile helper 500s on every StyleGAN3 train-step program
at batch >= 32 this round (11 combos over ~10 h, `/tmp/sg3_sweep.log`;
the same b32 `memory='pack'` program compiled in ~46 s and ran at
27.9 img/s in round 3), so the batch-scaling A/B cannot run on the chip.
This script answers the feasibility half with the compiler's own buffer
assignment: AOT-compile (lower().compile(), no execution) the FULL-width
StyleGAN3-T 256px R1 step — the memory-critical cadence branch — for every
(batch, flrelu memory mode, selective-remat placement) combo on the CPU
backend and report `CompiledMemoryStats`.

Calibration: CPU fusion differs from TPU, so absolute bytes are an
estimate — but two combos have MEASURED TPU outcomes to anchor the scale:
  * b32 store  OOMs the 16 GiB chip by 166 MiB (round 2, real TPU run)
  * b32 pack   fits and runs at 27.9 img/s   (round 3, real TPU run)
Any combo whose CPU-accounted footprint exceeds b32-store's is OOM on the
chip a fortiori; combos between the two anchors are genuinely open until
the compile helper recovers.

    python scripts/sg3_memory.py [--json out.json] [--combos b:mem:remat ...]

Ref: /root/reference/thirdparty/stylegan3_ops/ops/filtered_lrelu.cu:134
(the fused kernel whose memory role `memory='pack'` replaces).
'''

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
jax.config.update('jax_platforms', 'cpu')
jax.config.update('jax_compilation_cache_dir', '/tmp/animeface_jax_cache')
jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)
import jax.numpy as jnp

from animeface_tpu.utils import EasyDict
from animeface_tpu.nnutils import KeyGen
from animeface_tpu.nnutils.accelerate import Accelerator
from animeface_tpu.nnutils.loss import NonSaturatingLoss
from animeface_tpu.implementations.StyleGAN3.utils import (
    build_models, build_train_step, make_optimizers, init_state)

GiB = 1024 ** 3
HBM = 16 * GiB


def account(batch_size, memory, remat, image_size=256):
    args = EasyDict(
        image_size=image_size, image_channels=3, latent_dim=512, style_dim=512,
        num_layers=14, map_num_layers=2, channels=32, max_channels=512,
        no_pixel_norm=False, d_channels=32, d_max_channels=512,
        mbsd_group_size=4, mbsd_channels=1, bottom=4, lr=0.0025,
        map_lr_scale=0.01, betas=[0., 0.99], gp_lambda=3., gp_every=16,
        policy='color,translation', mesh=[-1], no_bf16=False, seed=0,
    )
    accel = Accelerator(mesh_shape=(-1,), bf16=True)
    keys = KeyGen(0)
    G, D = build_models(args, accel.compute_dtype)
    G = G.clone(flrelu_memory=memory)
    g_tx, d_tx = make_optimizers(args)
    state, _ = init_state(args, G, D, g_tx, d_tx, keys)

    remat_d = 'd' in remat.split('+')
    remat_r1 = 'r1' in remat.split('+')
    step = accel.jit_step(build_train_step(
        G, D, g_tx, d_tx, NonSaturatingLoss(), args.policy, args.gp_lambda,
        do_r1=True, remat_d=remat_d, remat_r1=remat_r1))
    state = accel.prepare(state)
    batch = accel.shard_batch(jnp.zeros(
        (batch_size, image_size, image_size, 3), jnp.float32))

    t0 = time.perf_counter()
    mem = step.lower(state, batch).compile().memory_analysis()
    dt = time.perf_counter() - t0
    n = accel.num_devices
    return dict(
        batch=batch_size, memory=memory, remat=remat,
        temp_mib=round(mem.temp_size_in_bytes / n / 2**20, 1),
        args_mib=round(mem.argument_size_in_bytes / n / 2**20, 1),
        alias_mib=round(mem.alias_size_in_bytes / n / 2**20, 1),
        # donated state aliases outputs: live footprint = temp + (args-alias)
        footprint_gib=round((mem.temp_size_in_bytes
                             + mem.argument_size_in_bytes
                             - mem.alias_size_in_bytes) / n / GiB, 3),
        compile_s=round(dt, 1),
    )


def main():
    p = argparse.ArgumentParser()
    p.add_argument('--json', default=None)
    p.add_argument('--combos', nargs='*', default=[
        '32:store:none',            # TPU anchor: OOM by 166 MiB (round 2)
        '32:pack:none',             # TPU anchor: fits, 27.9 img/s (round 3)
        '48:pack:none', '64:pack:none',
        '48:pack:r1', '64:pack:r1',
        '64:pack:d+r1',
        '48:remat:none', '64:remat:none',
    ], help='batch:memory:remat triples')
    a = p.parse_args()

    rows = []
    for combo in a.combos:
        b, mem, remat = combo.split(':')
        try:
            row = account(int(b), mem, remat)
        except Exception as e:  # keep sweeping; record the failure
            row = dict(batch=int(b), memory=mem, remat=remat,
                       error=f'{type(e).__name__}: {e}'[:200])
        rows.append(row)
        print(json.dumps(row), flush=True)

    if a.json:
        with open(a.json, 'w') as f:
            json.dump(rows, f, indent=1)


if __name__ == '__main__':
    main()
