'''Multi-host (pod-slice) initialization and process-level data sharding.

TPU-native equivalent of the reference's dormant DDP pieces — the
`InfiniteSampler(rank, num_replicas)` seed and the never-initialized
`torch.distributed` machinery (`thirdparty/stylegan2_ops/misc.py:106,164-187`;
SURVEY.md §2.5/§5): `jax.distributed.initialize` wires the coordinator so a
mesh built over `jax.devices()` spans the whole slice/pod — GSPMD collectives
then ride ICI within a slice and DCN across slices by construction.

Single-process runs are the degenerate path: every helper here collapses to
(count=1, index=0) no-ops, so callers use them unconditionally.

Launching on a pod slice (e.g. v4-8 / v5e-8, one process per host):

    # Cloud TPU: jax auto-detects the coordinator from the TPU metadata —
    python main.py StyleGAN2 --multihost ...

    # explicit coordinator (non-TPU clusters, CPU rehearsal):
    ANIMEFACE_COORDINATOR=host0:9999 ANIMEFACE_NUM_PROCESSES=2 \
    ANIMEFACE_PROCESS_ID=$RANK python main.py StyleGAN2 --multihost ...

Each process then loads a disjoint 1/num_processes slice of every epoch
(`DataLoader` resolves shard_count/shard_index from the process topology) and
`shard_batch` assembles the global batch array from the per-process slices
via `jax.make_array_from_process_local_data`.
'''

from __future__ import annotations

import os

_INITIALIZED = False


def multihost_requested(args=None) -> bool:
    return (bool(getattr(args, 'multihost', False))
            or os.environ.get('ANIMEFACE_MULTIHOST', '') not in ('', '0')
            or bool(os.environ.get('ANIMEFACE_COORDINATOR')))


def maybe_initialize_distributed(args=None) -> tuple[int, int]:
    '''Initialize `jax.distributed` when multi-host execution is requested
    (--multihost flag, ANIMEFACE_MULTIHOST=1, or ANIMEFACE_COORDINATOR set).

    Must run before the first jax backend touch. Idempotent. Returns
    (process_index, process_count); a plain single-process run returns (0, 1)
    without initializing anything.
    '''
    global _INITIALIZED
    import jax
    if multihost_requested(args) and not _INITIALIZED:
        coord = os.environ.get('ANIMEFACE_COORDINATOR')
        if coord:
            jax.distributed.initialize(
                coordinator_address=coord,
                num_processes=int(os.environ['ANIMEFACE_NUM_PROCESSES']),
                process_id=int(os.environ['ANIMEFACE_PROCESS_ID']),
            )
        else:
            # Cloud TPU / SLURM / GKE: jax auto-detects the cluster topology
            jax.distributed.initialize()
        _INITIALIZED = True
    return jax.process_index(), jax.process_count()


def process_shard() -> tuple[int, int]:
    '''(shard_count, shard_index) for the data loaders: each process decodes
    a disjoint 1/process_count slice of every epoch permutation — the
    InfiniteSampler rank/num_replicas semantics
    (thirdparty/stylegan2_ops/misc.py:106), actually wired in.'''
    import jax
    return jax.process_count(), jax.process_index()


def local_batch_size(global_batch: int) -> int:
    '''Per-process share of the global batch (the CLI --batch-size is global,
    matching its single-host meaning of "split across devices").'''
    import jax
    pc = jax.process_count()
    if global_batch % pc:
        raise ValueError(
            f'global batch size {global_batch} not divisible by '
            f'process_count {pc}')
    return global_batch // pc
