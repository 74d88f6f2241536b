'''Device-resident dataset loading (TPU-native new capability).

The reference feeds every batch host->device through the PCIe copy in
`DataLoaderWrapper` (reference nnutils/accelerate.py:98) — cheap next to a
local GPU. On TPU hosts the honest accounting is different: H2D bandwidth
(not host decode) can bound the step, and small datasets fit comfortably in
HBM. `DeviceDataLoader` materializes the whole dataset ONCE as quantized
uint8 (the precision an 8-bit image dataset has anyway), transfers it to
device memory once, and yields per-step batches gathered and decoded to
float ON DEVICE — steady-state host->device traffic is one int32 index
vector per step.

This is the right feeding strategy for few-shot training (FastGAN-scale
datasets), the procedural synthetic stand-ins, and any remote-attached
accelerator where the host link is thin. Datasets larger than `max_bytes`
refuse loudly — use the streaming `DataLoader` (with its native C++ decode
path) instead.
'''

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp


def _encode(comp: np.ndarray):
    '''Per-component storage encoding: floats in [-1, 1] quantize to uint8
    (what a decoded 8-bit image dataset is); everything else stays as-is.'''
    if np.issubdtype(comp.dtype, np.floating) and comp.size \
            and float(comp.min()) >= -1.001 and float(comp.max()) <= 1.001:
        return np.round((comp.astype(np.float32) + 1.0) * 127.5).astype(np.uint8), 'u8pm1'
    return comp, 'raw'


class DeviceDataLoader:
    '''Epoch loader over a device-resident dataset copy.

    Same iteration contract as `DataLoader` (shuffled epochs, drop_last,
    host-shard slicing, `__len__` in batches) but yields DEVICE arrays:
    decode happens in one jitted gather per batch.
    '''

    def __init__(self, dataset, batch_size: int, shuffle: bool = True,
                 drop_last: bool = True, seed: int = 0,
                 shard_count: int | None = None, shard_index: int = 0,
                 max_bytes: int = 6 << 30, decode_dtype=None):
        assert batch_size >= 1
        if shard_count is None:
            # multi-host default (see DataLoader): per-process epoch shard,
            # GLOBAL batch size split across processes
            from animeface_tpu.parallel.multihost import (
                process_shard, local_batch_size)
            shard_count, shard_index = process_shard()
            batch_size = local_batch_size(batch_size)
        assert 0 <= shard_index < shard_count
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.seed = seed
        self.shard_count = shard_count
        self.shard_index = shard_index
        self._epoch = 0

        n = len(dataset)
        if n < 1:
            raise ValueError('empty dataset')
        first = dataset[0]
        comps = first if isinstance(first, (tuple, list)) else (first,)
        self._tuple = isinstance(first, (tuple, list))
        per_sample = sum(_encode(np.asarray(c))[0].nbytes for c in comps)
        total = per_sample * n
        if total > max_bytes:
            raise ValueError(
                f'dataset is {total / 1e9:.1f} GB encoded — too large for '
                f'device residency (cap {max_bytes / 1e9:.1f} GB); use the '
                f'streaming DataLoader')

        stacked = [np.empty((n,) + np.asarray(c).shape,
                            _encode(np.asarray(c))[0].dtype) for c in comps]
        kinds = [None] * len(comps)
        for i in range(n):
            s = dataset[i]
            s = s if isinstance(s, (tuple, list)) else (s,)
            for j, c in enumerate(s):
                enc, kind = _encode(np.asarray(c))
                stacked[j][i] = enc
                kinds[j] = kind
        self._kinds = kinds
        self._data = tuple(jax.device_put(a) for a in stacked)

        kinds_t = tuple(kinds)
        # bf16 decode halves the live decoded-batch footprint; models cast
        # inputs to the compute dtype anyway, and the data is uint8-quantized.
        dd = jnp.dtype(decode_dtype or jnp.float32)

        @jax.jit
        def fetch(data, idx):
            out = []
            for a, kind in zip(data, kinds_t):
                b = jnp.take(a, idx, axis=0)
                if kind == 'u8pm1':
                    b = (b.astype(jnp.float32) / 127.5 - 1.0).astype(dd)
                out.append(b)
            return tuple(out)

        self._fetch = fetch

    def __len__(self) -> int:
        n = self._data[0].shape[0] // self.shard_count
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def _epoch_indices(self) -> np.ndarray:
        n = self._data[0].shape[0]
        if self.shuffle:
            rng = np.random.default_rng(self.seed + self._epoch)
            idx = rng.permutation(n)
        else:
            idx = np.arange(n)
        return idx[self.shard_index::self.shard_count]

    def __iter__(self):
        idx = self._epoch_indices()
        self._epoch += 1
        nb = len(self) if self.drop_last else \
            (len(idx) + self.batch_size - 1) // self.batch_size
        for b in range(nb):
            chunk = np.asarray(idx[b * self.batch_size:
                                   (b + 1) * self.batch_size], np.int32)
            out = self._fetch(self._data, chunk)
            yield out if self._tuple else out[0]
