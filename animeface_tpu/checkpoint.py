'''Full-train-state checkpointing with first-class resume.

The reference only ever saves `G_ema.state_dict()` (save-only,
implementations/StyleGAN2/utils.py:123) and never resumes optimizer/EMA/ADA-p
state (SURVEY.md §5). Here the FULL state pytree — params, optimizer states,
EMA, augmentation probability, PRNG key, step — is serialized per step with
atomic rename, retention GC, and a `latest_step` lookup, plus JSON metadata
(Status history, args) for the host-side objects.

Backend: flax.serialization msgpack (synchronous, single-file, no async
barriers — orbax's CheckpointManager deadlocks on single-CPU hosts, so it is
deliberately not used).
'''

from __future__ import annotations

import json
import os
import re
import shutil
import tempfile

import jax
import numpy as np
from flax import serialization


_STEP_RE = re.compile(r'^ckpt-(\d+)$')


def _to_host(tree):
    return jax.tree_util.tree_map(lambda x: np.asarray(x), tree)


class Checkpointer:
    '''Directory of `ckpt-<step>/{state.msgpack, meta.json}` checkpoints.'''

    def __init__(self, directory: str, max_to_keep: int = 3) -> None:
        self.directory = str(directory)
        self.max_to_keep = max_to_keep
        os.makedirs(self.directory, exist_ok=True)
        # sweep staging dirs orphaned by a hard kill mid-save
        for name in os.listdir(self.directory):
            if name.startswith('.tmp-ckpt-'):
                shutil.rmtree(os.path.join(self.directory, name),
                              ignore_errors=True)

    # ---- write ----

    def save(self, step: int, state, meta: dict | None = None) -> str:
        state = _to_host(state)
        final = os.path.join(self.directory, f'ckpt-{int(step)}')
        tmp = tempfile.mkdtemp(prefix='.tmp-ckpt-', dir=self.directory)
        try:
            with open(os.path.join(tmp, 'state.msgpack'), 'wb') as f:
                f.write(serialization.to_bytes(state))
            with open(os.path.join(tmp, 'meta.json'), 'w', encoding='utf-8') as f:
                json.dump(meta or {}, f, default=str)
            if os.path.isdir(final):
                shutil.rmtree(final)
            os.replace(tmp, final)   # atomic publish
        except BaseException:
            shutil.rmtree(tmp, ignore_errors=True)
            raise
        self._gc()
        return final

    def _gc(self) -> None:
        steps = self.all_steps()
        for s in steps[:-self.max_to_keep] if self.max_to_keep else []:
            shutil.rmtree(os.path.join(self.directory, f'ckpt-{s}'),
                          ignore_errors=True)

    # ---- read ----

    def all_steps(self) -> list[int]:
        steps = []
        for name in os.listdir(self.directory):
            m = _STEP_RE.match(name)
            if m:
                steps.append(int(m.group(1)))
        return sorted(steps)

    def latest_step(self) -> int | None:
        steps = self.all_steps()
        return steps[-1] if steps else None

    def restore(self, target, step: int | None = None):
        '''Restore into the structure of `target` (a template pytree).

        Returns (state, meta). Raises FileNotFoundError when no checkpoint.
        '''
        if step is None:
            step = self.latest_step()
        if step is None:
            raise FileNotFoundError(f'no checkpoints in {self.directory}')
        path = os.path.join(self.directory, f'ckpt-{int(step)}')
        with open(os.path.join(path, 'state.msgpack'), 'rb') as f:
            raw = f.read()
        try:
            state = serialization.from_bytes(target, raw)
        except (ValueError, KeyError) as e:
            state = _restore_with_migration(target, raw, path, e)
        _check_leaf_shapes(target, state, path)
        with open(os.path.join(path, 'meta.json'), encoding='utf-8') as f:
            meta = json.load(f)
        return state, meta


def _check_leaf_shapes(target, state, path: str) -> None:
    '''flax from_bytes replaces template leaves WITHOUT shape validation, so a
    checkpoint from a differently-sized model restores "successfully" and only
    fails later inside jit with an opaque error. Fail early instead.'''
    t_leaves = jax.tree_util.tree_leaves_with_path(target)
    s_leaves = jax.tree_util.tree_leaves(state)
    for (keypath, t), s in zip(t_leaves, s_leaves):
        ts = getattr(t, 'shape', None)
        ss = getattr(s, 'shape', None)
        if ts is not None and ss is not None and tuple(ts) != tuple(ss):
            raise ValueError(
                f'checkpoint {path}: leaf {jax.tree_util.keystr(keypath)} has '
                f'shape {tuple(ss)} but the template expects {tuple(ts)} — '
                f'wrong model size/config for this snapshot')


def _restore_with_migration(target, raw: bytes, path: str, orig_err):
    '''Forward-compatible restore for checkpoints written before a state
    leaf was added (e.g. the round-4 `ada['count']` leaf: flax from_bytes
    restores by exact structure, so old snapshots would hard-fail).

    Missing keys are default-filled from the template (LOUDLY), extra keys in
    the file are dropped (LOUDLY). Anything else re-raises the original
    error — silent shape/dtype mismatches must stay fatal.
    '''
    loaded = serialization.msgpack_restore(raw)
    template_sd = serialization.to_state_dict(target)
    filled, dropped = [], []

    def merge(tmpl, got, prefix):
        if not isinstance(tmpl, dict):
            return got
        out = {}
        got = got if isinstance(got, dict) else {}
        for k, v in tmpl.items():
            if k in got:
                out[k] = merge(v, got[k], f'{prefix}/{k}')
            else:
                filled.append(f'{prefix}/{k}')
                out[k] = v
        for k in got:
            if k not in tmpl:
                dropped.append(f'{prefix}/{k}')
        return out

    merged = merge(template_sd, loaded, '')
    if not filled and not dropped:
        raise orig_err
    print(f'[checkpoint] MIGRATED restore from {path}:')
    for p in filled:
        print(f'[checkpoint]   missing leaf default-filled from template: {p}')
    for p in dropped:
        print(f'[checkpoint]   obsolete leaf in file dropped: {p}')
    return serialization.from_state_dict(target, merged)


def save_model(path: str, params) -> None:
    '''Standalone weights artifact (the reference's torch.save(state_dict())
    equivalent, weights.md flow): a single msgpack file of the params pytree.'''
    params = _to_host(params)
    with open(path, 'wb') as f:
        f.write(serialization.to_bytes(params))


def load_model(path: str, target):
    with open(path, 'rb') as f:
        return serialization.from_bytes(target, f.read())
