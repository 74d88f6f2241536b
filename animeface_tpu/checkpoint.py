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
            state = serialization.from_bytes(target, f.read())
        with open(os.path.join(path, 'meta.json'), encoding='utf-8') as f:
            meta = json.load(f)
        return state, meta


def save_model(path: str, params) -> None:
    '''Standalone weights artifact (the reference's torch.save(state_dict())
    equivalent, weights.md flow): a single msgpack file of the params pytree.'''
    params = _to_host(params)
    with open(path, 'wb') as f:
        f.write(serialization.to_bytes(params))


def load_model(path: str, target):
    with open(path, 'rb') as f:
        return serialization.from_bytes(target, f.read())
