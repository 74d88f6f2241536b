'''Shared host-side training loop.

The reference deliberately has no Trainer class — each of the 47 recipes writes
its own loop over shared primitives (SURVEY.md §1). Here the *device* step stays
recipe-specific (a jitted `(state, batch) -> (state, metrics)` closure), but the
host choreography — Status updates, sample-grid + weights cadence, full-state
checkpoint/resume, loss plot — is identical everywhere, so it lives here once.

Deviation from the reference for TPU throughput: `running.jpg` is written at
the save cadence, not every step (a per-step D2H + PNG encode would serialize
the device pipeline).
'''

from __future__ import annotations

import os
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from animeface_tpu.checkpoint import Checkpointer, save_model
from animeface_tpu.utils import Status, save_image
from animeface_tpu.utils.argument import result_dir


def check_sustained_nan(status, name: str, window: int = 10) -> None:
    '''Failure detection (SURVEY §5, new capability — not a port): raise when
    ANY mature loss series has been non-finite for `window` consecutive
    steps. Series shorter than `window` (keys that first appeared mid-run)
    do not trip the guard.

    "Any series" (not "all series") is deliberate: always-finite auxiliary
    metrics (PGGAN's alpha ramp, ADA's clamped p) would otherwise veto the
    guard forever even while d/g are NaN (round-4 advisor finding). Aux
    metrics are finite by construction, so they never trip it; a loss that
    is NaN for a full window means the run is dead regardless of the others.
    '''
    import math
    for key, tail in status.loss_tail(window).items():
        if len(tail) < window:
            continue
        if not any(math.isfinite(v) for v in tail):
            raise FloatingPointError(
                f'[{name}] loss series {key!r} non-finite for {window} '
                f'consecutive steps at iter {status.batches_done}; aborting '
                f'(resume from the last checkpoint with --resume)')


def host_step_counter():
    '''Host-side iteration index for cadence branching (lazy-reg, n_critic,
    ADA intervals — reference `implementations/StyleGAN2/utils.py:71-79`).

    A plain `i = 0` host counter phase-shifts the R1/PL/ADA schedule after
    `--resume` (it restarts at 0 while the restored device step is N). The
    first call reads `state['step']` — one concrete fetch, before the hot
    loop — so the cadence derives from the restored step.

    Returns `next_index(state) -> int`: current index, then advances.
    '''
    box = {'i': None}

    def next_index(state) -> int:
        if box['i'] is None:
            box['i'] = int(state['step']) if 'step' in state else 0
        i = box['i']
        box['i'] += 1
        return i

    return next_index


def default_max_iters(args, loader) -> int:
    '''reference: max_iters < 0 -> epochs * len(loader).'''
    if args.max_iters is not None and args.max_iters >= 0:
        return args.max_iters
    return len(loader) * args.default_epochs


def run_training(
    name: str,
    args,
    accel,
    state,
    loader,
    train_step: Callable,          # jitted (state, batch) -> (state, {metrics})
    sample_fn: Callable | None,    # (state) -> NHWC images for the const grid
    max_iters: int,
    save_interval: int,
    ema_params_path: Callable | None = None,  # state -> params-for-artifact
    status: Status | None = None,
    checkpoint_keep: int = 3,
    nrow: int = 4,
    sample_interval: int | None = None,       # sample cadence if != save
):
    out_dir = result_dir(name)
    if status is None:
        status = Status(max_iters, bar=not getattr(args, 'log_file', None),
                        log_file=getattr(args, 'log_file', None),
                        log_interval=getattr(args, 'log_interval', 1))
    ckpt = Checkpointer(os.path.join(out_dir, 'checkpoint'),
                        max_to_keep=checkpoint_keep)

    # ---- resume ----
    resume_dir = getattr(args, 'resume', None)
    if resume_dir:
        rck = Checkpointer(resume_dir)
        template = state
        state, meta = rck.restore(state)
        # Free the init template's DEVICE buffers explicitly. In a fresh run
        # the first step's donation consumes them, but on resume the restored
        # (host) tree replaces the template while the caller's frame still
        # references the device arrays — without this, a full params+opt+EMA
        # copy stays resident for the whole run (measured: OOMs the b96
        # StyleGAN2-ADA soak on resume where the fresh run fits).
        for leaf in jax.tree_util.tree_leaves(template):
            if isinstance(leaf, jax.Array):
                leaf.delete()
        del template
        if meta.get('status'):
            status.load_state_dict(meta['status'])
        status.print(f'[resume] from {resume_dir} @ step {status.batches_done}')
    state = accel.prepare(state)

    sample_interval_ = sample_interval or save_interval

    def save_snapshot(state, do_sample=True):
        step = status.batches_done
        # replica-drift detection at checkpoint cadence (the reference's
        # check_ddp_consistency intent, thirdparty/stylegan2_ops/misc.py:175
        # — vendored-and-dormant there, actually wired here): replicated
        # leaves must be bit-identical across devices or the run has silently
        # forked. Skipped on single-device meshes (nothing to compare).
        if accel.num_devices > 1:
            from animeface_tpu.parallel import assert_replica_consistency
            assert_replica_consistency(state, name=name)
        # params-level failure detection: recipes that sanitize logged losses
        # (nan_to_num, reference behavior) can still diverge silently — probe
        # one weight leaf per top-level state entry at checkpoint cadence.
        for key_name, sub in state.items():
            leaves = jax.tree_util.tree_leaves(sub)
            if leaves and hasattr(leaves[0], 'dtype') and \
                    jnp.issubdtype(leaves[0].dtype, jnp.floating):
                if not bool(jnp.all(jnp.isfinite(leaves[0]))):
                    raise FloatingPointError(
                        f'[{name}] non-finite values in state[{key_name!r}] '
                        f'at iter {step}; aborting')
        if sample_fn is not None and do_sample:
            images = np.asarray(sample_fn(state))
            save_image(images, os.path.join(out_dir, f'{step}.png'), nrow=nrow)
            save_image(images, os.path.join(out_dir, 'running.jpg'), nrow=nrow)
        if ema_params_path is not None:
            save_model(os.path.join(out_dir, f'G_{step}.msgpack'),
                       ema_params_path(state))
        ckpt.save(step, state, meta={'status': status.state_dict(),
                                     'args': {k: str(v) for k, v in vars(args).items()}})

    # ---- loop ----
    if len(loader) == 0:
        raise ValueError(
            f'[{name}] empty loader: the dataset has fewer samples than one '
            f'batch (dataset filters like --min-year can cause this)')
    # failure detection (SURVEY §5: new capability, not a port): abort when
    # every loss has been non-finite for a sustained stretch instead of
    # silently training on garbage. Checked on the logging cadence so the
    # deferred device->host sync stays off the step path.
    guard_every = max(int(getattr(args, 'log_interval', 1) or 1), 10)

    def _check_finite():
        check_sustained_nan(status, name)

    done = False
    while not done:
        for batch in accel.iter_loader(loader):
            state, metrics = train_step(state, batch)
            # Update BEFORE the cadence branches so (a) the snapshot's Status
            # history includes the checkpointed batch (it matches the state's
            # device step exactly) and (b) the save branch cannot re-fire at
            # the same batches_done label on the first post-resume step,
            # overwriting a checkpoint with one-step-ahead params under the
            # same name (round-4 advisor finding).
            status.update(**{k: v for k, v in metrics.items()})
            if status.batches_done % save_interval == 0 and status.batches_done > 0:
                save_snapshot(state, do_sample=(
                    sample_interval is None
                    or status.batches_done % sample_interval_ == 0))
            elif sample_interval is not None and status.batches_done > 0 \
                    and status.batches_done % sample_interval_ == 0 \
                    and sample_fn is not None:
                images = np.asarray(sample_fn(state))
                save_image(images, os.path.join(
                    out_dir, f'{status.batches_done}.png'), nrow=nrow)
            if status.batches_done % guard_every == 0:
                _check_finite()
            if status.batches_done >= max_iters:
                done = True
                break

    save_snapshot(state)
    status.plot_loss(os.path.join(out_dir, 'loss'))
    return state, status
