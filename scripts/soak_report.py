'''Assemble committed evidence from a SOAK run (scripts/soak.py).

Reads the latest checkpoint meta (full Status loss/p history), renders the
loss + ADA-p trajectory plot, copies the first/mid/last sample grids, and
writes docs/soak_r3/SOAK.md summarizing stability (finite losses, p ramp,
resume seam). Run after the soak (and after the kill+--resume second half):

    python scripts/soak_report.py [result_dir] [--resume-step N]
'''

from __future__ import annotations

import json
import os
import shutil
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    resume_steps = [int(sys.argv[i + 1]) for i, a in enumerate(sys.argv)
                    if a == '--resume-step']
    skip = {i + 1 for i, a in enumerate(sys.argv) if a == '--resume-step'}
    args = [a for i, a in enumerate(sys.argv) if i > 0 and i not in skip
            and not a.startswith('--')]
    result = args[0] if args else os.path.join(
        REPO, 'animeface_tpu', 'implementations', 'SOAK', 'result')

    ckpt_dir = os.path.join(result, 'checkpoint')
    names = [n for n in os.listdir(ckpt_dir)
             if n.startswith('ckpt-') and n.split('-')[1].isdigit()]
    latest = sorted(names, key=lambda n: int(n.split('-')[1]))[-1]
    with open(os.path.join(ckpt_dir, latest, 'meta.json')) as f:
        meta = json.load(f)
    hist = meta['status']['loss']
    step = meta['status'].get('batches_done', 0)

    out = os.path.join(REPO, 'docs', 'soak_r3')
    os.makedirs(out, exist_ok=True)

    import matplotlib
    matplotlib.use('Agg')
    import matplotlib.pyplot as plt
    import numpy as np

    fig, axes = plt.subplots(2, 1, figsize=(9, 6), sharex=True)
    for key in ('D', 'G', 'd', 'g'):
        if key in hist:
            v = np.asarray(hist[key], np.float64)
            axes[0].plot(np.arange(1, len(v) + 1), v, label=key, lw=0.6)
    axes[0].legend(); axes[0].set_ylabel('loss'); axes[0].grid(alpha=0.3)
    pkey = next((k for k in hist if k.lower() == 'p'), None)
    if pkey:
        v = np.asarray(hist[pkey], np.float64)
        axes[1].plot(np.arange(1, len(v) + 1), v, color='tab:green', lw=0.8)
    axes[1].set_ylabel('ADA p'); axes[1].set_xlabel('step')
    axes[1].grid(alpha=0.3)
    for resume_step in resume_steps:
        for ax in axes:
            ax.axvline(resume_step, color='red', ls='--', lw=0.8)
        axes[0].text(resume_step, axes[0].get_ylim()[1], ' kill+resume',
                     color='red', va='top', fontsize=8)
    fig.tight_layout()
    fig.savefig(os.path.join(out, 'soak_curves.png'), dpi=110)

    grids = sorted((f for f in os.listdir(result)
                    if f.endswith('.png') and f[:-4].isdigit()),
                   key=lambda f: int(f[:-4]))
    picks = [grids[0], grids[len(grids) // 2], grids[-1]] if grids else []
    for g in picks:
        shutil.copy(os.path.join(result, g), os.path.join(out, f'grid_{g}'))

    finite = {k: bool(np.isfinite(np.asarray(v, np.float64)).all())
              for k, v in hist.items()}
    p_final = float(hist[pkey][-1]) if pkey else None
    with open(os.path.join(out, 'SOAK.md'), 'w') as f:
        f.write(f'''# Sustained-training soak (round 3)

StyleGAN2-ADA 256px (the bench workload) through `run_training` on one
v5e chip via `scripts/soak.py`: AugmentPipe on-device, LIVE adaptive-p
controller, lazy reg R1@16/PL@8, checkpoints every --save iters, killed
mid-run and resumed with `--resume` (red line in the plot).

* steps completed: **{step}**
* all logged series finite: **{finite}**
* final ADA p: **{p_final}**
* resume seams at steps: **{resume_steps}**

![curves](soak_curves.png)

Sample grids (first / middle / last): {", ".join(picks)}
''')
    print(f'wrote {out}: steps={step} finite={finite} p={p_final}')


if __name__ == '__main__':
    main()
