'''Assemble committed evidence from a PGGAN progressive soak.

Reads the latest checkpoint meta (full Status d/g/alpha history), renders
loss curves + the alpha growth-ramp trace with resolution-phase annotations
and resume seams, folds in the in-box FID trend (`trend.json`, written by
tools/fid_trend.py), copies first/mid/last sample grids, and writes
docs/soak_r4/SOAK.md.

    python scripts/soak_pggan_report.py <result_dir> [--resume-step N]...
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
    result = args[0]

    ckpt_dir = os.path.join(result, 'checkpoint')
    names = [n for n in os.listdir(ckpt_dir)
             if n.startswith('ckpt-') and n.split('-')[1].isdigit()]
    latest = sorted(names, key=lambda n: int(n.split('-')[1]))[-1]
    with open(os.path.join(ckpt_dir, latest, 'meta.json')) as f:
        meta = json.load(f)
    hist = meta['status']['loss']
    step = meta['status'].get('batches_done', 0)

    # per-snapshot sidecars give the resolution timeline for annotations
    import re
    import glob
    resl_points = []
    for p in glob.glob(os.path.join(result, 'G_*.json')):
        m = re.match(r'G_(\d+)\.json$', os.path.basename(p))
        if m:
            with open(p) as f:
                resl_points.append((int(m.group(1)), json.load(f)))
    resl_points.sort()

    trend = None
    trend_path = os.path.join(result, 'trend.json')
    if os.path.exists(trend_path):
        with open(trend_path) as f:
            trend = json.load(f)

    out = os.path.join(REPO, 'docs', 'soak_r4')
    os.makedirs(out, exist_ok=True)

    import matplotlib
    matplotlib.use('Agg')
    import matplotlib.pyplot as plt
    import numpy as np

    n_rows = 3 if trend else 2
    fig, axes = plt.subplots(n_rows, 1, figsize=(9, 3 * n_rows), sharex=True)
    for key in ('d', 'g'):
        if key in hist:
            v = np.asarray(hist[key], np.float64)
            axes[0].plot(np.arange(1, len(v) + 1), v, label=key, lw=0.6)
    axes[0].legend()
    axes[0].set_ylabel('WGAN-gp loss')
    axes[0].grid(alpha=0.3)

    if 'alpha' in hist:
        v = np.asarray(hist['alpha'], np.float64)
        axes[1].plot(np.arange(1, len(v) + 1), v, color='tab:purple', lw=0.8)
    axes[1].set_ylabel('alpha (growth ramp)')
    axes[1].grid(alpha=0.3)

    seen = set()
    for s, m in resl_points:
        r = m.get('resolution')
        if r not in seen:
            seen.add(r)
            axes[1].text(s, 1.02, f'{r}px', fontsize=7, color='tab:blue')

    if trend:
        ts = [r['step'] for r in trend['results']]
        fds = [r['fd'] for r in trend['results']]
        axes[2].plot(ts, fds, 'o-', color='tab:orange', lw=0.9, ms=3)
        axes[2].set_yscale('log')
        axes[2].set_ylabel('random-VGG FD (trend)')
        axes[2].grid(alpha=0.3)

    axes[-1].set_xlabel('step')
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
    first_at = {}
    for s, m in resl_points:
        first_at.setdefault(m.get('resolution'), s)
    resl_line = ' -> '.join(
        f'{r}px@{s}' for r, s in sorted(first_at.items(), key=lambda kv: kv[1]))
    gate = (f'{trend["gate_ok"]} '
            f'({trend["results"][0]["fd"]:.1f} -> '
            f'{trend["results"][-1]["fd"]:.1f})') if trend else 'not run'
    with open(os.path.join(out, 'SOAK.md'), 'w') as f:
        f.write(f'''# Progressive-growing soak (round 4) — PGGAN

Full PGGAN progressive schedule through `main.py PGGAN` (reference
phase machine D_stab -> (G_trans -> G_stab -> D_trans -> D_stab) per
resolution, WGAN-gp + drift, per-resolution optimizers re-initialized at
each growth, staged re-trace per (depth, mode) — SURVEY §3.3's hard part),
with a SIGKILL + `--resume` seam crossing a growth boundary (red line).

* steps completed: **{step}**
* resolution timeline: {resl_line}
* all logged series finite: **{finite}**
* resume seams at steps: **{resume_steps}**
* in-box FID trend gate (random-VGG FD, final < first): **{gate}**

![curves](soak_curves.png)

The alpha trace shows one clean 0 -> 1 ramp per transition phase
(the per-epoch reset bug this soak caught is fixed — see commit
"PGGAN: alpha ramp persists across transition-phase epochs").

Found and fixed by this soak (both committed):

* transition-phase alpha was reset to 0 at the top of EVERY epoch
  (sawtooth) — the reference resets only at grow();
* growth-boundary snapshots carried the PREVIOUS resolution's Adam
  moments and resume restored them, silently diverging from an
  uninterrupted run (which re-initializes optimizers at each resolution
  change). After the `opt_fresh` fix the resumed run replays the
  killed run's post-boundary steps BITWISE (identical logged d/g).

Sample grids (first / middle / last): {", ".join(picks)}
''')
    print(f'wrote {out}: steps={step} finite={finite} gate={gate}')


if __name__ == '__main__':
    main()
