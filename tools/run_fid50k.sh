#!/bin/bash
# FID-50k runbook: from the four pretrained artifact files straight to the
# BASELINE quality-gate number, zero further decisions (round-4 verdict
# item 8; artifact contract: ARTIFACTS_NEEDED.md / reference weights.md:1-40).
#
# Real run (artifact_dir holds the files named in ARTIFACTS_NEEDED.md):
#   tools/run_fid50k.sh /path/to/artifacts [--data-root DIR] [extra fid_cli args]
#
# Dry run (no artifacts; fabricates synthetic stand-ins and exercises the
# EXACT same converter -> env -> fid_cli path on tiny sample counts):
#   tools/run_fid50k.sh --dry-run
#
# Steps, all idempotent:
#   1. convert pt_inception-2015-12-05.pth -> inception_fid.npz
#      (tools/convert_inception_weights.py), export ANIMEFACE_INCEPTION_WEIGHTS
#   2. convert StyleGAN2_animeface_128pix.pt -> G_animeface_128.msgpack
#      (tools/convert_stylegan2_weights.py), run the published-checkpoint
#      golden-parity test (tests/test_stylegan2_convert.py)
#   3. export ANIMEFACE_VGG_WEIGHTS if a vgg16/vgg19 .pth is present
#   4. python -m animeface_tpu.metrics.fid_cli at the published checkpoint's
#      config (128px, style_dim 512, channels 32/512) -> FID-50k + KID
set -euo pipefail
cd "$(dirname "$0")/.."
export PYTHONPATH="$PWD${PYTHONPATH:+:$PYTHONPATH}"

NUM_SAMPLES=50000
BATCH=64
EXTRA=()

if [[ "${1:-}" == "--dry-run" ]]; then
    ART=/tmp/fid50k_dryrun
    mkdir -p "$ART"
    NUM_SAMPLES=256
    BATCH=32
    EXTRA+=(--synthetic-data --image-size 32 --style-dim 16
            --channels 8 --max-channels 32 --map-num-layers 2)
    echo "[run_fid50k] DRY RUN: fabricating synthetic artifacts in $ART"
    python - "$ART" <<'EOF'
import sys, os
art = sys.argv[1]
sys.path.insert(0, os.getcwd())
sys.path.insert(0, os.path.join(os.getcwd(), 'tests'))
import numpy as np, torch

# synthetic pytorch-fid InceptionV3 checkpoint (random init, exact key schema)
pth = os.path.join(art, 'pt_inception-2015-12-05.pth')
if not os.path.exists(pth):
    import jax, jax.numpy as jnp
    jax.config.update('jax_platforms', 'cpu')
    from animeface_tpu.metrics.inception import InceptionV3Features
    from test_metrics import _invert_params_to_torch_keys
    variables = InceptionV3Features().init(
        jax.random.PRNGKey(0), jnp.zeros((1, 75, 75, 3)))
    sd = {k: torch.from_numpy(np.ascontiguousarray(v)) for k, v in
          _invert_params_to_torch_keys(variables).items()}
    torch.save(sd, pth)
    print(f'  wrote {pth}')

# synthetic "published" StyleGAN2 checkpoint (small config, random init,
# via the reference torch model as in tests/test_stylegan2_convert.py)
pt = os.path.join(art, 'StyleGAN2_animeface_128pix.pt')
if not os.path.exists(pt):
    import importlib.util
    spec = importlib.util.spec_from_file_location(
        'ref_sg2_model', '/root/reference/implementations/StyleGAN2/model.py')
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    torch.manual_seed(0)
    g = mod.Generator(image_size=32, style_dim=16, channels=8,
                      max_channels=32, block_num_conv=2, map_num_layers=2,
                      map_lr=0.01)
    for p in g.parameters():
        p.data.normal_(0, 1.0)
    torch.save(g.state_dict(), pt)
    print(f'  wrote {pt}')
EOF
    shift || true
else
    ART="${1:?usage: tools/run_fid50k.sh <artifact_dir>|--dry-run [extra args]}"
    shift
fi
EXTRA+=("$@")

INCEPTION_PTH="$ART/pt_inception-2015-12-05.pth"
SG2_PT="$ART/StyleGAN2_animeface_128pix.pt"
[[ -f "$INCEPTION_PTH" ]] || { echo "missing $INCEPTION_PTH (ARTIFACTS_NEEDED.md #1)"; exit 2; }
[[ -f "$SG2_PT"        ]] || { echo "missing $SG2_PT (ARTIFACTS_NEEDED.md #4)"; exit 2; }

# 1. InceptionV3 weights
NPZ="$ART/inception_fid.npz"
[[ -f "$NPZ" ]] || python tools/convert_inception_weights.py "$INCEPTION_PTH" "$NPZ"
export ANIMEFACE_INCEPTION_WEIGHTS="$NPZ"

# 2. StyleGAN2 G weights + golden parity
MSGPACK="$ART/G_animeface_128.msgpack"
[[ -f "$MSGPACK" ]] || python tools/convert_stylegan2_weights.py "$SG2_PT" "$MSGPACK"
if [[ "$ART" != /tmp/fid50k_dryrun ]]; then
    echo "[run_fid50k] golden parity vs the published checkpoint:"
    ANIMEFACE_SG2_WEIGHTS="$SG2_PT" python -m pytest \
        tests/test_stylegan2_convert.py::test_published_checkpoint_golden -q
fi

# 3. VGG perceptual weights (informational here; activates 6 recipes' losses)
for v in "$ART"/vgg16-*.pth "$ART"/vgg19-*.pth; do
    [[ -f "$v" ]] && export ANIMEFACE_VGG_WEIGHTS="$v" \
        && echo "[run_fid50k] ANIMEFACE_VGG_WEIGHTS=$v"
done

# 4. the gate number (BASELINE.md: FID-50k on the animeface dataset)
echo "[run_fid50k] computing FID-${NUM_SAMPLES} + KID ..."
python -m animeface_tpu.metrics.fid_cli \
    --model StyleGAN2 --weights "$MSGPACK" --dataset animeface \
    --num-samples "$NUM_SAMPLES" --batch-size "$BATCH" --kid "${EXTRA[@]}"
echo "[run_fid50k] done — compare FID against the reference checkpoint's own"
echo "[run_fid50k] FID under pytorch-fid on the same data (BASELINE gate: within 2%)."
