'''End-to-end smoke tests: N steps of each implementation via the CLI contract
(`main(parser)`) on synthetic data, asserting finite losses + produced
artifacts. Mirrors the reference's smoke-by-running strategy (SURVEY.md §4)
but automated.
'''

import json
import os
import sys

import numpy as np
import pytest

from animeface_tpu.utils import argument


def run_impl(name, tmp_path, extra_args=(), iters=4, image_size=32, batch=8):
    '''Invoke implementations.<name>.main(parser) exactly like main.py does.'''
    from importlib import import_module
    argv = ['main.py', name,
            '--synthetic-data', '--num-images', '64',
            '--image-size', str(image_size), '--batch-size', str(batch),
            '--max-iters', str(iters), '--save', str(max(iters // 2, 1)),
            '--no-bf16',  # f32 on CPU test backend
            *extra_args]
    old_argv, old_impl_dir = sys.argv, argument.IMPLEMENTATIONS_DIR
    argument.IMPLEMENTATIONS_DIR = str(tmp_path)
    sys.argv = argv
    try:
        parser = argument.get_default_parser()
        module = import_module(f'animeface_tpu.implementations.{name}')
        module.main(parser)
    finally:
        sys.argv = old_argv
        argument.IMPLEMENTATIONS_DIR = old_impl_dir
    return os.path.join(str(tmp_path), name, 'result')


def check_artifacts(result_dir, iters=4, expect_samples=True):
    files = os.listdir(result_dir)
    assert any(f.startswith('args-') for f in files), files
    assert 'loss.png' in files, files
    if expect_samples:
        assert f'{iters}.png' in files, files
    assert 'checkpoint' in files, files
    # losses recorded in the checkpoint meta must be finite
    ckpts = os.listdir(os.path.join(result_dir, 'checkpoint'))
    latest = sorted(ckpts, key=lambda n: int(n.split('-')[1]))[-1]
    with open(os.path.join(result_dir, 'checkpoint', latest, 'meta.json')) as f:
        meta = json.load(f)
    for key, values in (meta['status']['loss'] or {}).items():
        assert all(np.isfinite(v) for v in values), (key, values)


@pytest.mark.slow
def test_gan_end_to_end(tmp_path):
    out = run_impl('GAN', tmp_path)
    check_artifacts(out)


@pytest.mark.slow
def test_dcgan_end_to_end(tmp_path):
    out = run_impl('DCGAN', tmp_path)
    check_artifacts(out)


@pytest.mark.slow
def test_gan_resume(tmp_path):
    out = run_impl('GAN', tmp_path, iters=4)
    ckpt_dir = os.path.join(out, 'checkpoint')
    out2 = run_impl('GAN', tmp_path, iters=6,
                    extra_args=('--resume', ckpt_dir))
    check_artifacts(out2, iters=6)


@pytest.mark.slow
def test_wgan_end_to_end(tmp_path):
    out = run_impl('WGAN', tmp_path, iters=6,
                   extra_args=('--n-critic', '3'))
    check_artifacts(out, iters=6)


@pytest.mark.slow
def test_wgan_gp_end_to_end(tmp_path):
    out = run_impl('WGAN_gp', tmp_path, iters=4,
                   extra_args=('--n-critic', '2'))
    check_artifacts(out)


@pytest.mark.slow
def test_cgan_end_to_end(tmp_path):
    out = run_impl('cGAN', tmp_path)
    check_artifacts(out)


@pytest.mark.slow
def test_acgan_end_to_end(tmp_path):
    out = run_impl('ACGAN', tmp_path)
    check_artifacts(out)


@pytest.mark.slow
def test_stylegan2_end_to_end(tmp_path):
    # 17+ iters so both lazy-regularization branches (d_k=16, g_k=8) compile+run
    out = run_impl('StyleGAN2', tmp_path, iters=18, image_size=32, batch=8,
                   extra_args=('--pl-lambda', '2.0', '--d-k', '16',
                               '--g-k', '8', '--channels', '8',
                               '--max-channels', '64', '--style-dim', '32',
                               '--map-num-layers', '2'))
    check_artifacts(out, iters=18)


@pytest.mark.slow
def test_fastgan_end_to_end(tmp_path):
    # image_size 64: D init_down_size/decoder sizes are clamped to fit
    out = run_impl('FastGAN', tmp_path, iters=4, image_size=64, batch=8,
                   extra_args=('--g-channels', '8', '--g-max-channels', '32',
                               '--d-channels', '8', '--d-max-channels', '32',
                               '--latent-dim', '32', '--ema'))
    check_artifacts(out)


@pytest.mark.slow
def test_ae_end_to_end(tmp_path):
    out = run_impl('AE', tmp_path, iters=4, image_size=32, batch=8,
                   extra_args=('--channels', '8', '--enc-dim', '16'))
    check_artifacts(out)


@pytest.mark.slow
def test_vae_end_to_end(tmp_path):
    out = run_impl('VAE', tmp_path, iters=4, image_size=32, batch=8,
                   extra_args=('--channels', '8', '--max-channels', '32',
                               '--z-dim', '16'))
    check_artifacts(out)


@pytest.mark.slow
def test_ddpm_end_to_end(tmp_path):
    out = run_impl('DDPM', tmp_path, iters=4, image_size=16, batch=8,
                   extra_args=('--channels', '8', '--bottom', '4',
                               '--timesteps', '20', '--attn-resls', '8',
                               '--num-test', '4', '--time-affine',
                               '--dropout', '0.1'))
    check_artifacts(out)


def _sg3_args(image_size=32):
    return ('--num-layers', '4', '--channels', '8', '--max-channels', '32',
            '--style-dim', '32', '--latent-dim', '32', '--d-channels', '8',
            '--d-max-channels', '32', '--gp-every', '2')


@pytest.mark.slow
def test_stylegan3_end_to_end(tmp_path):
    out = run_impl('StyleGAN3', tmp_path, iters=4, image_size=32, batch=8,
                   extra_args=_sg3_args())
    check_artifacts(out)


@pytest.mark.slow
def test_ada_end_to_end(tmp_path):
    out = run_impl('ADA', tmp_path, iters=4, image_size=32, batch=8,
                   extra_args=_sg3_args() + ('--ada-interval', '2',
                                             '--ada-target-kimg', '1'))
    check_artifacts(out)


@pytest.mark.slow
def test_apa_end_to_end(tmp_path):
    out = run_impl('APA', tmp_path, iters=4, image_size=32, batch=8,
                   extra_args=_sg3_args() + ('--apa-interval', '2',
                                             '--apa-target-kimg', '1'))
    check_artifacts(out)


@pytest.mark.slow
def test_srgan_end_to_end(tmp_path):
    out = run_impl('SRGAN', tmp_path, iters=4, image_size=32, batch=8,
                   extra_args=('--g-channels', '8', '--d-channels', '8',
                               '--num-blocks', '2', '--num-layers', '2',
                               '--num-test', '2'))
    check_artifacts(out)


@pytest.mark.slow
def test_esrgan_end_to_end(tmp_path):
    out = run_impl('ESRGAN', tmp_path, iters=4, image_size=32, batch=8,
                   extra_args=('--g-channels', '8', '--d-channels', '8',
                               '--hidden-channels', '4', '--num-blocks', '2',
                               '--num-rd', '2', '--num-conv', '3',
                               '--num-layers', '2', '--num-test', '2'))
    check_artifacts(out)


@pytest.mark.slow
def test_pix2pix_end_to_end(tmp_path):
    out = run_impl('pix2pix', tmp_path, iters=4, image_size=32, batch=8,
                   extra_args=('--num-test', '2',))
    check_artifacts(out)


@pytest.mark.slow
def test_cyclegan_end_to_end(tmp_path):
    out = run_impl('CycleGAN', tmp_path, iters=4, image_size=32, batch=8,
                   extra_args=('--channels', '8', '--max-channels', '16',
                               '--downsample-to', '16', '--num-blocks', '2',
                               '--test-images', '2'))
    check_artifacts(out)


@pytest.mark.slow
def test_biggan_end_to_end(tmp_path):
    out = run_impl('BigGAN', tmp_path, iters=4, image_size=32, batch=8,
                   extra_args=('--channels', '8', '--z-dim', '16'))
    check_artifacts(out)


@pytest.mark.slow
def test_biggan_deep_end_to_end(tmp_path):
    '''--deep (GBlockDeep/DBlockDeep ladders, ref model.py:123,211,376,482)
    with EMA enabled, exercising the deep input conv + channel-drop/concat
    skips.'''
    out = run_impl('BigGAN', tmp_path, iters=4, image_size=32, batch=8,
                   extra_args=('--channels', '8', '--z-dim', '16', '--deep',
                               '--ema'))
    check_artifacts(out)


def test_biggan_arch_tables_match_reference():
    '''The generated ladders reproduce the reference's published tables
    verbatim (GEN_ARCH :353, GEN_ARCH_DEEP :376, DIS_ARCH :458,
    DIS_ARCH_DEEP :482).'''
    from animeface_tpu.implementations.BigGAN.model import _arch

    gen, dis = _arch(128, deep=False)
    assert gen['inm'] == [16, 16, 8, 4, 2] and gen['out'] == [16, 8, 4, 2, 1]
    assert gen['resl'] == [8, 16, 32, 64, 128] and gen['att'] == 64
    assert dis['out'] == [2, 4, 8, 16, 16, 16]
    assert dis['down'] == [True] * 5 + [False]
    assert dis['resl'] == [64, 32, 16, 8, 4, 4] and dis['att'] == 64

    gen, dis = _arch(128, deep=True)
    assert gen['inm'] == [16, 16, 16, 16, 8, 8, 4, 4, 2, 2]
    assert gen['out'] == [16, 16, 16, 8, 8, 4, 4, 2, 2, 1]
    assert gen['up'] == [False, True] * 5
    assert gen['resl'] == [4, 8, 8, 16, 16, 32, 32, 64, 64, 128]
    assert dis['out'] == [1, 2, 2, 4, 4, 8, 8, 16, 16, 16, 16]
    assert dis['down'] == [False, True] * 5 + [False]
    assert dis['resl'] == [128, 64, 64, 32, 32, 16, 16, 8, 8, 4, 4]
    assert dis['input_conv']

    gen, dis = _arch(256, deep=True)
    assert gen['inm'] == [16, 16, 16, 16, 8, 8, 8, 8, 4, 4, 2, 2]
    assert gen['out'] == [16, 16, 16, 8, 8, 8, 8, 4, 4, 2, 2, 1]
    assert dis['out'] == [1, 2, 2, 4, 4, 8, 8, 8, 8, 16, 16, 16, 16]

    gen, dis = _arch(512, deep=True)
    assert gen['out'] == [16, 16, 16, 8, 8, 8, 8, 4, 4, 2, 2, 1, 1, 1]
    assert dis['out'] == [1, 1, 1, 2, 2, 4, 4, 8, 8, 8, 8, 16, 16, 16, 16]


@pytest.mark.slow
def test_pggan_end_to_end(tmp_path):
    # image_size 8 -> one growth cycle: 4px stab then 8px trans/stab phases
    out = run_impl('PGGAN', tmp_path, iters=0, image_size=8, batch=8,
                   extra_args=('--latent-dim', '16',))
    files = os.listdir(out)
    assert 'final.png' in files and 'G_final.msgpack' in files
    assert 'loss.png' in files


@pytest.mark.slow
@pytest.mark.parametrize('model,kill_at', [
    # PGGAN: 4px stab = 2 steps, so ckpt-3 lands inside the 8px
    # G_transition (alpha ramp in progress, after the growth re-trace)
    ('PGGAN', 3),
    # PGGAN at the GROWTH BOUNDARY: ckpt-2 is the 4->8px boundary snapshot
    # (opt_fresh=True — resume must re-init the optimizers exactly like the
    # fresh path does at a resolution change; restoring the 4px Adam
    # moments diverged, caught by the r4 soak)
    ('PGGAN', 2),
    # StyleGAN: resl2num[4]=2 -> 4px = 4 steps; ckpt-6 lands mid
    # 8px G_transition
    ('StyleGAN', 6),
])
def test_progressive_kill_resume(tmp_path, model, kill_at):
    '''Hard-kill a progressive-growing recipe mid-G_transition (alpha ramp
    in progress, after a growth re-trace) and --resume: final weights must
    be bitwise identical to an uninterrupted run. The snapshot carries the
    phase machine, per-resolution optimizer states, the alpha ramp, and the
    mid-phase batch index (new capability vs the reference, SURVEY §3.3/§5).
    '''
    import subprocess
    from flax.serialization import msgpack_restore

    script = (
        "import sys; sys.path.insert(0, {repo!r})\n"
        "import jax; jax.config.update('jax_platforms', 'cpu')\n"
        "jax.config.update('jax_compilation_cache_dir',"
        " '/tmp/animeface_jax_cache_cpu')\n"
        "from animeface_tpu.utils import argument\n"
        "argument.IMPLEMENTATIONS_DIR = sys.argv.pop(1)\n"
        "from importlib import import_module\n"
        "import_module('animeface_tpu.implementations.{model}')"
        ".main(argument.get_default_parser())\n"
    ).format(repo=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
             model=model)
    common = [model, '--synthetic-data', '--num-images', '64',
              '--image-size', '8', '--batch-size', '8', '--latent-dim', '16',
              '--save', '3', '--no-bf16', '--max-iters', '0']

    def run(out_root, extra=(), kill_at_ckpt=None, timeout=600):
        proc = subprocess.Popen(
            [sys.executable, '-c', script, str(out_root), *common, *extra],
            stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL)
        ckpt_dir = os.path.join(str(out_root), model, 'result', 'checkpoint')
        import time
        t0 = time.time()
        while proc.poll() is None and time.time() - t0 < timeout:
            if kill_at_ckpt and os.path.isdir(
                    os.path.join(ckpt_dir, f'ckpt-{kill_at_ckpt}')):
                proc.kill()   # SIGKILL: no atexit, no flush
                proc.wait()
                return 'killed'
            time.sleep(0.2)
        assert proc.wait() == 0
        return 'done'

    base_root = tmp_path / 'base'
    kill_root = tmp_path / 'kill'
    assert run(base_root) == 'done'
    assert run(kill_root, kill_at_ckpt=kill_at) == 'killed'
    assert run(kill_root, extra=(
        '--resume', os.path.join(str(kill_root), model, 'result',
                                 'checkpoint'))) == 'done'

    def final(root):
        path = os.path.join(str(root), model, 'result', 'G_final.msgpack')
        with open(path, 'rb') as f:
            return msgpack_restore(f.read())
    import jax
    a = jax.tree_util.tree_leaves(final(base_root))
    b = jax.tree_util.tree_leaves(final(kill_root))
    assert len(a) == len(b)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


@pytest.mark.slow
def test_fourierfeatures_end_to_end(tmp_path):
    out = run_impl('FourierFeatures', tmp_path, iters=8, image_size=16,
                   extra_args=('--map-size', '32',))
    files = os.listdir(out)
    assert 'model.msgpack' in files and 'loss.png' in files


@pytest.mark.slow
def test_pixelshuffle_end_to_end(tmp_path):
    out = run_impl('pixelshuffle', tmp_path, iters=4, image_size=32, batch=8,
                   extra_args=('--latent-dim', '16',))
    check_artifacts(out)


@pytest.mark.slow
def test_eigengan_end_to_end(tmp_path):
    out = run_impl('EigenGAN', tmp_path, iters=4, image_size=32, batch=8,
                   extra_args=('--eps-dim', '32', '--latent-dim', '4',
                               '--g-channels', '8', '--d-channels', '8',
                               '--g-max-channels', '32',
                               '--d-max-channels', '32', '--ema',
                               '--gp-lambda', '10.', '--num-test', '8'))
    check_artifacts(out)


@pytest.mark.slow
def test_transgan_end_to_end(tmp_path):
    out = run_impl('TransGAN', tmp_path, iters=4, image_size=16, batch=8,
                   extra_args=('--latent-dim', '16', '--g-embed-dim', '64',
                               '--d-embed-dim', '64',
                               '--g-depths', '1', '1', '--bottom-width', '8',
                               '--d-depth', '1', '--patch-size', '4',
                               '--ema', '--ttur', '--gp-every', '2'))
    check_artifacts(out)


@pytest.mark.slow
def test_convnext_end_to_end(tmp_path):
    out = run_impl('ConvNeXt', tmp_path, iters=4, image_size=32, batch=8,
                   extra_args=('--latent-dim', '16', '--channels', '8',
                               '--blocks-per-scale', '1',
                               '--d-depths', '1', '1', '1', '1',
                               '--d-dims', '8', '16', '32', '64'))
    check_artifacts(out)


@pytest.mark.slow
def test_van_end_to_end(tmp_path):
    out = run_impl('VAN', tmp_path, iters=4, image_size=32, batch=8,
                   extra_args=('--latent-dim', '16', '--channels', '8',
                               '--blocks-per-scale', '1',
                               '--layers', '1', '1', '1', '1'))
    check_artifacts(out)


def _sg2_small():
    return ('--channels', '8', '--max-channels', '32', '--style-dim', '32',
            '--map-num-layers', '2')


@pytest.mark.slow
def test_adabelief_end_to_end(tmp_path):
    out = run_impl('AdaBelief', tmp_path, iters=4, image_size=32, batch=8,
                   extra_args=_sg2_small())
    check_artifacts(out)


@pytest.mark.slow
def test_edge_end_to_end(tmp_path):
    out = run_impl('edge', tmp_path, iters=4, image_size=32, batch=8,
                   extra_args=_sg2_small() + ('--d-k', '2',
                                              '--wait-edge-epoch', '1'))
    check_artifacts(out)


@pytest.mark.slow
def test_cips_end_to_end(tmp_path):
    out = run_impl('CIPS', tmp_path, iters=4, image_size=16, batch=8,
                   extra_args=('--latent-dim', '16', '--style-dim', '16',
                               '--num-layers', '2', '--g-channels', '4',
                               '--g-max-channels', '16',
                               '--map-num-layers', '1',
                               '--d-channels', '8', '--d-max-channels', '16',
                               '--gp-every', '2', '--num-test', '8'))
    check_artifacts(out)


@pytest.mark.slow
def test_hit_end_to_end(tmp_path):
    out = run_impl('HiT', tmp_path, iters=4, image_size=32, batch=8,
                   extra_args=('--latent-dim', '16',
                               '--dims', '32', '32', '16',
                               '--bottom', '8', '--low-stages', '1',
                               '--num-heads', '4', '4', '4',
                               '--num-blocks', '1', '1', '1',
                               '--patch-sizes', '4',
                               '--channels', '8', '--ema',
                               '--init-func', 'xavier',
                               '--gp-lambda', '10', '--gp-every', '2'))
    check_artifacts(out)


@pytest.mark.slow
def test_pix2pixhd_end_to_end(tmp_path):
    common = ('--channels', '8', '--d-num-scale', '2', '--g-d-scale', '2',
              '--l-d-scale', '2', '--global-num-downs', '2',
              '--global-num-blocks', '1', '--local-num-blocks', '1',
              '--fine-from', '0', '--num-test', '2')
    # first invocation: global phase at half res; writes global_final.msgpack
    out = run_impl('pix2pixHD', tmp_path, iters=4, image_size=64, batch=8,
                   extra_args=common)
    check_artifacts(out)
    assert 'global_final.msgpack' in os.listdir(out)
    # second invocation: local phase resumes from the global checkpoint
    out = run_impl('pix2pixHD', tmp_path, iters=4, image_size=64, batch=8,
                   extra_args=common)
    check_artifacts(out)
    # degenerate scales produce empty logits -> NaN (masked to 0); assert real
    with open(os.path.join(out, 'checkpoint',
                           sorted(os.listdir(os.path.join(out, 'checkpoint')))[-1],
                           'meta.json')) as f:
        meta = json.load(f)
    assert any(v != 0 for v in meta['status']['loss']['d'])


@pytest.mark.slow
def test_spade_end_to_end(tmp_path):
    out = run_impl('SPADE', tmp_path, iters=4, image_size=64, batch=8,
                   extra_args=('--channels', '8', '--max-channels', '32',
                               '--spade-hidden-channels', '16',
                               '--z-dim', '16', '--ttur',
                               '--test-images', '2'))
    check_artifacts(out)


@pytest.mark.slow
def test_stylegan1_end_to_end(tmp_path):
    out = run_impl('StyleGAN', tmp_path, iters=0, image_size=8, batch=8,
                   extra_args=('--latent-dim', '32',))
    files = os.listdir(out)
    assert 'final.png' in files and 'G_final.msgpack' in files


@pytest.mark.slow
def test_singan_end_to_end(tmp_path):
    out = run_impl('SinGAN', tmp_path, iters=2, image_size=32, batch=1,
                   extra_args=('--max-size', '32', '--min-size', '16',
                               '--scale-factor', '0.6', '--channels', '8',
                               '--num-layers', '3'))
    files = os.listdir(out)
    assert 'G_final.msgpack' in files and 'loss.png' in files
    assert any(f.startswith('scale_') for f in files)


@pytest.mark.slow
def test_contrad_end_to_end(tmp_path):
    out = run_impl('ContraD', tmp_path, iters=4, image_size=32, batch=8,
                   extra_args=_sg2_small() + ('--projection-features', '16',
                                              '--hidden-features', '16',
                                              '--augmentation', 'simclr'))
    check_artifacts(out)


@pytest.mark.slow
def test_hologan_end_to_end(tmp_path):
    out = run_impl('HoloGAN', tmp_path, iters=4, image_size=32, batch=8,
                   extra_args=('--g-channels', '16', '--latent-dim', '8',
                               '--d-channels', '4', '--eval-size', '4'))
    check_artifacts(out)


@pytest.mark.slow
def test_ugatit_end_to_end(tmp_path):
    out = run_impl('UGATIT', tmp_path, iters=4, image_size=64, batch=8,
                   extra_args=('--g-channels', '8', '--d-channels', '8',
                               '--g-max-channels', '32',
                               '--d-max-channels', '32', '--light',
                               '--resblocks', '1', '--adalinresblocks', '1',
                               '--num-test', '2'))
    check_artifacts(out)


@pytest.mark.slow
def test_ganilla_end_to_end(tmp_path):
    # 64px + num_layers 2: the reference D's VALID k4-s2 stack is sized
    # for 128px; at 64px the default 3 layers collapse the patch grid to 0x0
    out = run_impl('GANILLA', tmp_path, iters=4, image_size=64, batch=8,
                   extra_args=('--g-channels', '4', '--hid-channels', '8',
                               '--num-feats', '1', '--d-channels', '8',
                               '--num-test', '2', '--num-layers', '2'))
    check_artifacts(out)


@pytest.mark.slow
def test_anigan_end_to_end(tmp_path):
    out = run_impl('AniGAN', tmp_path, iters=4, image_size=32, batch=8,
                   extra_args=('--g-channels', '8', '--d-channels', '8',
                               '--bottom-width', '8', '--num-test', '2'))
    check_artifacts(out)


@pytest.mark.slow
@pytest.mark.parametrize('norm', ['lin', 'polin'])
def test_normalizations_end_to_end(tmp_path, norm):
    out = run_impl('normalizations', tmp_path, iters=2, image_size=64, batch=8,
                   extra_args=('--channels', '8', '--d-channels', '8',
                               '--style-dim', '16', '--norm-name', norm,
                               '--num-test', '2'))
    check_artifacts(out, iters=2)


@pytest.mark.slow
def test_scft_end_to_end(tmp_path):
    # 64px + num_layers 2: the reference D's VALID k4-s2 stack is sized
    # for 128px; at 64px the default 3 layers collapse the patch grid to 0x0
    out = run_impl('SCFT', tmp_path, iters=2, image_size=64, batch=8,
                   extra_args=('--enc-channels', '4', '--d-channels', '8',
                               '--num-res-blocks', '1', '--num-test', '2',
                               '--num-layers', '2'))
    check_artifacts(out, iters=2)


@pytest.mark.slow
def test_hisd_end_to_end(tmp_path):
    out = run_impl('HiSD', tmp_path, iters=3, image_size=32, batch=8,
                   extra_args=('--style-dim', '16', '--latent-dim', '8',
                               '--channels', '8', '--ex-bottom-width', '8',
                               '--map-mid-dim', '16', '--ret-feat',
                               '--normalize-latent',
                               '--trans-num-blocks', '1'))
    files = os.listdir(out)
    assert 'G_final.msgpack' in files and 'loss.png' in files


@pytest.mark.slow
def test_peingan_end_to_end(tmp_path):
    out = run_impl('PEinGAN', tmp_path, iters=4, image_size=32, batch=8,
                   extra_args=('--g-channels', '8', '--g-max-channels', '32',
                               '--d-channels', '8', '--d-max-channels', '32',
                               '--in-channels', '32', '--latent-dim', '32',
                               '--style-dim', '32', '--map-num-layers', '2',
                               '--embed-dim', '16', '--d-k', '2',
                               '--scales', '1.0', '1.5',
                               '--scale-probs', '0.7', '0.3'))
    check_artifacts(out)


@pytest.mark.slow
def test_edcnn_end_to_end(tmp_path):
    out = run_impl('EDCNN', tmp_path, iters=2, image_size=64, batch=8,
                   extra_args=('--channels', '4', '--style-dim', '16',
                               '--num-res-blocks', '2', '--num-layers', '2',
                               '--se-blocks-per-resl', '1', '--ttur',
                               '--content-lambda', '1.0', '--num-test', '2'))
    check_artifacts(out, iters=2)


@pytest.mark.slow
def test_sebiggan_end_to_end(tmp_path):
    out = run_impl('SEBigGAN', tmp_path, iters=2, image_size=32, batch=8,
                   extra_args=('--channels', '8', '--z-dim', '16'))
    check_artifacts(out, iters=2)


@pytest.mark.slow
def test_diffaugment_impl_end_to_end(tmp_path):
    out = run_impl('DiffAugment', tmp_path, iters=0, image_size=8, batch=8,
                   extra_args=('--latent-dim', '16',))
    files = os.listdir(out)
    assert 'final.png' in files and 'G_final.msgpack' in files


@pytest.mark.slow
def test_nafnet_end_to_end(tmp_path):
    out = run_impl('NAFNet', tmp_path, iters=2, image_size=32, batch=8,
                   extra_args=('--bottom', '8', '--g-channels', '8',
                               '--blocks-per-scale', '1', '--mid-blocks', '1',
                               '--d-channels', '8', '--num-layers', '2',
                               '--num-test', '2'))
    check_artifacts(out, iters=2)


@pytest.mark.slow
def test_restormer_end_to_end(tmp_path):
    out = run_impl('Restormer', tmp_path, iters=2, image_size=32, batch=8,
                   extra_args=('--g-channels', '8',
                               '--num-blocks', '1', '1', '1',
                               '--num-heads', '1', '2', '2',
                               '--num-refinement-blocks', '1',
                               '--skip-input', '--d-channels', '8',
                               '--num-layers', '2', '--num-test', '2'))
    check_artifacts(out, iters=2)
