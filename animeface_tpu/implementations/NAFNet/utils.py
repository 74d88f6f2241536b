'''NAFNet recipe (reference `implementations/NAFNet/utils.py`): line-art ->
color restoration with LSGAN on (image ‖ line) + pixel L1.'''

from __future__ import annotations

import jax
import jax.numpy as jnp
import optax

from animeface_tpu.utils import add_args, save_args, make_image_grid
from animeface_tpu.nnutils import KeyGen
from animeface_tpu.nnutils.accelerate import Accelerator
from animeface_tpu.nnutils.loss import LSGANLoss
from animeface_tpu.nnutils.trainer import run_training, default_max_iters
from animeface_tpu.dataset import build_dataset, DataLoader


def build_restoration_step(G, D, g_tx, d_tx, loss, pixel_lambda):
    '''Shared line->image conditional-D step (NAFNet & Restormer).'''

    def train_step(state, batch):
        real, line = batch
        rng = jax.random.split(state['rng'])[0]
        d_in = lambda img: jnp.concatenate([img, line], axis=-1)

        fake = G.apply({'params': state['G']}, line)
        fake_sg = jax.lax.stop_gradient(fake)

        def d_loss_fn(d_params):
            dv = {'params': d_params, 'batch_stats': state['D']['batch_stats']}
            rp, d_mut = D.apply(dv, d_in(real), train=True,
                                mutable=['batch_stats'])
            fp, d_mut = D.apply({'params': d_params, **d_mut}, d_in(fake_sg),
                                train=True, mutable=['batch_stats'])
            return loss.d_loss(rp, fp), d_mut

        (d_loss, d_mut), d_grads = jax.value_and_grad(d_loss_fn, has_aux=True)(
            state['D']['params'])
        d_up, d_opt = d_tx.update(d_grads, state['d_opt'], state['D']['params'])
        d_params = optax.apply_updates(state['D']['params'], d_up)

        def g_loss_fn(g_params):
            fake2 = G.apply({'params': g_params}, line)
            fp, _ = D.apply({'params': d_params, **d_mut}, d_in(fake2),
                            train=True, mutable=['batch_stats'])
            return loss.g_loss(fp) \
                + jnp.mean(jnp.abs(fake2 - real)) * pixel_lambda

        g_loss, g_grads = jax.value_and_grad(g_loss_fn)(state['G'])
        g_up, g_opt = g_tx.update(g_grads, state['g_opt'], state['G'])
        g_params = optax.apply_updates(state['G'], g_up)

        return dict(rng=rng, G=g_params, D={'params': d_params, **d_mut},
                    g_opt=g_opt, d_opt=d_opt, step=state['step'] + 1), \
            dict(G=jnp.nan_to_num(g_loss), D=jnp.nan_to_num(d_loss))

    return train_step


def run_restoration(name, args, G, D, loader, test_batch, max_iters):
    accel = Accelerator(mesh_shape=tuple(args.mesh), bf16=not args.no_bf16)
    keys = KeyGen(args.seed)

    line_ch = int(test_batch[1].shape[-1])
    shape = (1, args.image_size, args.image_size)
    g_vars = G.init(keys(), jnp.zeros(shape + (line_ch,)))
    d_vars = D.init(keys(), jnp.zeros(shape + (3 + line_ch,)), train=True)
    if 'batch_stats' not in d_vars:
        d_vars = {'params': d_vars['params'], 'batch_stats': {}}

    g_tx = optax.adam(args.lr, b1=args.betas[0], b2=args.betas[1])
    d_tx = optax.adam(args.lr, b1=args.betas[0], b2=args.betas[1])
    state = dict(rng=keys(), G=g_vars['params'], D=d_vars,
                 g_opt=g_tx.init(g_vars['params']),
                 d_opt=d_tx.init(d_vars['params']), step=jnp.int32(0))

    train_step = accel.jit_step(build_restoration_step(
        G, D, g_tx, d_tx, LSGANLoss(), args.pixel_lambda))

    test_real = jnp.asarray(test_batch[0])
    test_line = jnp.asarray(test_batch[1])

    @jax.jit
    def _gen(state):
        return G.apply({'params': state['G']}, test_line)

    def sample_fn(state):
        import numpy as np
        line3 = np.repeat(np.asarray(test_line), 3, axis=-1) \
            if test_line.shape[-1] == 1 else np.asarray(test_line)
        return make_image_grid(np.asarray(test_real), line3,
                               np.asarray(_gen(state)))

    return run_training(
        name=name, args=args, accel=accel, state=state, loader=loader,
        train_step=train_step, sample_fn=sample_fn,
        max_iters=max_iters, save_interval=args.save, nrow=6,
        ema_params_path=lambda s: s['G'],
    )


def main(parser):
    from animeface_tpu.implementations.NAFNet.model import NAFNet, Discriminator
    # reference add_args schema (utils.py:88-106), verbatim (+num_test)
    parser = add_args(parser, dict(
        num_test=[4, 'eval samples'],
        image_channels=[3],
        bottom=[16, 'bottom width'],
        g_channels=[64, 'minimum channel width'],
        blocks_per_scale=[2, 'NAF blocks per scale'],
        mid_blocks=[6, 'number of NAF blocks in bottom'],
        mlp_ratio=[1, 'ratio for MLP, like in Transformers.'],
        g_norm_name=['ln', 'normalization layer name'],
        g_act_name=[str, 'activation function name. Sigmoid==GLU'],
        num_layers=[3, 'number of layers'],
        d_channels=[64, 'minimum channel width'],
        max_channels=[512, 'maximum channel width'],
        d_norm_name=['bn', 'normalization layer name'],
        d_act_name=['lrelu', 'activation function name'],
        lr=[0.0002, 'learning rate'],
        betas=[[0.5, 0.999], 'betas'],
        pixel_lambda=[10., 'lambda for pixel-wise loss'],
    ))
    args = parser.parse_args()
    save_args(args)

    dataset = build_dataset(args, 'xdog')
    loader = DataLoader(dataset, args.batch_size, seed=args.seed)
    test_batch = next(iter(DataLoader(dataset, args.num_test, shuffle=False,
                                      num_workers=1)))
    max_iters = default_max_iters(args, loader)

    import jax.numpy as jnp2
    dtype = jnp2.float32 if args.no_bf16 else jnp2.bfloat16
    line_ch = int(test_batch[1].shape[-1])
    G = NAFNet(image_size=args.image_size, bottom=args.bottom,
               channels=args.g_channels, max_channels=args.max_channels,
               blocks_per_scale=args.blocks_per_scale,
               mid_blocks=args.mid_blocks, mlp_ratio=args.mlp_ratio,
               norm_name=args.g_norm_name, act_name=args.g_act_name,
               in_channels=line_ch, out_channels=args.image_channels,
               dtype=dtype)
    D = Discriminator(num_layers=args.num_layers, channels=args.d_channels,
                      max_channels=args.max_channels,
                      norm_name=args.d_norm_name, act_name=args.d_act_name,
                      dtype=dtype)
    run_restoration('NAFNet', args, G, D, loader, test_batch, max_iters)
