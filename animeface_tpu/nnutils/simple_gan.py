'''Generic unconditional-GAN recipe builder.

Several reference implementations share the same loop shape — sample z, G
forward, adversarial loss with optional lazy R1, DiffAugment on both branches,
EMA of G — differing only in architecture and hyperparameters (TransGAN, HiT,
ConvNeXt, VAN, AdaBelief, edge...). This builder expresses that loop once for
stateless-params models (no BatchNorm collections); recipes with extra state
write their own steps.
'''

from __future__ import annotations

import jax
import jax.numpy as jnp
import optax

from animeface_tpu.nnutils import KeyGen, sample_nnoise, update_ema
from animeface_tpu.nnutils.accelerate import Accelerator
from animeface_tpu.nnutils.loss import r1_regularizer
from animeface_tpu.nnutils.diffaugment import diff_augment
from animeface_tpu.nnutils.trainer import run_training, host_step_counter


def build_adv_step(G, D, g_tx, d_tx, loss, policy, gp_lambda, do_r1,
                   latent_dim, ema_decay=0.999, g_rngs=(), use_ema=True,
                   d_rngs=()):
    def train_step(state, real):
        n_extra = len(g_rngs) + 3 * len(d_rngs)
        rng, zkey, ar, af, ag, *extra = jax.random.split(state['rng'],
                                                         5 + n_extra)
        B = real.shape[0]
        z = sample_nnoise(zkey, (B, latent_dim))
        rngs = {name: k for name, k in zip(g_rngs, extra)}
        # independent D rng sets per forward (real / fake / G-update branch),
        # matching the reference where every torch forward redraws dropout
        d_extra = extra[len(g_rngs):]
        d_rset = [{name: d_extra[3 * i + j] for i, name in enumerate(d_rngs)}
                  or None for j in range(3)]

        fake = G.apply({'params': state['G']}, z, rngs=rngs or None)
        fake_sg = jax.lax.stop_gradient(fake)

        def d_loss_fn(d_params):
            real_prob = D.apply({'params': d_params},
                                diff_augment(ar, real, policy),
                                rngs=d_rset[0])
            fake_prob = D.apply({'params': d_params},
                                diff_augment(af, fake_sg, policy),
                                rngs=d_rset[1])
            adv = loss.d_loss(real_prob, fake_prob)
            if do_r1 and gp_lambda > 0:
                d_apply = lambda img: D.apply({'params': d_params}, img,
                                              rngs=d_rset[0])
                adv = adv + r1_regularizer(real, d_apply) * gp_lambda
            return adv

        d_loss, d_grads = jax.value_and_grad(d_loss_fn)(state['D'])
        d_up, d_opt = d_tx.update(d_grads, state['d_opt'], state['D'])
        d_params = optax.apply_updates(state['D'], d_up)

        def g_loss_fn(g_params):
            fake2 = G.apply({'params': g_params}, z, rngs=rngs or None)
            fake_prob = D.apply({'params': d_params},
                                diff_augment(ag, fake2, policy),
                                rngs=d_rset[2])
            return loss.g_loss(fake_prob)

        g_loss, g_grads = jax.value_and_grad(g_loss_fn)(state['G'])
        g_up, g_opt = g_tx.update(g_grads, state['g_opt'], state['G'])
        g_params = optax.apply_updates(state['G'], g_up)

        out = dict(rng=rng, G=g_params, D=d_params,
                   g_opt=g_opt, d_opt=d_opt, step=state['step'] + 1)
        if use_ema:
            out['G_ema'] = update_ema(g_params, state['G_ema'], ema_decay)
        return out, dict(g=jnp.nan_to_num(g_loss), d=jnp.nan_to_num(d_loss))

    return train_step


def run_simple_gan(name, args, loader, max_iters, G, D, loss,
                   g_example_input, d_example_input, latent_dim,
                   g_tx=None, d_tx=None, gp_lambda=0.0, gp_every=16,
                   policy='', ema_decay=0.999, g_rngs=(), num_test=16,
                   use_ema=True, init_func=None, d_rngs=()):
    '''Wire the generic loop: init, jit both lazy-reg variants, run.

    `use_ema=False` drops the EMA copy from state and samples from the live
    G (reference recipes gate this behind `--ema`, e.g. HiT utils.py:147).
    `init_func` re-draws kernel leaves from the named initializer registry
    after construction (reference `init().init_name` appliers).'''
    accel = Accelerator(mesh_shape=tuple(args.mesh), bf16=not args.no_bf16)
    keys = KeyGen(args.seed)

    init_rngs = {'params': keys(), **{n: keys() for n in g_rngs}}
    g_vars = G.init(init_rngs, g_example_input)
    d_vars = D.init({'params': keys(), **{n: keys() for n in d_rngs}},
                    d_example_input)
    if init_func:
        from animeface_tpu.nnutils.initialize import apply_init
        g_vars = {**g_vars, 'params': apply_init(keys(), g_vars['params'],
                                                 init_func)}
        d_vars = {**d_vars, 'params': apply_init(keys(), d_vars['params'],
                                                 init_func)}

    g_tx = g_tx or optax.adam(2e-4, b1=0.5)
    d_tx = d_tx or optax.adam(2e-4, b1=0.5)
    state = dict(rng=keys(), G=g_vars['params'], D=d_vars['params'],
                 g_opt=g_tx.init(g_vars['params']),
                 d_opt=d_tx.init(d_vars['params']), step=jnp.int32(0))
    if use_ema:
        state['G_ema'] = jax.tree_util.tree_map(jnp.copy, g_vars['params'])

    jit_plain = accel.jit_step(build_adv_step(
        G, D, g_tx, d_tx, loss, policy, gp_lambda, False, latent_dim,
        ema_decay, g_rngs, use_ema, d_rngs))
    jit_r1 = accel.jit_step(build_adv_step(
        G, D, g_tx, d_tx, loss, policy, gp_lambda, True, latent_dim,
        ema_decay, g_rngs, use_ema, d_rngs))
    next_index = host_step_counter()

    def train_step(state, batch):
        i = next_index(state)
        if gp_lambda > 0 and i % gp_every == 0:
            return jit_r1(state, batch)
        return jit_plain(state, batch)

    const_z = sample_nnoise(keys(), (num_test, latent_dim))
    # no 'dropout' rng at sample time = torch eval() mode
    sample_rngs = {n: keys() for n in g_rngs if n != 'dropout'}

    @jax.jit
    def sample_fn(state):
        src = state['G_ema'] if use_ema else state['G']
        return G.apply({'params': src}, const_z,
                       rngs=sample_rngs or None)

    return run_training(
        name=name, args=args, accel=accel, state=state, loader=loader,
        train_step=train_step, sample_fn=sample_fn,
        max_iters=max_iters, save_interval=args.save,
        ema_params_path=lambda s: s['G_ema'] if use_ema else s['G'],
    )
