'''ACGAN recipe (reference `implementations/ACGAN/utils.py`): LSGAN adversarial
loss + cross-entropy auxiliary classification on integer labels.

Deviation from the reference loop: the reference reuses the fake images'
label logits for the real-label CE term (utils.py:43-48 overwrites
`label_prob` before use); here each CE term uses its own logits — the
published ACGAN formulation.
'''

from __future__ import annotations

import jax
import jax.numpy as jnp
import optax

from animeface_tpu.implementations.ACGAN.model import Generator, Discriminator
from animeface_tpu.utils import add_args, save_args
from animeface_tpu.nnutils import KeyGen, sample_nnoise
from animeface_tpu.nnutils.accelerate import Accelerator
from animeface_tpu.nnutils.loss import LSGANLoss
from animeface_tpu.nnutils.trainer import run_training, default_max_iters
from animeface_tpu.dataset import build_dataset, DataLoader


def _ce(logits, labels):
    return jnp.mean(optax.softmax_cross_entropy_with_integer_labels(logits, labels))


def build_train_step(G, D, g_tx, d_tx, loss, num_classes):
    def train_step(state, batch):
        real, real_label = batch
        rng, zkey, lkey = jax.random.split(state['rng'], 3)
        B = real.shape[0]
        z = sample_nnoise(zkey, (B, G.latent_dim))
        fake_label = jax.random.randint(lkey, (B,), 0, num_classes)

        fake, g_mut = G.apply(state['G'], z, fake_label, train=True,
                              mutable=['batch_stats'])

        def d_loss_fn(d_params):
            d_vars = {'params': d_params, 'batch_stats': state['D']['batch_stats']}
            (real_prob, real_cls), d_mut = D.apply(d_vars, real, train=True,
                                                   mutable=['batch_stats'])
            (fake_prob, fake_cls), d_mut = D.apply(
                {'params': d_params, **d_mut}, jax.lax.stop_gradient(fake),
                train=True, mutable=['batch_stats'])
            label_loss = (_ce(real_cls, real_label) + _ce(fake_cls, fake_label)) / 2
            adv = loss.d_loss(real_prob, fake_prob)
            return adv + label_loss, d_mut

        (d_loss, d_mut), d_grads = jax.value_and_grad(d_loss_fn, has_aux=True)(
            state['D']['params'])
        d_up, d_opt = d_tx.update(d_grads, state['d_opt'], state['D']['params'])
        d_params = optax.apply_updates(state['D']['params'], d_up)

        def g_loss_fn(g_params):
            fake2, _ = G.apply({'params': g_params, **g_mut}, z, fake_label,
                               train=True, mutable=['batch_stats'])
            (fake_prob, fake_cls), _ = D.apply({'params': d_params, **d_mut},
                                               fake2, train=True,
                                               mutable=['batch_stats'])
            return loss.g_loss(fake_prob) + _ce(fake_cls, fake_label)

        g_loss, g_grads = jax.value_and_grad(g_loss_fn)(state['G']['params'])
        g_up, g_opt = g_tx.update(g_grads, state['g_opt'], state['G']['params'])
        g_params = optax.apply_updates(state['G']['params'], g_up)

        return dict(rng=rng, G={'params': g_params, **g_mut},
                    D={'params': d_params, **d_mut},
                    g_opt=g_opt, d_opt=d_opt, step=state['step'] + 1), \
            dict(d=d_loss, g=g_loss)

    return train_step


def train(args, max_iters, loader, num_classes):
    accel = Accelerator(mesh_shape=tuple(args.mesh), bf16=not args.no_bf16)
    keys = KeyGen(args.seed)

    G = Generator(latent_dim=args.latent_dim, label_dim=num_classes,
                  image_size=args.image_size, dtype=accel.compute_dtype)
    D = Discriminator(label_dim=num_classes, image_size=args.image_size,
                      dtype=accel.compute_dtype)
    g_vars = G.init(keys(), jnp.zeros((1, args.latent_dim)),
                    jnp.zeros((1,), jnp.int32), train=True)
    d_vars = D.init(keys(), jnp.zeros((1, args.image_size, args.image_size, 3)),
                    train=True)

    g_tx, d_tx = optax.adam(1e-3), optax.adam(1e-3)
    state = dict(rng=keys(), G=g_vars, D=d_vars,
                 g_opt=g_tx.init(g_vars['params']),
                 d_opt=d_tx.init(d_vars['params']), step=jnp.int32(0))

    train_step = accel.jit_step(
        build_train_step(G, D, g_tx, d_tx, LSGANLoss(), num_classes))

    const_z = sample_nnoise(keys(), (16, args.latent_dim))
    const_label = jnp.arange(16, dtype=jnp.int32) % num_classes

    @jax.jit
    def sample_fn(state):
        return G.apply(state['G'], const_z, const_label, train=False)

    return run_training(
        name='ACGAN', args=args, accel=accel, state=state, loader=loader,
        train_step=train_step, sample_fn=sample_fn,
        max_iters=max_iters, save_interval=args.save,
        ema_params_path=lambda s: s['G'],
    )


def main(parser):
    parser = add_args(parser, dict(latent_dim=[200]))
    args = parser.parse_args()
    save_args(args)

    dataset = build_dataset(args, 'label')
    loader = DataLoader(dataset, args.batch_size, seed=args.seed)
    max_iters = default_max_iters(args, loader)
    train(args, max_iters, loader, dataset.num_classes)
