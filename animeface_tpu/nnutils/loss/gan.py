'''Adversarial losses.

Behavioral parity with reference `nnutils/loss/gan.py` (GANLoss :40, LSGANLoss :66,
NonSaturatingLoss :98, WGANLoss :116, HingeLoss :134): identical formulas on
discriminator logits, as stateless classes whose methods are pure jnp functions —
safe to close over inside a jitted train step.
'''

from __future__ import annotations

import jax.numpy as jnp
from jax.nn import softplus

from animeface_tpu.nnutils.loss._base import Loss


def _bce_with_logits(logits, target):
    # mean over all elements; numerically-stable BCEWithLogits
    return jnp.mean(softplus(logits) - logits * target)


class Adversarial(Loss):
    def real_loss(self, prob):
        raise NotImplementedError()

    def fake_loss(self, prob):
        raise NotImplementedError()

    def d_loss(self, real_prob, fake_prob):
        rl = self.real_loss(real_prob)
        fl = self.fake_loss(fake_prob)
        loss = rl + fl
        if self.return_all:
            return loss, rl, fl
        return loss

    def g_loss(self, fake_prob):
        return self.real_loss(fake_prob)


class GANLoss(Adversarial):
    '''original GAN: BCE-with-logits to 1 (real) / 0 (fake).'''

    def real_loss(self, prob):
        return _bce_with_logits(prob, jnp.ones_like(prob))

    def fake_loss(self, prob):
        return _bce_with_logits(prob, jnp.zeros_like(prob))


class LSGANLoss(Adversarial):
    '''least squares GAN (a,b,c = 0,1,1): 0.5 * MSE terms.'''

    def real_loss(self, prob):
        return jnp.mean((prob - 1.0) ** 2)

    def fake_loss(self, prob):
        return jnp.mean(prob ** 2)

    def d_loss(self, real_prob, fake_prob):
        rl = self.real_loss(real_prob) * 0.5
        fl = self.fake_loss(fake_prob) * 0.5
        loss = rl + fl
        if self.return_all:
            return loss, rl, fl
        return loss

    def g_loss(self, fake_prob):
        return self.real_loss(fake_prob) * 0.5


class NonSaturatingLoss(Adversarial):
    '''softplus(-D(x)) + softplus(D(G(z))); G: softplus(-D(G(z))).'''

    def real_loss(self, prob):
        return jnp.mean(softplus(-prob))

    def fake_loss(self, prob):
        return jnp.mean(softplus(prob))


class WGANLoss(Adversarial):
    '''Wasserstein: D maximises E[D(x)] - E[D(G(z))].'''

    def real_loss(self, prob):
        return -jnp.mean(prob)

    def fake_loss(self, prob):
        return jnp.mean(prob)


class HingeLoss(Adversarial):
    '''hinge: relu(1-D(x)) + relu(1+D(G(z))); G: -E[D(G(z))].'''

    def real_loss(self, prob):
        return jnp.mean(jnp.maximum(1.0 - prob, 0.0))

    def fake_loss(self, prob):
        return jnp.mean(jnp.maximum(1.0 + prob, 0.0))

    def g_loss(self, fake_prob):
        return -jnp.mean(fake_prob)
