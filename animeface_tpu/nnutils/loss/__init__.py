from animeface_tpu.nnutils.loss.gan import (
    Adversarial, GANLoss, LSGANLoss, NonSaturatingLoss, WGANLoss, HingeLoss,
)
from animeface_tpu.nnutils.loss.penalty import (
    gradient_penalty, dragan_penalty, r1_regularizer, r2_regularizer,
)
