'''animeface_tpu — a TPU-native (JAX/Flax/Pallas) generative-model framework.

Rebuilt from scratch with the capabilities of STomoya/animeface (see SURVEY.md):
the `python main.py <Model>` CLI contract, `implementations/<Model>` training
recipes, a shared `nnutils` runtime (losses, penalties, EMA, init, augmentation),
`dataset` loaders, and the StyleGAN custom ops (`upfirdn2d`, `bias_act`,
`filtered_lrelu`) as Pallas TPU kernels with XLA reference twins.

Conventions (TPU-first, intentionally different from the torch reference):
  * images are NHWC (TPU conv layout), value range [-1, 1]
  * compute dtype bfloat16 / params float32 (no loss-scaler machinery needed)
  * randomness is explicit `jax.random` keys (no global RNG state)
  * data parallelism is `jax.sharding.Mesh` + jit sharding, not a wrapper class
'''

__version__ = '0.1.0'
