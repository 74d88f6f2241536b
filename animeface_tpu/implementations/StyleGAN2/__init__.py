from animeface_tpu.implementations.StyleGAN2.utils import main
