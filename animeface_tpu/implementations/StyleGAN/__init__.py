from animeface_tpu.implementations.StyleGAN.utils import main
