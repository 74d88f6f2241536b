from animeface_tpu.implementations.StyleGAN3.utils import main
