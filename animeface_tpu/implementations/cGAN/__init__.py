from animeface_tpu.implementations.cGAN.utils import main
