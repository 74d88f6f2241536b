from animeface_tpu.implementations.EigenGAN.utils import main
