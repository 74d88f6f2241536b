from animeface_tpu.implementations.TransGAN.utils import main
