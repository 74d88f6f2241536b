from animeface_tpu.implementations.GAN.utils import main
