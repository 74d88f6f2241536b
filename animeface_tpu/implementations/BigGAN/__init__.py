from animeface_tpu.implementations.BigGAN.utils import main
