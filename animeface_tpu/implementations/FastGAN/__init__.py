from animeface_tpu.implementations.FastGAN.utils import main
