from animeface_tpu.implementations.WGAN.utils import main
