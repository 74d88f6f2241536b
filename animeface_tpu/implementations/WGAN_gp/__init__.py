from animeface_tpu.implementations.WGAN_gp.utils import main
