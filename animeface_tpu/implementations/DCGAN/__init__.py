from animeface_tpu.implementations.DCGAN.utils import main
