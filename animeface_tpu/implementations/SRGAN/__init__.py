from animeface_tpu.implementations.SRGAN.utils import main
