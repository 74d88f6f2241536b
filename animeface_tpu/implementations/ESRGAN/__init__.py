from animeface_tpu.implementations.ESRGAN.utils import main
