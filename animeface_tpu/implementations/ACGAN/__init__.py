from animeface_tpu.implementations.ACGAN.utils import main
