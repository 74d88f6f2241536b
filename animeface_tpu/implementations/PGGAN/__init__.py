from animeface_tpu.implementations.PGGAN.utils import main
