from animeface_tpu.implementations.ADA.utils import main
