from animeface_tpu.implementations.AE.utils import main
