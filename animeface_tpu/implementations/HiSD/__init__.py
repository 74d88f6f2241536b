from animeface_tpu.implementations.HiSD.utils import main
