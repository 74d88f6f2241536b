from animeface_tpu.implementations.HiT.utils import main
