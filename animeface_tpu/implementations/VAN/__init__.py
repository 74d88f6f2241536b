from animeface_tpu.implementations.VAN.utils import main
