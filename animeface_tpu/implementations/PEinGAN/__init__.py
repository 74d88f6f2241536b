from animeface_tpu.implementations.PEinGAN.utils import main
