from animeface_tpu.implementations.SEBigGAN.utils import main
