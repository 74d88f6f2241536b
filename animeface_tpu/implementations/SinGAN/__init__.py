from animeface_tpu.implementations.SinGAN.utils import main
