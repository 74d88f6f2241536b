from animeface_tpu.implementations.HoloGAN.utils import main
