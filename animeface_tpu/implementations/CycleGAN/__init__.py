from animeface_tpu.implementations.CycleGAN.utils import main
