from animeface_tpu.implementations.AniGAN.utils import main
