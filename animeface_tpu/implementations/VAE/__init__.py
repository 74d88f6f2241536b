from animeface_tpu.implementations.VAE.utils import main
