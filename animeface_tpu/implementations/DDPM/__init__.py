from animeface_tpu.implementations.DDPM.utils import main
