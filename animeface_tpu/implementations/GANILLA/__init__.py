from animeface_tpu.implementations.GANILLA.utils import main
