from animeface_tpu.implementations.SPADE.utils import main
