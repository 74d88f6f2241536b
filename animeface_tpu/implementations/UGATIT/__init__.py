from animeface_tpu.implementations.UGATIT.utils import main
