from animeface_tpu.implementations.SCFT.utils import main
