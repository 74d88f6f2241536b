from animeface_tpu.implementations.CIPS.utils import main
