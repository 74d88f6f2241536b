from animeface_tpu.implementations.pixelshuffle.utils import main
