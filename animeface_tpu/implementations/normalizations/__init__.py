from animeface_tpu.implementations.normalizations.utils import main
