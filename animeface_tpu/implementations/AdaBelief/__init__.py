from animeface_tpu.implementations.AdaBelief.utils import main
