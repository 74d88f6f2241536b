from animeface_tpu.implementations.ContraD.utils import main
