from animeface_tpu.implementations.edge.utils import main
