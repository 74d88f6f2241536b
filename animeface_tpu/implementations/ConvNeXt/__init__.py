from animeface_tpu.implementations.ConvNeXt.utils import main
