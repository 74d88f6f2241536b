from animeface_tpu.implementations.NAFNet.utils import main
