from animeface_tpu.implementations.pix2pix.utils import main
