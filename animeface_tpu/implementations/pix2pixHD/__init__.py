from animeface_tpu.implementations.pix2pixHD.utils import main
