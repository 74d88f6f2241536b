from animeface_tpu.implementations.APA.utils import main
