from animeface_tpu.implementations.DiffAugment.utils import main
