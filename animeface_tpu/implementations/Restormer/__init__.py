from animeface_tpu.implementations.Restormer.utils import main
