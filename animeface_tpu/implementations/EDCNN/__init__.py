from animeface_tpu.implementations.EDCNN.utils import main
