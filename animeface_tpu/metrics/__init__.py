from animeface_tpu.metrics.fid import (
    gaussian_statistics, frechet_distance, compute_fid, compute_kid,
    FeatureAccumulator,
)
from animeface_tpu.metrics.inception import (
    InceptionV3Features, load_inception_params, inception_available,
    make_extractor,
)
