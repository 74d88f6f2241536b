from animeface_tpu.parallel.mesh import (
    DATA_AXIS, MODEL_AXIS, SPATIAL_AXIS, make_mesh, data_sharding, replicated,
    shard_batch, replicate, prefetch_to_device, check_replica_consistency,
    find_replica_drift, assert_replica_consistency, model_sharding,
    activation_sharding, spatial_activation_sharding, constrain_spatial,
)
