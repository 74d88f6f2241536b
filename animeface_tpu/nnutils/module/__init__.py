from animeface_tpu.nnutils.module.layers import (
    get_activation, get_normalization, MiniBatchStdDev,
    SNConv2d, SNLinear, SNConvTranspose2d,
)
