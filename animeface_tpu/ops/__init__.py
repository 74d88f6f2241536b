'''StyleGAN custom-op layer, TPU-native (see SURVEY.md §2.2 mapping).'''

from animeface_tpu.ops.registry import (
    set_default_impl, get_default_impl, resolve_impl,
)
from animeface_tpu.ops.upfirdn2d import (
    setup_filter, upfirdn2d, filter2d, upsample2d, downsample2d,
)
from animeface_tpu.ops.bias_act import bias_act, activation_funcs
from animeface_tpu.ops.filtered_lrelu import filtered_lrelu
from animeface_tpu.ops.conv2d_resample import conv2d_resample
from animeface_tpu.ops.grid_sample import grid_sample
from animeface_tpu.ops.fma import fma
from animeface_tpu.ops import gradfix
