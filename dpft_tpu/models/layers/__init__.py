from dpft_tpu.models.layers.unary import Unary1d, Unary2d  # noqa: F401
from dpft_tpu.models.layers.attention import MultiheadAttention  # noqa: F401
from dpft_tpu.models.layers.ms_deform_attn import MSDeformAttn  # noqa: F401
from dpft_tpu.models.layers.common import (  # noqa: F401
    get_activation, torch_linear_kernel_init, torch_linear_bias_init,
)
