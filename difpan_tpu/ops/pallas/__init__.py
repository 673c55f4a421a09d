from .fused_norm import fused_groupnorm_swish
from .linear_attention import fwm_linear_attention
from .flash_attention import flash_attention, fp8_flash_attention
