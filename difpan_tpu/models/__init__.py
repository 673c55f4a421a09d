from .sr3_dwt import UNetSR3DWT
from .sr3 import UNetSR3
from .unet_google import UNetGoogle
from .multiscale import (MultiScaleDecoder, MultiScaleModel,
                         generate_diffusion_fms)
