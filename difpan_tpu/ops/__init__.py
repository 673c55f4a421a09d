from .wavelet import haar_dwt2, haar_idwt2, haar_dwt2_nhwc, wavelet_cond_pack
from .fp8_conv import fp8_conv, quantize_e4m3
