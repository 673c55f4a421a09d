from .pan_acc import (
    AnalysisPanAcc,
    NonAnalysisPanAcc,
    analysis_accu,
    ssim_skimage,
)
