from .registry import DATASET_REGISTRY, DatasetSpec, get_dataset_spec
from .pan_dataset import PanDataset
from .hisr import HISRDataSets
from .loader import batch_iterator, device_prefetch, pack_cond
from .synthetic import (make_synthetic_pan_h5, make_synthetic_hisr_h5,
                        make_wald_pan_h5, make_wald_hisr_h5)
