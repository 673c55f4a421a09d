"""Dataset registry — replaces the reference's hard-coded lookup tables
(`/root/reference/diffusion_engine.py:107-116` division/rgb tables and
`:371-380` per-dataset channel/size selection).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Tuple


@dataclasses.dataclass(frozen=True)
class DatasetSpec:
    name: str
    family: str                 # 'pan' | 'hisr'
    n_channels: int             # MS/HSI bands (model in/out channels)
    pan_channels: int           # PAN (1) or RGB (3) channels
    division: float             # sensor radiometric divisor
    rgb_channels: Tuple[int, ...]   # visualization band indices
    train_size: int = 64        # training patch size
    reduced_size: int = 256     # reduced-res eval size
    full_size: int = 512        # full-res eval size
    ergas_ratio: int = 4


DATASET_REGISTRY: Dict[str, DatasetSpec] = {
    "wv3": DatasetSpec("wv3", "pan", 8, 1, 2047.0, (4, 2, 0),
                       reduced_size=256, full_size=512),
    "gf2": DatasetSpec("gf2", "pan", 4, 1, 1023.0, (0, 1, 2),
                       reduced_size=256, full_size=512),
    "qb": DatasetSpec("qb", "pan", 4, 1, 2047.0, (0, 1, 2),
                      reduced_size=256, full_size=512),
    "cave": DatasetSpec("cave", "hisr", 31, 3, 1.0, (29, 19, 9),
                        reduced_size=512, full_size=512),
    "harvard": DatasetSpec("harvard", "hisr", 31, 3, 1.0, (29, 19, 9),
                           reduced_size=1000, full_size=1000),
}


def get_dataset_spec(name: str) -> DatasetSpec:
    try:
        return DATASET_REGISTRY[name]
    except KeyError:
        raise NotImplementedError(
            f"dataset {name} not supported; known: "
            f"{sorted(DATASET_REGISTRY)}") from None
