"""Logging: tensorboard + file/stdout, mirroring the reference's
`utils/logger.py:23-133` (TensorboardLogger / PrintLogger) with a run-id
subdirectory per run. tensorboardX is optional — gated import so headless
environments still train."""

from __future__ import annotations

import logging
import os
import sys
import time
import uuid
from typing import Dict, Optional


class PrintLogger:
    """python logging -> file + stdout (`utils/logger.py:95-133`)."""

    def __init__(self, name: str = "difpan", log_dir: Optional[str] = None):
        self.logger = logging.getLogger(f"{name}-{uuid.uuid4().hex[:6]}")
        self.logger.setLevel(logging.INFO)
        self.logger.propagate = False
        fmt = logging.Formatter("%(asctime)s - %(message)s")
        sh = logging.StreamHandler(sys.stdout)
        sh.setFormatter(fmt)
        self.logger.addHandler(sh)
        if log_dir is not None:
            os.makedirs(log_dir, exist_ok=True)
            fh = logging.FileHandler(os.path.join(log_dir, "log.txt"))
            fh.setFormatter(fmt)
            self.logger.addHandler(fh)

    def print(self, *msg):
        self.logger.info(" ".join(str(m) for m in msg))

    info = print


class TensorboardLogger(PrintLogger):
    """tensorboardX writer + file logger under a random run-id dir
    (`utils/logger.py:23-92`)."""

    def __init__(self, file_logger_name: str = "difpan",
                 base_dir: str = "./runs"):
        run_id = time.strftime("%m-%d_%H-%M-") + uuid.uuid4().hex[:8]
        self.run_dir = os.path.join(base_dir, f"{file_logger_name}-{run_id}")
        os.makedirs(self.run_dir, exist_ok=True)
        super().__init__(file_logger_name, log_dir=self.run_dir)
        try:
            from tensorboardX import SummaryWriter
            self.writer = SummaryWriter(self.run_dir)
        except Exception:  # pragma: no cover - headless fallback
            self.writer = None
            self.print("tensorboardX unavailable; scalar logging to file only")

    def log_scalar(self, tag: str, value: float, step: int):
        if self.writer is not None:
            self.writer.add_scalar(tag, value, step)

    def log_scalars(self, tag: str, d: Dict[str, float], step: int):
        for k, v in d.items():
            self.log_scalar(f"{tag}/{k}", float(v), step)

    def log_image(self, tag: str, img, step: int):
        if self.writer is not None:
            self.writer.add_image(tag, img, step, dataformats="HWC")

    def close(self):
        if self.writer is not None:
            self.writer.close()
