"""File logger (reference: ptsemseg/utils.py:112-122)."""

from __future__ import annotations

import datetime
import logging
import os


def get_logger(logdir: str, name: str = "multiagentperception_tpu") -> logging.Logger:
    logger = logging.getLogger(name)
    ts = str(datetime.datetime.now()).split(".")[0]
    ts = ts.replace(" ", "_").replace(":", "_").replace("-", "_")
    os.makedirs(logdir, exist_ok=True)
    hdlr = logging.FileHandler(os.path.join(logdir, f"run_{ts}.log"))
    hdlr.setFormatter(logging.Formatter("%(asctime)s %(levelname)s %(message)s"))
    logger.addHandler(hdlr)
    logger.setLevel(logging.INFO)
    return logger
