"""Structured logging.

File + console singleton like the reference (``logger_setup.py:9-23``) with
per-component child loggers instead of one global.
"""

from __future__ import annotations

import logging
import os
from typing import Optional

_ROOT_NAME = "mmtpu"
_configured = False


def configure(log_file: Optional[str] = None, level: int = logging.INFO) -> None:
    global _configured
    root = logging.getLogger(_ROOT_NAME)
    root.setLevel(level)
    if _configured:
        return
    fmt = logging.Formatter("%(asctime)s - %(name)s - %(levelname)s - %(message)s")
    console = logging.StreamHandler()
    console.setFormatter(fmt)
    root.addHandler(console)
    if log_file:
        os.makedirs(os.path.dirname(log_file) or ".", exist_ok=True)
        fh = logging.FileHandler(log_file)
        fh.setFormatter(fmt)
        root.addHandler(fh)
    root.propagate = False
    _configured = True


def get_logger(name: str) -> logging.Logger:
    if not _configured:
        configure()
    return logging.getLogger(f"{_ROOT_NAME}.{name}")
