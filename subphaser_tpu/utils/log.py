"""Logging setup (timestamped, reference-style step banners)."""

from __future__ import annotations

import logging
import sys

logger = logging.getLogger("subphaser_tpu")


def setup_logging(level=logging.INFO) -> logging.Logger:
    if not logger.handlers:
        handler = logging.StreamHandler(sys.stderr)
        handler.setFormatter(
            logging.Formatter(
                "%(asctime)s [%(levelname)s] %(message)s", datefmt="%Y-%m-%d %H:%M:%S"
            )
        )
        logger.addHandler(handler)
    logger.setLevel(level)
    return logger
