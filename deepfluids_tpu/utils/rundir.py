"""Run-directory layout + logger (reference ``util.py`` role, SURVEY.md §2).

Layout (kept from the reference): ``logs/<dataset>_<tag>/`` containing
``params.json``, ``checkpoint/``, ``sample/`` (train-time image dumps),
``test/`` (inference sweeps), and ``metrics.jsonl``.
"""

from __future__ import annotations

import logging
import os
from datetime import datetime


def get_logger(name: str = "deepfluids_tpu") -> logging.Logger:
    logger = logging.getLogger(name)
    if not logger.handlers:
        h = logging.StreamHandler()
        h.setFormatter(logging.Formatter(
            "%(asctime)s %(levelname).1s %(name)s] %(message)s",
            datefmt="%H:%M:%S",
        ))
        logger.addHandler(h)
        logger.setLevel(logging.INFO)
        logger.propagate = False
    return logger


def prepare_run_dir(log_dir: str, dataset: str, tag: str,
                    load_path: str = "") -> str:
    """Create (or reuse, when resuming) the run directory.

    Mirrors the reference's ``prepare_dirs_and_logger``: new runs get
    ``logs/<dataset>_<tag>/``; if that exists a timestamp is appended; when
    ``load_path`` points at an existing run dir it is reused as-is.
    """
    if load_path and os.path.isdir(load_path):
        run_dir = load_path
    else:
        run_dir = os.path.join(log_dir, f"{dataset}_{tag}")
        if os.path.exists(run_dir):
            stamp = datetime.now().strftime("%m%d_%H%M%S")
            run_dir = os.path.join(log_dir, f"{dataset}_{tag}_{stamp}")
    for sub in ("checkpoint", "sample", "test"):
        os.makedirs(os.path.join(run_dir, sub), exist_ok=True)
    return run_dir
