"""Utilities: run-dir layout, logging, field visualization.

Reference parity target: ``util.py`` of byungsook/deep-fluids (SURVEY.md §2
"Util" [M]) — logger + run-dir layout, config JSON persistence, image-grid
montages, GIF assembly.
"""

from deepfluids_tpu.utils.rundir import prepare_run_dir, get_logger
from deepfluids_tpu.utils.images import (
    field_to_image,
    save_field_image,
    save_image_grid,
    save_gif,
)

__all__ = [
    "prepare_run_dir",
    "get_logger",
    "field_to_image",
    "save_field_image",
    "save_image_grid",
    "save_gif",
]
