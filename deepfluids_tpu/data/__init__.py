"""Data pipeline: args.txt manifest + .npz field contract, normalization,
prefetching batch manager (reference: deep-fluids ``data.py`` BatchManager,
SURVEY.md §2 [M][B])."""

from deepfluids_tpu.data.manifest import Manifest, load_manifest, save_manifest
from deepfluids_tpu.data.dataset import FieldDataset, BatchManager, CodeDataset

__all__ = [
    "Manifest",
    "load_manifest",
    "save_manifest",
    "FieldDataset",
    "BatchManager",
    "CodeDataset",
]
