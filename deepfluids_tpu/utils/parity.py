"""Field-parity checking — the L2 < 1e-3 acceptance gate.

BASELINE.json's north star [B] demands "bit-comparable velocity fields to
the reference (L2 < 1e-3 normalized)".  With no reference checkout mounted
this session (SURVEY.md header), the harness is generic: it compares any two
field sets (ours vs golden dumps, TF1 exports, or cross-backend runs) under
the normalized-L2 metric, and tests/test_parity.py pins committed golden
fields so discretization semantics (FD scheme, boundary handling, solver
stepping) cannot drift silently across refactors.
"""

from __future__ import annotations

import glob
import os

import numpy as np


def normalized_l2(a: np.ndarray, b: np.ndarray) -> float:
    """||a - b||_2 / ||b||_2 (the [B] parity metric; b is the reference)."""
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    denom = np.linalg.norm(b)
    return float(np.linalg.norm(a - b) / (denom + 1e-12))


def check_fields(ours: np.ndarray, reference: np.ndarray,
                 tol: float = 1e-3) -> dict:
    """Per-field normalized L2 + pass/fail against ``tol``.

    Args:
      ours/reference: [N, *spatial, C] field stacks.
    Returns:
      {"max_l2", "mean_l2", "num_failed", "passed"}.
    """
    assert ours.shape == reference.shape, (ours.shape, reference.shape)
    l2s = np.array([normalized_l2(o, r) for o, r in zip(ours, reference)])
    return {
        "max_l2": float(l2s.max()),
        "mean_l2": float(l2s.mean()),
        "num_failed": int((l2s > tol).sum()),
        "passed": bool((l2s <= tol).all()),
    }


def check_dirs(our_dir: str, ref_dir: str, key: str = "x",
               tol: float = 1e-3) -> dict:
    """Compare two sweep-output directories of ``<scene>_<frame>.npz``."""
    ours = sorted(glob.glob(os.path.join(our_dir, "*.npz")))
    refs = sorted(glob.glob(os.path.join(ref_dir, "*.npz")))
    names_o = {os.path.basename(p) for p in ours}
    names_r = {os.path.basename(p) for p in refs}
    common = sorted(names_o & names_r)
    if not common:
        raise FileNotFoundError("no common .npz files to compare")
    a = np.stack([np.load(os.path.join(our_dir, n))[key] for n in common])
    b = np.stack([np.load(os.path.join(ref_dir, n))[key] for n in common])
    out = check_fields(a, b, tol)
    out["num_compared"] = len(common)
    out["missing_in_ours"] = sorted(names_r - names_o)
    return out
