"""Score a latent-integrator rollout against the simulated trajectory.

Reads ``logs/<nn_run>/test/rollout.npz`` (written by the arch-"nn" test
path, main.py:131-137: ``x`` = decoded fields in RAW units — see
rollout_trajectory's trailing ``denormalize_field``) and compares each
frame to the raw ground-truth sim frames of the FIRST code scene (the
scene main.py rolls out: ``trainer.codes.z[0]``, i.e. the
lexicographically-first ``code<z>/<scene>.npz``).  The relative-L2 metric
is invariant to the (pure-scale) field normalization, so raw-vs-raw
matches the normalized-space numbers elsewhere in BENCHMARKS.

Metric: per-frame relative L2  ||x_roll - x_gt|| / ||x_gt||, reported as
median over the whole horizon plus first/last quarter medians (the drift
profile VERDICT round-2 weak #7 tracks).  Appends a ``rollout_field_l2``
record to BENCHMARKS.jsonl — same shape as the round-2 ad-hoc records.

The metric math lives in ``deepfluids_tpu.infer.score`` — the SAME code
path ``Trainer.evaluate`` (arch nn, with ``--ae_load_path``) and main.py's
nn test path report (round-3 VERDICT next #8); this tool only adds the
load-a-saved-rollout.npz front end.

Usage: python tools/rollout_eval.py <nn_run_dir> [note]
"""

from __future__ import annotations

import glob
import json
import os
import sys
import time

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

from deepfluids_tpu.config import load_config  # noqa: E402


def main(argv: list[str]) -> dict:
    if not argv:
        print("usage: rollout_eval.py <nn_run_dir> [note]", file=sys.stderr)
        raise SystemExit(2)
    run_dir = argv[0].rstrip("/")
    note = argv[1] if len(argv) > 1 else ""

    cfg = load_config(run_dir)
    roll_path = os.path.join(run_dir, "test", "rollout.npz")
    with np.load(roll_path) as d:
        x_roll = d["x"]                              # [T, *res, C] normalized

    # Relative data_dir ("data", the default) means repo-root-relative —
    # like sibling solver_consistency.py, results must not depend on cwd.
    data_dir = (cfg.data_dir if os.path.isabs(cfg.data_dir)
                else os.path.join(ROOT, cfg.data_dir))
    ds_dir = os.path.join(data_dir, cfg.dataset)

    # The rolled-out scene is the first code scene: lexicographically first
    # code file stem (encode_dataset writes one npz per scene prefix).
    code_files = sorted(glob.glob(
        os.path.join(ds_dir, f"code{cfg.z_num}{cfg.code_suffix}",
                     "*.npz")))
    scene = os.path.basename(code_files[0])[:-4]

    from deepfluids_tpu.infer.score import score_rollout_vs_sim

    profile = score_rollout_vs_sim(x_roll, ds_dir, scene)
    rec = {
        "metric": "rollout_field_l2",
        "run": os.path.basename(run_dir),
        **profile,
        "note": note,
        "ts": time.strftime("%Y-%m-%d %H:%M:%S"),
    }
    line = json.dumps(rec)
    print(line)
    with open(os.path.join(ROOT, "BENCHMARKS.jsonl"), "a") as f:
        f.write(line + "\n")
    return rec


if __name__ == "__main__":
    main(sys.argv[1:])
