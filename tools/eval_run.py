"""Evaluate a trained run directory and append the result to BENCHMARKS.jsonl.

Rebuilds the Trainer from the run's own persisted params.json, restores the
latest checkpoint, and runs ``Trainer.evaluate()`` (per-arch quality metrics:
de = generated-vs-dataset field L2/rmse, ae = reconstruction + param MSE,
nn = latent rollout error).  One process per run (compiles through the axon
tunnel are slow).

Usage: python tools/eval_run.py <run_dir> [num_samples] [note]
           [--pool train] [--profile_scenes N]

``--profile_scenes N`` (arch nn): decode + score the rollout drift
profile (and its AE floor) for the first N evaluated scenes instead of
just one, with medians-of-medians aggregated under
``rollout_field_l2_agg``.

``--pool train`` overrides the run's --eval_holdout_scenes so a
holdout-configured run can also be scored on its training pool (the
generalization-gap diagnostic: train-vs-holdout on the same checkpoint).
"""

import dataclasses
import json
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)


def main():
    if len(sys.argv) < 2:
        print("usage: eval_run.py <run_dir> [num_samples] [note]",
              file=sys.stderr)
        raise SystemExit(2)
    args = list(sys.argv[1:])
    pool = "holdout"
    profile_scenes = 1
    if "--pool" in args:
        i = args.index("--pool")
        pool = args[i + 1]
        del args[i:i + 2]
    if "--profile_scenes" in args:
        i = args.index("--profile_scenes")
        profile_scenes = int(args[i + 1])
        del args[i:i + 2]
    run_dir = args[0]
    num_samples = int(args[1]) if len(args) > 1 else 128
    note = args[2] if len(args) > 2 else ""

    import jax

    from deepfluids_tpu.config import load_config
    from deepfluids_tpu.train.trainer import Trainer

    cfg = load_config(run_dir)
    if pool == "train":
        # evaluate() keys its pool off this: 0 -> uniform training-set
        # sample (the record carries holdout=false accordingly).
        cfg = dataclasses.replace(cfg, eval_holdout_scenes=0)
    t = Trainer(cfg, run_dir=run_dir, save_cfg=False)
    step = t.restore_checkpoint()
    r = t.evaluate(num_samples=num_samples, profile_scenes=profile_scenes)
    rec = {"metric": f"eval_{cfg.arch}", "run": os.path.basename(run_dir),
           "step": int(step), **r, "note": note,
           "backend": jax.default_backend(),
           "ts": time.strftime("%Y-%m-%d %H:%M:%S")}
    with open(os.path.join(ROOT, "BENCHMARKS.jsonl"), "a") as f:
        f.write(json.dumps(rec) + "\n")
    print(json.dumps(rec))


if __name__ == "__main__":
    main()
