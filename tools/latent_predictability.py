"""Why does one latent integrator reach its AE floor and another not?

Mechanism probe for the cfg-4 rollout gap (r4 VERDICT #2c): fit the
SIMPLEST possible integrator — one ridge-regularized linear map
[z_t, p_t, p_{t+1}] -> dz_t — on the TRAINING scenes' code sequences and
score R^2 per latent dim on the HELD-OUT scenes.  If a dataset's holdout
dynamics are much less linearly predictable from its training scenes
(mov's novel random trajectories vs a grid family's shared dynamics),
the integrator-above-AE-floor gap is a DATA novelty property, not an
integrator-capacity one — and no amount of integrator training on the
same codes will close it.

Usage: python tools/latent_predictability.py <dataset_dir> <z_num>
           [holdout_scenes] [suffix] [note]

Appends metric=latent_predictability to BENCHMARKS.jsonl.  Pure
numpy/CPU — no chip time.
"""

import json
import os
import sys
import time

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)


def design(z, p):
    """Rows [z_t, p_t, p_{t+1}] and targets dz_t for one scene."""
    x = np.concatenate([z[:-1], p[:-1], p[1:]], axis=1)
    y = z[1:] - z[:-1]
    return x, y


class Ridge:
    """Standardized ridge with intercept (train stats; the supervised
    latent dims duplicate the param columns, so plain normal equations
    are ill-conditioned without standardization + a real bias term)."""

    def fit(self, x, y, lam=1e-3):
        self.mu = x.mean(0)
        self.sd = x.std(0) + 1e-8
        xs = (x - self.mu) / self.sd
        xs = np.concatenate([xs, np.ones((len(xs), 1), xs.dtype)], 1)
        xtx = xs.T @ xs + lam * len(xs) * np.eye(xs.shape[1], dtype=x.dtype)
        self.w = np.linalg.solve(xtx, xs.T @ y)
        return self

    def predict(self, x):
        xs = (x - self.mu) / self.sd
        xs = np.concatenate([xs, np.ones((len(xs), 1), xs.dtype)], 1)
        return xs @ self.w


def r2(y, pred):
    ss_res = np.sum((y - pred) ** 2, axis=0)
    ss_tot = np.sum((y - y.mean(0)) ** 2, axis=0) + 1e-12
    return 1.0 - ss_res / ss_tot


def main():
    if len(sys.argv) < 3:
        print(__doc__, file=sys.stderr)
        raise SystemExit(2)
    dataset_dir = sys.argv[1]
    z_num = int(sys.argv[2])
    holdout = int(sys.argv[3]) if len(sys.argv) > 3 else 5
    suffix = sys.argv[4] if len(sys.argv) > 4 else ""
    note = sys.argv[5] if len(sys.argv) > 5 else ""

    from deepfluids_tpu.data.dataset import CodeDataset

    cd = CodeDataset(dataset_dir, z_num, holdout_scenes=holdout,
                     suffix=suffix)
    tr = [design(cd.z[i], cd.p[i]) for i in cd.train_scene_indices]
    ho = [design(cd.z[i], cd.p[i]) for i in cd.eval_scene_indices]
    xt = np.concatenate([a for a, _ in tr])
    yt = np.concatenate([b for _, b in tr])
    m = Ridge().fit(xt, yt)
    r2_train = r2(yt, m.predict(xt))
    xh = np.concatenate([a for a, _ in ho])
    yh = np.concatenate([b for _, b in ho])
    r2_hold = r2(yh, m.predict(xh))
    # Per-scene spread on the holdout (novelty varies by scene).
    per_scene = [float(np.median(r2(b, m.predict(a)))) for a, b in ho]
    rec = {
        "metric": "latent_predictability",
        "dataset": os.path.basename(dataset_dir),
        "code_set": f"code{z_num}{suffix}",
        "holdout_scenes": holdout,
        "r2_train_median": round(float(np.median(r2_train)), 4),
        "r2_holdout_median": round(float(np.median(r2_hold)), 4),
        "r2_holdout_per_scene": [round(v, 4) for v in per_scene],
        "note": note,
        "ts": time.strftime("%Y-%m-%d %H:%M:%S"),
    }
    with open(os.path.join(ROOT, "BENCHMARKS.jsonl"), "a") as f:
        f.write(json.dumps(rec) + "\n")
    print(json.dumps(rec))


if __name__ == "__main__":
    main()
