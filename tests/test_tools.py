"""Tests for the repo-root benchmark/eval tools (tools/rollout_eval.py).

The rollout scorer backs the rollout_field_l2 records in BENCHMARKS.jsonl
(VERDICT round-2 weak #7 drift tracking), so its metric math and its
scene/frame resolution logic get pinned here on a synthetic run dir.
"""

import json
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))

from tools import rollout_eval  # noqa: E402


def _make_fixture(tmp_path, scene="0", other_scene="10", T=8, res=(4, 6),
                  C=2, z_num=16, drift=0.0):
    """Synthetic dataset + nn-run dir in the rollout.npz contract
    (main.py arch-nn test path): returns (run_dir, expected per-frame l2)."""
    rng = np.random.default_rng(3)
    ds = tmp_path / "data" / "toy"
    (ds / "v").mkdir(parents=True)
    code = ds / f"code{z_num}"
    code.mkdir()
    # Two code scenes: the scorer must pick the lexicographically FIRST.
    np.savez_compressed(code / f"{scene}.npz", z=np.zeros((T, z_num)))
    np.savez_compressed(code / f"{other_scene}.npz", z=np.zeros((T, z_num)))

    gt = rng.normal(size=(T, *res, C)).astype(np.float32)
    for t in range(T):
        np.savez_compressed(ds / "v" / f"{scene}_{t}.npz", x=gt[t])
        # Decoy frames of the other scene — the stem filter must skip them.
        np.savez_compressed(ds / "v" / f"{other_scene}_{t}.npz",
                            x=gt[t] * 7.0)

    err = rng.normal(size=gt.shape).astype(np.float32)
    err *= drift * np.arange(1, T + 1, dtype=np.float32)[:, None, None, None]
    roll = gt + err

    run = tmp_path / "logs" / "toy_nn"
    (run / "test").mkdir(parents=True)
    np.savez_compressed(run / "test" / "rollout.npz",
                        z=np.zeros((T, z_num)), x=roll)
    with open(run / "params.json", "w") as f:
        json.dump({"arch": "nn", "dataset": "toy",
                   "data_dir": str(tmp_path / "data"), "z_num": z_num}, f)

    l2 = [np.linalg.norm(roll[t].astype(np.float64) - gt[t].astype(np.float64))
          / np.linalg.norm(gt[t].astype(np.float64)) for t in range(T)]
    return str(run), np.asarray(l2)


class TestRolloutEval:
    def test_metric_matches_hand_computation(self, tmp_path, monkeypatch):
        run, l2 = _make_fixture(tmp_path, drift=0.05)
        # ROOT anchors BENCHMARKS.jsonl and relative data_dir resolution;
        # point it at tmp so the repo log is untouched.
        monkeypatch.setattr(rollout_eval, "ROOT", str(tmp_path))
        rec = rollout_eval.main([run, "unit test"])
        assert rec["metric"] == "rollout_field_l2"
        assert rec["scene"] == "0"
        assert rec["rollout_steps"] == len(l2)
        assert rec["l2_median"] == pytest.approx(np.median(l2), abs=1e-4)
        q = len(l2) // 4
        assert rec["l2_firstq_median"] == pytest.approx(
            np.median(l2[:q]), abs=1e-4)
        assert rec["l2_lastq_median"] == pytest.approx(
            np.median(l2[-q:]), abs=1e-4)
        assert rec["l2_max"] == pytest.approx(l2.max(), abs=1e-4)
        # drift grows with t, so the last-quarter median must exceed first's
        assert rec["l2_lastq_median"] > rec["l2_firstq_median"]
        with open(tmp_path / "BENCHMARKS.jsonl") as f:
            logged = json.loads(f.read().strip())
        assert logged == rec

    def test_perfect_rollout_scores_zero(self, tmp_path, monkeypatch):
        run, _ = _make_fixture(tmp_path, drift=0.0)
        monkeypatch.setattr(rollout_eval, "ROOT", str(tmp_path))
        rec = rollout_eval.main([run])
        assert rec["l2_median"] == 0.0 and rec["l2_max"] == 0.0

    def test_relative_data_dir_resolves_against_root(self, tmp_path,
                                                     monkeypatch):
        run, l2 = _make_fixture(tmp_path)
        # Rewrite params.json with the production-default relative
        # data_dir; resolution must go through ROOT, not cwd.
        p = os.path.join(run, "params.json")
        with open(p) as f:
            d = json.load(f)
        d["data_dir"] = "data"
        with open(p, "w") as f:
            json.dump(d, f)
        monkeypatch.setattr(rollout_eval, "ROOT", str(tmp_path))
        monkeypatch.chdir(tmp_path / "logs")  # anywhere but ROOT
        rec = rollout_eval.main([run])
        assert rec["l2_median"] == pytest.approx(np.median(l2), abs=1e-4)

    def test_horizon_clips_to_shorter_side(self, tmp_path, monkeypatch):
        run, _ = _make_fixture(tmp_path, T=8)
        # Truncate the rollout to 5 frames: T must clip to 5.
        p = os.path.join(run, "test", "rollout.npz")
        with np.load(p) as d:
            np.savez_compressed(p, z=d["z"][:5], x=d["x"][:5])
        monkeypatch.setattr(rollout_eval, "ROOT", str(tmp_path))
        rec = rollout_eval.main([run])
        assert rec["rollout_steps"] == 5
