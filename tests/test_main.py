"""CLI end-to-end tests through main(): the reference's command surface
(SURVEY.md §3.1-3.4 call stacks) at tiny scale."""

import os

import numpy as np
import pytest

from deepfluids_tpu.config import Config
from deepfluids_tpu.datagen import scenes
from deepfluids_tpu.main import main


@pytest.fixture(scope="module")
def env(tmp_path_factory):
    root = tmp_path_factory.mktemp("e2e")
    data = str(root / "data")
    scenes.smoke_pos21_size5(data, num_pos=2, num_size=2, num_frames=4,
                             height=32, width=32, name="tiny")
    return {"data": data, "logs": str(root / "logs")}


def cfg(env, **kw):
    base = dict(arch="de", filters=8, num_conv=1, z_num=8, batch_size=8,
                data_dir=env["data"], dataset="tiny", log_dir=env["logs"],
                max_step=3, lr_max=1e-3, lr_min=1e-4, log_step=1,
                test_step=1000, save_step=1000, compute_dtype="float32",
                num_worker=2, seed=0, test_batch_size=8)
    base.update(kw)
    return Config(**base)


class TestCLIFlow:
    def test_de_train_then_sweep(self, env):
        main(cfg(env, tag="de"))
        run = os.path.join(env["logs"], "tiny_de")
        assert os.path.exists(os.path.join(run, "checkpoint"))
        r = main(cfg(env, tag="de", is_train=False, load_path=run,
                     test_frames=4))
        assert r["num_fields"] > 0
        test_dir = os.path.join(run, "test")
        assert any(f.endswith(".npz") for f in os.listdir(test_dir))

    def test_ae_nn_rollout_pipeline(self, env):
        # AE train -> encode pass -> NN train -> NN test (rollout + decode)
        main(cfg(env, tag="ae", arch="ae"))
        ae_run = os.path.join(env["logs"], "tiny_ae")
        r = main(cfg(env, tag="ae", arch="ae", is_train=False,
                     load_path=ae_run))
        assert os.path.isdir(r["code_dir"])

        main(cfg(env, tag="nn", arch="nn", w_num=3))
        nn_run = os.path.join(env["logs"], "tiny_nn")
        r = main(cfg(env, tag="nn", arch="nn", is_train=False,
                     load_path=nn_run, ae_load_path=ae_run, test_frames=4))
        assert r["rollout_steps"] == 4
        out = os.path.join(nn_run, "test")
        with np.load(os.path.join(out, "rollout.npz")) as d:
            assert d["x"].shape == (4, 32, 32, 2)
            assert np.isfinite(d["x"]).all()
        assert os.path.exists(os.path.join(out, "rollout.gif"))


class TestTestTimeConfigMerge:
    """A test/sweep invocation must rebuild the TRAINED architecture from
    the run's own params.json and must NOT clobber it (regression: a bare
    `--is_train false --load_path <run>` on a non-default-arch run built a
    mismatched model, overwrote params.json, and failed restore)."""

    def test_sweep_rebuilds_trained_arch(self, env):
        import json

        main(cfg(env, tag="gridde", decoder="grid", grid_levels=2,
                 grid_features=2, grid_rank=2, filters=4))
        run = os.path.join(env["logs"], "tiny_gridde")
        with open(os.path.join(run, "params.json")) as f:
            saved = json.load(f)
        assert saved["decoder"] == "grid" and saved["filters"] == 4

        # bare test invocation: only test-surface flags set
        bare = Config(is_train=False, load_path=run, data_dir=env["data"],
                      dataset="tiny", log_dir=env["logs"], test_frames=2,
                      test_batch_size=8)
        r = main(bare)
        assert r["num_fields"] > 0
        with open(os.path.join(run, "params.json")) as f:
            after = json.load(f)
        assert after == saved   # params.json untouched by the sweep

    def test_merge_prefers_explicit_cli(self, env, tmp_path):
        # Self-contained (no dependency on the slow sweep test above): the
        # merge only needs a run dir holding a params.json.
        from deepfluids_tpu.config import merge_test_config, save_config

        run = str(tmp_path / "tiny_gridde_cfg")
        os.makedirs(run, exist_ok=True)
        save_config(cfg(env, tag="gridde", decoder="grid", grid_levels=2,
                        grid_features=2, grid_rank=2, filters=4), run)
        cli = Config(is_train=False, load_path=run, test_counts="2,1",
                     data_dir=env["data"], log_dir=env["logs"])
        merged = merge_test_config(cli, run)
        assert merged.decoder == "grid" and merged.filters == 4  # from run
        assert merged.test_counts == "2,1"                       # from CLI
        assert not merged.is_train
