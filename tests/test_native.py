"""Native .npz loader tests: correctness vs numpy, fallback behavior
(SURVEY.md §3.1 input-bottleneck component)."""

import os

import numpy as np
import pytest

from deepfluids_tpu.data import native_npz


@pytest.fixture(scope="module")
def npz_files(tmp_path_factory):
    d = tmp_path_factory.mktemp("npz")
    rng = np.random.default_rng(0)
    files = []
    for i in range(6):
        x = rng.normal(size=(24, 16, 2)).astype(np.float32)
        y = np.array([0.5, 0.1, float(i)])  # float64 entry
        p = str(d / f"{i}.npz")
        np.savez_compressed(p, x=x, y=y)
        files.append((p, x, y))
    return files


class TestNativeLoader:
    def test_build_and_availability(self):
        # g++ + zlib are in the image; the build must succeed here.
        assert native_npz.native_available()

    def test_single_f32_and_f64(self, npz_files):
        for p, x, y in npz_files:
            np.testing.assert_array_equal(native_npz.load_npz_field(p, "x"),
                                          x)
            got_y = native_npz.load_npz_field(p, "y")
            assert got_y.dtype == np.float32
            np.testing.assert_allclose(got_y, y.astype(np.float32))

    def test_batch(self, npz_files):
        paths = [p for p, _, _ in npz_files]
        b = native_npz.load_npz_batch(paths, "x", (24, 16, 2),
                                      num_threads=4)
        assert b.shape == (6, 24, 16, 2) and b.dtype == np.float32
        for i, (_, x, _) in enumerate(npz_files):
            np.testing.assert_array_equal(b[i], x)

    def test_missing_member_falls_back(self, npz_files, tmp_path):
        # uncompressed savez (method 0 "stored") must also work
        p = str(tmp_path / "stored.npz")
        x = np.arange(12, dtype=np.float32).reshape(3, 4)
        np.savez(p, x=x)
        np.testing.assert_array_equal(native_npz.load_npz_field(p, "x"), x)

    def test_field_dataset_uses_it(self, tmp_path):
        from deepfluids_tpu.data import FieldDataset
        from deepfluids_tpu.data.manifest import Manifest, save_manifest

        ds_dir = str(tmp_path / "ds")
        os.makedirs(os.path.join(ds_dir, "v"))
        x = np.random.default_rng(1).normal(size=(8, 8, 2)).astype(np.float32)
        np.savez_compressed(os.path.join(ds_dir, "v", "0_0.npz"), x=x,
                            y=np.zeros(3))
        save_manifest(Manifest(
            param_names=["a", "b", "frame"],
            param_ranges=[[0, 1], [0, 1], [0, 1]], num_scenes=1,
            num_frames=1, resolution=[8, 8], num_channels=2,
            v_range=[-1, 1]), ds_dir)
        ds = FieldDataset(ds_dir)
        got, _ = ds.get(0)
        np.testing.assert_array_equal(got, x)

    def test_batch_rejects_mismatched_shapes(self, tmp_path):
        # A file with fewer elements than the batch stride must not
        # silently part-fill its row (native returns -6 -> numpy fallback
        # raises a shape error instead of passing garbage).
        p1 = str(tmp_path / "a_0.npz")
        p2 = str(tmp_path / "a_1.npz")
        np.savez_compressed(p1, x=np.zeros((4, 4), np.float32))
        np.savez_compressed(p2, x=np.zeros((2, 2), np.float32))
        with pytest.raises(Exception):
            native_npz.load_npz_batch([p1, p2], "x", (4, 4))


class TestRobustness:
    def test_empty_batch_returns_empty(self):
        out = native_npz.load_npz_batch([], "x", (4, 4))
        assert out.shape == (0, 4, 4) and out.dtype == np.float32

    def test_nine_dim_array_falls_back(self, tmp_path):
        """>8-dim members are rejected by the C parser BEFORE writing past
        its 8-slot shape buffer; the numpy fallback returns the data."""
        x = np.arange(3, dtype=np.float32).reshape((1,) * 8 + (3,))
        p = str(tmp_path / "deep.npz")
        np.savez(p, x=x)
        out = native_npz.load_npz_field(p, "x")
        np.testing.assert_array_equal(out, x)

    def test_truncated_zip_falls_back_or_raises_cleanly(self, tmp_path):
        """A truncated central directory must not crash the process."""
        x = np.arange(64, dtype=np.float32)
        p = str(tmp_path / "trunc.npz")
        np.savez(p, x=x)
        raw = open(p, "rb").read()
        pt = str(tmp_path / "cut.npz")
        open(pt, "wb").write(raw[:-7])  # clip the tail of the EOCD/CD
        try:
            native_npz.load_npz_field(pt, "x")
        except Exception:
            pass  # clean Python-level failure is fine; a segfault is not
