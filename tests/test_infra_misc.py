"""Infrastructure edge cases: metrics writer, exp folders, config lists,
native iterator reset."""

import json
import os

import numpy as np
import pytest

from sug_tpu.utils.config import ConfigDict, cfg_from_list
from sug_tpu.utils.logging import MetricsWriter, exp_log_folder_creator


class TestMetricsWriter:
    def test_jsonl_mirror(self, tmp_path):
        w = MetricsWriter(str(tmp_path))
        w.add_scalar("loss/train", 1.5, 0)
        w.add_scalar("loss/train", 1.2, 1)
        w.close()
        lines = [
            json.loads(l)
            for l in open(tmp_path / "metrics.jsonl")
        ]
        assert lines[0] == {"tag": "loss/train", "value": 1.5, "step": 0}
        assert lines[1]["value"] == 1.2


class TestExpFolders:
    def test_layout_and_collision_suffix(self, tmp_path):
        cfg = ConfigDict(
            DATA_ROOT=str(tmp_path / "mydata"), EXTRA_TAG="tag", EXPERIMENT="exp"
        )
        out1, ckpt1 = exp_log_folder_creator(cfg, extra_tag="modelnet")
        assert os.path.isdir(out1) and os.path.isdir(ckpt1)
        assert "output/tag/modelnet" in out1.replace(os.sep, "/")
        # second call collides -> timestamped subdir
        out2, ckpt2 = exp_log_folder_creator(cfg, extra_tag="modelnet")
        assert out2 != out1 and os.path.isdir(out2)

    def test_pointda_suffix_when_no_data_in_root(self, tmp_path):
        cfg = ConfigDict(DATA_ROOT=str(tmp_path / "xyz"), EXTRA_TAG="t", EXPERIMENT="e")
        out, _ = exp_log_folder_creator(cfg)
        assert "PointDA_data" in out


class TestConfigListOverride:
    def test_list_override_via_set(self):
        cfg = ConfigDict({"A": {"LIST": [1, 2, 3]}})
        cfg_from_list(["A.LIST", "4,5"], cfg)
        assert cfg.A.LIST == [4, 5]

    def test_nested_dict_kv_override(self):
        cfg = ConfigDict({"A": {"B": {"x": 1, "y": 2.0}}})
        cfg_from_list(["A.B", "x:7,y:3.5"], cfg)
        assert cfg.A.B.x == 7
        assert cfg.A.B.y == 3.5


@pytest.mark.skipif(
    not __import__("sug_tpu.native", fromlist=["is_available"]).is_available(),
    reason="native loader not built",
)
def test_native_iterator_multi_epoch(tmp_path, rng):
    from sug_tpu import native

    pts = rng.normal(size=(24, 16, 3)).astype(np.float32)
    labels = rng.integers(0, 10, 24)
    np.save(tmp_path / "p.npy", pts)
    np.save(tmp_path / "l.npy", labels)
    ds = native.NativePointCloudDataset(
        str(tmp_path / "p.npy"), str(tmp_path / "l.npy"), num_points=16
    )
    it = native.NativeBatchIterator(ds, batch_size=8, seed=5)
    for epoch in range(3):  # reset works across epochs
        batches = list(it)
        assert len(batches) == 3
        assert all(b[0].shape == (8, 16, 3) for b in batches)


class TestBenchRetry:
    """bench.measure_with_retry: transient tunnel errors retried, the
    MFU-sanity MethodologyError never (a broken timing must not be retried
    into a 'success')."""

    def _bench(self):
        import importlib.util

        spec = importlib.util.spec_from_file_location(
            "bench", os.path.join(os.path.dirname(os.path.dirname(
                os.path.abspath(__file__))), "bench.py")
        )
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        return mod

    def test_transient_errors_retried(self, monkeypatch):
        bench = self._bench()
        calls = {"n": 0}

        def flaky(**kw):
            calls["n"] += 1
            if calls["n"] < 3:
                raise ValueError("tunnel down")
            return {"ok": True}

        monkeypatch.setattr(bench, "measure", flaky)
        assert bench.measure_with_retry(attempts=3, wait_s=0.0) == {"ok": True}
        assert calls["n"] == 3

    def test_methodology_error_propagates_immediately(self, monkeypatch):
        bench = self._bench()
        calls = {"n": 0}

        def gate(**kw):
            calls["n"] += 1
            raise bench.MethodologyError("implied MFU 230%")

        monkeypatch.setattr(bench, "measure", gate)
        with pytest.raises(bench.MethodologyError):
            bench.measure_with_retry(attempts=3, wait_s=0.0)
        assert calls["n"] == 1

    def test_exhausted_retries_raise_last_error(self, monkeypatch):
        bench = self._bench()

        def dead(**kw):
            raise ConnectionError("refused")

        monkeypatch.setattr(bench, "measure", dead)
        with pytest.raises(ConnectionError):
            bench.measure_with_retry(attempts=2, wait_s=0.0)
