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

    def test_random_seed_creatable_and_wins(self):
        """--set RANDOM_SEED N is creatable (absent from every shipped
        YAML) and beats --fix_random_seed in resolve_seed — the multi-seed
        A/B matrices need per-run explicit seeds."""
        import argparse

        from sug_tpu.utils.config import resolve_seed

        cfg = ConfigDict({"LOCAL_RANK": 0})
        cfg_from_list(["RANDOM_SEED", "1234"], cfg)
        assert cfg.RANDOM_SEED == 1234
        args = argparse.Namespace(fix_random_seed=True)
        assert resolve_seed(args, cfg) == 1234
        del cfg["RANDOM_SEED"]
        assert resolve_seed(args, cfg) == 666


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


class TestBenchOutageRobustness:
    """bench.py's driver contract: the parent never imports jax and ALWAYS
    prints one parseable JSON line within its deadline — a real number, or a
    structured failure — even when backend init hangs forever (the round-3
    failure mode: a dead axon tunnel hung one init attempt for 27 min and
    the round's artifact recorded rc=124 with no output)."""

    BENCH = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "bench.py"
    )

    def _run(self, fake: str, deadline: str, timeout: float = 120.0):
        import json
        import subprocess
        import sys
        import time

        env = dict(os.environ)
        env["SUG_BENCH_FAKE"] = fake
        env["SUG_BENCH_DEADLINE_S"] = deadline
        t0 = time.time()
        proc = subprocess.run(
            [sys.executable, self.BENCH], env=env, timeout=timeout,
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
        )
        assert proc.returncode == 0, proc.stderr[-2000:]
        line = proc.stdout.strip().splitlines()[-1]
        return json.loads(line), time.time() - t0

    def test_hung_backend_fails_fast_with_structured_json(self):
        # probe child sleeps forever (simulated dead tunnel); the parent must
        # kill it at the deadline-derived timeout and print a parseable
        # structured failure — NOT hang until the driver's rc=124.
        out, dt = self._run(fake="hang", deadline="12", timeout=90.0)
        assert out["value"] is None
        assert out["vs_baseline"] is None
        assert "error" in out and "unreachable" in out["error"]
        assert out["stage"] == "probe"
        assert dt < 60, f"structured failure took {dt:.0f}s"

    def test_fake_ok_prints_headline_json(self):
        out, _ = self._run(fake="ok", deadline="600")
        assert out["value"] == pytest.approx(1280.0)
        assert out["unit"] == "clouds/sec/chip"
        assert "error" not in out

    def test_methodology_error_never_retried(self):
        import time

        t0 = time.time()
        out, _ = self._run(fake="methodology", deadline="600")
        assert out["value"] is None
        assert "impossible MFU" in out["error"] or "fake" in out["error"]
        # no retry sleeps: two measure children, each failing instantly
        assert time.time() - t0 < 90

    def test_crashing_child_fails_structured(self):
        out, _ = self._run(fake="fail", deadline="600")
        assert out["value"] is None and out["stage"] == "probe"
