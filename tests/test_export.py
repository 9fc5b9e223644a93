"""Serving export round-trips: SavedModel (jax2tf) and TFLite flatbuffer.

The reference has no serving story at all (torch .pth snapshots only);
tools/export_savedmodel.py is the deploy path, so both exports must
reproduce the jax forward on the same inputs.
"""

import os
import subprocess
import sys

import numpy as np
import pytest

tf = pytest.importorskip("tensorflow")

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


class TestTFLiteExport:
    def test_tflite_roundtrip_pointnet(self, tmp_path):
        from sug_tpu.engine.source_trainer import SourceTrainer
        from tools.export_savedmodel import export_tflite

        trainer = SourceTrainer(model_name="Pointnet")
        state = trainer.init_state(0, 2, 64)
        params, batch_stats = state.params, state.batch_stats
        fwd = lambda data: trainer.eval_apply(params, batch_stats, data)  # noqa: E731

        out = str(tmp_path / "m.tflite")
        # asserts interpreter-vs-jax max abs err < 1e-2 internally
        export_tflite(fwd, out, batch=2, points=64)
        assert os.path.getsize(out) > 1000


class TestExportCLI:
    def test_cli_savedmodel_and_tflite(self, tmp_path):
        """Full CLI: save a checkpoint, export both formats, round-trip both
        (the script asserts the errors itself and exits nonzero on failure)."""
        from sug_tpu.engine.checkpoint import save_checkpoint
        from sug_tpu.engine.source_trainer import SourceTrainer

        trainer = SourceTrainer(model_name="Pointnet")
        state = trainer.init_state(0, 2, 64)
        ckpt = save_checkpoint(str(tmp_path / "ck"), "m", 1, state, block=True)

        env = dict(os.environ)
        env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
        r = subprocess.run(
            [
                sys.executable, os.path.join(REPO, "tools/export_savedmodel.py"),
                "--ckpt", ckpt, "--model", "Pointnet",
                "--out", str(tmp_path / "sm"),
                "--batch", "2", "--points", "64",
                "--tflite", str(tmp_path / "m.tflite"), "--tflite-batch", "2",
            ],
            env=env, capture_output=True, text=True, timeout=900,
        )
        assert r.returncode == 0, r.stdout + r.stderr
        assert "round-trip max abs err" in r.stdout
        assert "TFLite round-trip max abs err" in r.stdout
        assert os.path.isdir(str(tmp_path / "sm"))
        assert os.path.getsize(str(tmp_path / "m.tflite")) > 1000
