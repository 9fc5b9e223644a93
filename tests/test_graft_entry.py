"""Driver-contract robustness: dryrun_multichip must never initialize the
axon TPU backend in the parent process (a dead tunnel hangs that init — it
zeroed the round-3 MULTICHIP artifact), and its CPU subprocess must be
bounded by a hard timeout."""

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __graft_entry__ as ge  # noqa: E402


class TestCpuMeshReady:
    def test_pytest_env_is_ready(self):
        # the conftest re-exec environment: cpu backend, 8 virtual devices
        assert ge._cpu_mesh_ready(8)
        assert not ge._cpu_mesh_ready(16)

    def test_axon_env_is_not_ready(self, monkeypatch):
        monkeypatch.setenv("JAX_PLATFORMS", "axon")
        assert not ge._cpu_mesh_ready(1)
        monkeypatch.delenv("JAX_PLATFORMS")
        assert not ge._cpu_mesh_ready(1)

    def test_axon_on_pythonpath_is_not_ready(self, monkeypatch):
        monkeypatch.setenv("JAX_PLATFORMS", "cpu")
        monkeypatch.setenv(
            "PYTHONPATH", "/root/.axon_site" + os.pathsep + "/root/repo"
        )
        assert not ge._cpu_mesh_ready(8)


class TestDryrunSubprocess:
    def test_timeout_kills_and_raises(self, monkeypatch):
        # force the subprocess path and give it a timeout too short for even
        # the child's jax import — the parent must kill it and raise, not
        # hang (the round-3 failure mode at the driver's rc=124)
        monkeypatch.setenv("JAX_PLATFORMS", "axon")
        monkeypatch.setenv("SUG_DRYRUN_TIMEOUT_S", "2")
        with pytest.raises(RuntimeError, match="timed out"):
            ge.dryrun_multichip(2)

    def test_child_failure_propagates(self, monkeypatch):
        # corrupt the child env so its jax backend selection fails fast; the
        # parent must surface the child's error, not swallow it
        import subprocess as sp

        real_run = sp.run

        def corrupted(cmd, **kw):
            kw["env"] = dict(kw.get("env") or os.environ)
            kw["env"]["JAX_PLATFORMS"] = "bogus"
            return real_run(cmd, **kw)

        monkeypatch.setenv("JAX_PLATFORMS", "axon")  # force subprocess path
        monkeypatch.setenv("SUG_DRYRUN_TIMEOUT_S", "120")
        monkeypatch.setattr(sp, "run", corrupted)
        with pytest.raises(RuntimeError, match="subprocess failed"):
            ge.dryrun_multichip(2)
