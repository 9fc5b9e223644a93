"""Test config: run everything on a virtual 8-device CPU mesh.

Multi-chip sharding is validated without TPU hardware by forcing the host
platform to expose 8 devices (the TPU analog of "test multi-node without a
cluster" — the reference had no way to test its DDP path, which is why it
shipped broken, see SURVEY.md §3.6).

The surrounding environment may pre-import jax and register a TPU platform
plugin via sitecustomize before this file runs; in that case env tweaks are
too late, so we re-exec pytest once with a scrubbed environment (JAX on CPU,
no TPU plugin on PYTHONPATH, 8 virtual devices).
"""

import os
import sys

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _needs_reexec() -> bool:
    if os.environ.get("SUG_TPU_TEST_REEXEC") == "1":
        return False
    if os.environ.get("JAX_PLATFORMS", "") != "cpu":
        return True
    return any(
        "axon" in p for p in os.environ.get("PYTHONPATH", "").split(os.pathsep)
    )


if _needs_reexec():
    env = dict(os.environ)
    env["SUG_TPU_TEST_REEXEC"] = "1"
    env["JAX_PLATFORMS"] = "cpu"
    flags = env.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        env["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
    pythonpath = [
        p
        for p in env.get("PYTHONPATH", "").split(os.pathsep)
        if p and "axon" not in p
    ]
    pythonpath.insert(0, _REPO_ROOT)
    env["PYTHONPATH"] = os.pathsep.join(pythonpath)
    os.execve(
        sys.executable,
        [sys.executable, "-m", "pytest"] + sys.argv[1:],
        env,
    )

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(666)
