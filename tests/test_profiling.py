"""StepTimer / trace tests."""

import time

from sug_tpu.utils.profiling import StepTimer, trace


def test_step_timer_warmup_and_rate():
    t = StepTimer(warmup=1)
    for i in range(4):
        t.start()
        time.sleep(0.01)
        t.stop(clouds=100)
    assert t.steps_timed == 3
    cps = t.clouds_per_sec()
    assert 1000 < cps < 12000  # ~100 clouds / ~0.01s, generous bounds
    assert t.ms_per_step() > 5


def test_step_timer_no_steps():
    t = StepTimer()
    assert t.clouds_per_sec() == 0.0
    assert t.ms_per_step() == 0.0


def test_trace_noop_without_dir():
    with trace(None):
        pass  # must be a no-op and not require jax.profiler
