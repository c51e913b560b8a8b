"""Tests of the discrete time axis: snapping, restart, end-time changes.

Mirrors the reference's tests/test_discrete_time.py, with added value-level
assertions on the 5% end-time snapping rule.
"""

import numpy as np

from navierstokes_tpu.timestepping import DiscreteTime, calculate_next_time


def test_snapping_rule():
    # lands well before the end: no snap
    assert calculate_next_time(0.0, 0.5, 5.0) == 0.5
    # would land within 5% of a step of the end: snapped
    assert calculate_next_time(4.0, 0.97, 5.0) == 5.0
    assert calculate_next_time(4.9, 0.2, 5.0) == 5.0
    # exactly hitting the end: snapped
    assert calculate_next_time(4.5, 0.5, 5.0) == 5.0


def test_random_walk_to_end():
    rng = np.random.default_rng(42)
    ts = DiscreteTime(0.0, 5.0)
    assert ts.is_at_start()

    for _sweep in range(2):
        while not ts.is_at_end():
            ts.set_desired_next_step_size(float(rng.random()) + 1e-6)
            ts.advance_time()
        assert ts.is_at_end()
        assert ts.current_time == 5.0
        ts.restart()
        assert ts.is_at_start()
        assert ts.current_time == 0.0

    # extend the end time and walk again
    while not ts.is_at_end():
        ts.set_desired_next_step_size(float(rng.random()) + 1e-6)
        ts.advance_time()
    ts.set_end_time(10.0)
    assert not ts.is_at_end()
    while not ts.is_at_end():
        ts.set_desired_next_step_size(float(rng.random()) + 1e-6)
        ts.advance_time()
    assert ts.current_time == 10.0


def test_bookkeeping():
    ts = DiscreteTime(0.0, 1.0, desired_start_time_step=0.1)
    assert ts.get_next_step_size() == 0.1
    ts.advance_time()
    assert ts.step_number == 1
    assert ts.current_time == 0.1
    assert ts.previous_time == 0.0
    assert ts.get_previous_step_size() == 0.1
    assert "step number" in str(ts)
