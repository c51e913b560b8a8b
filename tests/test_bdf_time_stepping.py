"""Golden-value tests for variable-step BDF coefficients.

The step schedule and the hand-derived rational coefficient tables mirror the
reference's tier-1 unit tests (reference: tests/test_bdf_time_stepping.py),
which pin down the exact variable-step BDF-1/BDF-2 weights for the 1st and
2nd derivative, the change-tracking flags, and restart idempotence.
"""

from navierstokes_tpu.timestepping import BDFTimeStepping

STEP_SIZES = [1.0, 1.0, 2.0, 2.0, 1.0, 1.0, 1.0]


def run_schedule(time_stepping, alpha, changed):
    """Drive the schedule twice (with a restart in between)."""
    for _sweep in range(2):
        while not time_stepping.is_at_end():
            n = time_stepping.step_number
            time_stepping.set_desired_next_step_size(STEP_SIZES[n])
            time_stepping.update_coefficients()
            for d in (1, 2):
                assert time_stepping.coefficients(d) == tuple(alpha[d][n]), (
                    f"derivative {d}, step {n}: "
                    f"{time_stepping.coefficients(d)} != {alpha[d][n]}")
                assert time_stepping.coefficients_changed(d) == changed[d][n]
            time_stepping.advance_time()
        assert time_stepping.is_at_end()
        time_stepping.restart()


def test_first_order():
    ts = BDFTimeStepping(0.0, 9.0, order=1)
    alpha = {
        1: [[1.0, -1.0]] * 7,
        2: [[1.0, -2.0, 1.0],
            [1.0, -2.0, 1.0],
            [4.0 / 3.0, -4.0, 8.0 / 3.0],
            [1.0, -2.0, 1.0],
            [2.0 / 3.0, -1.0, 1.0 / 3.0],
            [1.0, -2.0, 1.0],
            [1.0, -2.0, 1.0]],
    }
    changed = {1: [True, False, False, False, False, False, False],
               2: [True, True, True, True, True, True, False]}
    run_schedule(ts, alpha, changed)


def test_second_order():
    ts = BDFTimeStepping(0.0, 9.0, order=2)
    alpha = {
        1: [[1.0, -1.0, 0.0],
            [3.0 / 2.0, -2.0, 1.0 / 2.0],
            [5.0 / 3.0, -3.0, 4.0 / 3.0],
            [3.0 / 2.0, -2.0, 1.0 / 2.0],
            [4.0 / 3.0, -3.0 / 2.0, 1.0 / 6.0],
            [3.0 / 2.0, -2.0, 1.0 / 2.0],
            [3.0 / 2.0, -2.0, 1.0 / 2.0]],
        2: [[1.0, -2.0, 1.0, 0.0],
            [2.0, -5.0, 4.0, -1.0],
            [3.0, -14.0, 16.0, -5.0],
            [11.0 / 5.0, -6.0, 7.0, -16.0 / 5.0],
            [6.0 / 5.0, -2.0, 1.0, -1.0 / 5.0],
            [7.0 / 4.0, -4.0, 5.0 / 2.0, -1.0 / 4.0],
            [2.0, -5.0, 4.0, -1.0]],
    }
    changed = {1: [True, True, True, True, True, True, False],
               2: [True, True, True, True, True, True, True]}
    run_schedule(ts, alpha, changed)


def test_levels_and_substeps():
    ts = BDFTimeStepping(0.0, 1.0, order=2)
    assert ts.n_levels(1) == 2
    assert ts.n_levels(2) == 3
    assert ts.n_substeps == 1
    assert isinstance(ts.coefficient_table(), str)
