"""Golden-value tests for variable-step IMEX coefficient families.

Tables mirror the reference's tier-1 tests (tests/test_imex_time_stepping.py)
for SBDF2 / CNAB / mCNAB / CNLF on the canonical variable-step schedule.
"""

from navierstokes_tpu.timestepping import IMEXTimeStepping, IMEXType

STEP_SIZES = [1.0, 1.0, 2.0, 2.0, 1.0, 1.0, 1.0]

ETA = [[1.0, 0.0],
       [2.0, -1.0],
       [3.0, -2.0],
       [2.0, -1.0],
       [1.5, -0.5],
       [2.0, -1.0],
       [2.0, -1.0]]

CHANGED = [True, True, True, True, True, True, False]


def run_schedule(ts, alpha, beta, gamma):
    for _sweep in range(2):
        while not ts.is_at_end():
            n = ts.step_number
            ts.set_desired_next_step_size(STEP_SIZES[n])
            ts.update_coefficients()
            assert ts.alpha == alpha[n], f"step {n}: {ts.alpha} != {alpha[n]}"
            assert ts.beta == beta[n]
            assert ts.gamma == gamma[n]
            assert ts.eta == ETA[n]
            assert ts.coefficients_changed == CHANGED[n]
            ts.advance_time()
        assert ts.is_at_end()
        ts.restart()
    assert isinstance(ts.coefficient_table(), str)


def test_sbdf2():
    ts = IMEXTimeStepping(0.0, 9.0, IMEXType.SBDF2)
    alpha = [[1.0, -1.0, 0.0],
             [1.5, -2.0, 0.5],
             [5.0 / 3.0, -3.0, 4.0 / 3.0],
             [1.5, -2.0, 0.5],
             [4.0 / 3.0, -1.5, 1.0 / 6.0],
             [1.5, -2.0, 0.5],
             [1.5, -2.0, 0.5]]
    beta = [[1.0, 0.0],
            [2.0, -1.0],
            [3.0, -2.0],
            [2.0, -1.0],
            [1.5, -0.5],
            [2.0, -1.0],
            [2.0, -1.0]]
    gamma = [[1.0, 0.0, 0.0]] * 7
    run_schedule(ts, alpha, beta, gamma)


def test_cnab():
    ts = IMEXTimeStepping(0.0, 9.0, IMEXType.CNAB)
    alpha = [[1.0, -1.0, 0.0]] * 7
    beta = [[1.0, 0.0],
            [1.5, -0.5],
            [2.0, -1.0],
            [1.5, -0.5],
            [1.25, -0.25],
            [1.5, -0.5],
            [1.5, -0.5]]
    gamma = [[1.0, 0.0, 0.0]] + [[0.5, 0.5, 0.0]] * 6
    run_schedule(ts, alpha, beta, gamma)


def test_mcnab():
    ts = IMEXTimeStepping(0.0, 9.0, IMEXType.mCNAB)
    alpha = [[1.0, -1.0, 0.0]] * 7
    beta = [[1.0, 0.0],
            [1.5, -0.5],
            [2.0, -1.0],
            [1.5, -0.5],
            [1.25, -0.25],
            [1.5, -0.5],
            [1.5, -0.5]]
    gamma = [[1.0, 0.0, 0.0],
             [9.0 / 16.0, 6.0 / 16.0, 1.0 / 16.0],
             [17.0 / 32.0, 13.0 / 32.0, 1.0 / 16.0],
             [9.0 / 16.0, 6.0 / 16.0, 1.0 / 16.0],
             [5.0 / 8.0, 2.5 / 8.0, 1.0 / 16.0],
             [9.0 / 16.0, 6.0 / 16.0, 1.0 / 16.0],
             [9.0 / 16.0, 6.0 / 16.0, 1.0 / 16.0]]
    run_schedule(ts, alpha, beta, gamma)


def test_cnlf():
    ts = IMEXTimeStepping(0.0, 9.0, IMEXType.CNLF)
    alpha = [[1.0, -1.0, 0.0],
             [1.0 / 2.0, 0.0, -1.0 / 2.0],
             [1.0 / 3.0, 1.0, -4.0 / 3.0],
             [1.0 / 2.0, 0.0, -1.0 / 2.0],
             [2.0 / 3.0, -0.5, -1.0 / 6.0],
             [1.0 / 2.0, 0.0, -1.0 / 2.0],
             [1.0 / 2.0, 0.0, -1.0 / 2.0]]
    beta = [[1.0, 0.0]] * 7
    gamma = [[1.0, 0.0, 0.0],
             [1.0 / 2.0, 0.0, 1.0 / 2.0],
             [1.0 / 4.0, 1.0 / 4.0, 1.0 / 2.0],
             [1.0 / 2.0, 0.0, 1.0 / 2.0],
             [1.0, -1.0 / 2.0, 1.0 / 2.0],
             [1.0 / 2.0, 0.0, 1.0 / 2.0],
             [1.0 / 2.0, 0.0, 1.0 / 2.0]]
    run_schedule(ts, alpha, beta, gamma)
