"""Golden-value tests for the generalized theta schemes.

Mirrors the reference's tier-1 tests (tests/test_theta_time_stepping.py):
substep tableaus, intermediate times, and substep sizes for all five scheme
types on the canonical variable-step schedule.
"""

import math

from navierstokes_tpu.timestepping import (GeneralThetaTimeStepping,
                                           ThetaTimeSteppingType)

STEP_SIZES = [1.0, 1.0, 2.0, 2.0, 1.0, 1.0, 1.0]

THETA = 1.0 - math.sqrt(2.0) / 2.0
ZETA = 1.0 - 2.0 * THETA
TAU = ZETA / (1.0 - THETA)
ETA = 1.0 - TAU


def run_schedule(ts, theta, times, timesteps):
    for _sweep in range(2):
        while not ts.is_at_end():
            n = ts.step_number
            ts.set_desired_next_step_size(STEP_SIZES[n])
            ts.update_coefficients()
            assert ts.theta == theta[n]
            assert ts.intermediate_times == times[n]
            assert ts.intermediate_timesteps == timesteps[n]
            ts.advance_time()
        assert ts.is_at_end()
        ts.restart()


def single_step_schedule():
    """(times, timesteps) for the 1-substep schemes."""
    timesteps = [[k] for k in STEP_SIZES]
    times = []
    t = 0.0
    for k in STEP_SIZES:
        times.append([[t], [t + k]])
        t += k
    return times, timesteps


def fractional_schedule():
    """(times, timesteps) for the 3-substep schemes."""
    timesteps = [[THETA * k, ZETA * k, THETA * k] for k in STEP_SIZES]
    times = []
    t = 0.0
    for k in STEP_SIZES:
        t1 = t + k
        times.append([[t, t + THETA * k, t1 - THETA * k],
                      [t + THETA * k, t1 - THETA * k, t1]])
        t = t1
    return times, timesteps


def test_forward_euler():
    ts = GeneralThetaTimeStepping(0.0, 9.0, ThetaTimeSteppingType.ForwardEuler)
    times, timesteps = single_step_schedule()
    run_schedule(ts, [[(0.0, 1.0, 1.0, 0.0)]] * 7, times, timesteps)


def test_backward_euler():
    ts = GeneralThetaTimeStepping(0.0, 9.0,
                                  ThetaTimeSteppingType.BackwardEuler)
    times, timesteps = single_step_schedule()
    run_schedule(ts, [[(1.0, 0.0, 0.0, 1.0)]] * 7, times, timesteps)


def test_crank_nicolson():
    ts = GeneralThetaTimeStepping(0.0, 9.0,
                                  ThetaTimeSteppingType.CrankNicolson)
    times, timesteps = single_step_schedule()
    run_schedule(ts, [[(0.5, 0.5, 0.5, 0.5)]] * 7, times, timesteps)


def test_fractional_step01():
    ts = GeneralThetaTimeStepping(0.0, 9.0,
                                  ThetaTimeSteppingType.FractionalStep01)
    tableau = [(TAU * THETA, ETA * THETA, ETA * THETA, TAU * THETA),
               (ETA * ZETA, TAU * ZETA, TAU * ZETA, ETA * ZETA),
               (TAU * THETA, ETA * THETA, ETA * THETA, TAU * THETA)]
    times, timesteps = fractional_schedule()
    run_schedule(ts, [tableau] * 7, times, timesteps)


def test_fractional_step02():
    ts = GeneralThetaTimeStepping(0.0, 9.0,
                                  ThetaTimeSteppingType.FractionalStep02)
    tableau = [(TAU * THETA, ETA * THETA, THETA, 0.0),
               (ETA * ZETA, TAU * ZETA, 0.0, ZETA),
               (TAU * THETA, ETA * THETA, THETA, 0.0)]
    times, timesteps = fractional_schedule()
    run_schedule(ts, [tableau] * 7, times, timesteps)
