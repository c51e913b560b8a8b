"""Tests for EquationCoefficientHandler and AngularVelocityVector.

Mirrors the reference's tests/test_auxiliary_classes.py: coefficient values
for each (Re, Fr, Ro, Ek) combination, the over-constraint rule, and the
angular-velocity wrapper with/without a derivative.
"""

import math

import pytest

from navierstokes_tpu.problems import (AngularVelocityVector,
                                       EquationCoefficientHandler,
                                       FunctionTime)


def test_plain_reynolds():
    h = EquationCoefficientHandler(Re=25.0)
    c = h.equation_coefficients
    assert c["convective_term"] == 1.0
    assert c["pressure_term"] == 1.0
    assert c["viscous_term"] == 1.0 / 25.0
    assert c["coriolis_term"] is None
    assert c["euler_term"] is None
    assert c["body_force_term"] is None


def test_reynolds_froude():
    h = EquationCoefficientHandler(Reynolds=100.0, Froude=2.0)
    c = h.equation_coefficients
    assert c["viscous_term"] == 1.0 / 100.0
    assert c["body_force_term"] == 1.0 / 4.0


def test_rotating_combinations():
    c = EquationCoefficientHandler(Re=1000.0, Ro=2.0).equation_coefficients
    assert c["coriolis_term"] == 0.5 and c["euler_term"] == 0.5
    assert c["viscous_term"] == 1.0e-3

    c = EquationCoefficientHandler(Ro=2.0, Ek=0.5).equation_coefficients
    assert c["coriolis_term"] == 0.5
    assert c["viscous_term"] == 0.25

    c = EquationCoefficientHandler(Ek=0.1, Re=10.0).equation_coefficients
    assert c["coriolis_term"] == 1.0
    assert c["viscous_term"] == 0.1

    c = EquationCoefficientHandler(Ek=0.25).equation_coefficients
    assert c["coriolis_term"] == 1.0 and c["viscous_term"] == 0.25

    c = EquationCoefficientHandler(Ro=4.0).equation_coefficients
    assert c["coriolis_term"] == 0.25 and c["viscous_term"] == 1.0


def test_overconstrained():
    h = EquationCoefficientHandler(Re=1.0, Ro=1.0, Ek=1.0)
    with pytest.raises(RuntimeError):
        _ = h.equation_coefficients


def test_lifecycle_and_suffix():
    h = EquationCoefficientHandler(Re=100.0)
    h.close()
    with pytest.raises(RuntimeError):
        h.Re = 50.0
    h.modify_dimensionless_number("Re", 50.0)  # continuation stays allowed
    assert h.Re == 50.0
    assert h.get_file_suffix() == "_Re5.000e+01"
    assert "dimensionless numbers" in str(h)
    h.clear()
    h.Re = 10.0
    h.Fr = 2.0
    assert h.get_file_suffix() == "_Re1.000e+01_Fr2.000e+00"


class _SpinUp(FunctionTime):
    def __init__(self):
        super().__init__(1)

    def value(self):
        return math.tanh(self.current_time)

    def derivative(self):
        return 1.0 - math.tanh(self.current_time) ** 2


class _ConstantRate(FunctionTime):
    def __init__(self):
        super().__init__(1)

    def value(self):
        return 1.0


def test_angular_velocity_with_derivative():
    omega = AngularVelocityVector(2, function=_SpinUp())
    assert omega.space_dim == 2
    assert omega.value == 0.0
    assert omega.derivative == 1.0
    omega.set_time(1.0)
    assert omega.value == pytest.approx(math.tanh(1.0))
    assert omega.derivative == pytest.approx(1.0 - math.tanh(1.0) ** 2)


def test_angular_velocity_without_derivative():
    omega = AngularVelocityVector(2, function=_ConstantRate())
    assert omega.value == 1.0
    assert omega.derivative is None
    omega.set_time(2.0)
    assert omega.value == 1.0
