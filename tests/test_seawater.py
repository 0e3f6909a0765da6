"""PSS-78 SP_from_C validation against published standards."""

import numpy as np
import jax.numpy as jnp

from axctdprocessor_tpu.ops import seawater


def test_pss78_definition_point():
    # By construction of PSS-78: R=1, t68=15, p=0 -> SP = 35 exactly
    # (sum of a_i = 35, sum of b_i = 0).
    assert abs(sum(seawater.A) - 35.0) < 1e-12
    assert abs(sum(seawater.B)) < 1e-12
    c = seawater.C3515
    t90 = 15.0 / 1.00024
    # rt(t) is a fitted polynomial, equal to 1 at t68=15 only to ~1e-7
    assert abs(seawater.sp_from_c_np(c, t90, 0.0) - 35.0) < 5e-7


def test_unesco_check_values():
    # Canonical SAL78 check values (UNESCO tech. papers 44, Fofonoff &
    # Millard 1983): (R, t68, p) -> SP.
    checks = [
        (1.0, 15.0, 0.0, 35.000000),
        (1.2, 20.0, 2000.0, 37.245628),
        (0.65, 5.0, 1500.0, 27.995347),
    ]
    for r, t68, p, sp_expected in checks:
        c = r * seawater.C3515
        t90 = t68 / 1.00024
        sp = float(seawater.sp_from_c_np(c, t90, p))
        assert abs(sp - sp_expected) < 5e-6, (r, t68, p, sp)


def test_jax_matches_numpy_f64():
    rng = np.random.default_rng(0)
    c = rng.uniform(0.5, 60.0, size=256)
    t = rng.uniform(-2.0, 35.0, size=256)
    p = rng.uniform(0.0, 2000.0, size=256)
    sp_np = seawater.sp_from_c_np(c, t, p)
    sp_jax = np.asarray(seawater.sp_from_c(jnp.float64(c), jnp.float64(t), jnp.float64(p)))
    np.testing.assert_array_equal(sp_np, sp_jax)


def test_hill_correction_continuity():
    # SP crosses 2 smoothly: scan conductivities bracketing SP=2 and check
    # there is no jump larger than the local increment.
    t, p = 10.0, 50.0
    c = np.linspace(1.5, 3.0, 20001)
    sp = seawater.sp_from_c_np(c, np.full_like(c, t), np.full_like(c, p))
    dsp = np.diff(sp)
    assert np.all(dsp > 0)
    assert np.max(dsp) < 3 * np.median(dsp)


def test_nan_propagation_and_invalid():
    assert np.isnan(seawater.sp_from_c_np(40.0, np.nan, 10.0))
    assert np.isnan(seawater.sp_from_c_np(np.nan, 10.0, 10.0))
    # negative conductivity -> invalid sentinel (GSW C convention)
    assert seawater.sp_from_c_np(-5.0, 10.0, 10.0) == seawater.GSW_INVALID_VALUE
    # tiny positive conductivity -> SP ~ 0, never negative
    sp = seawater.sp_from_c_np(1e-6, 10.0, 0.0)
    assert sp == seawater.GSW_INVALID_VALUE or sp >= 0.0
