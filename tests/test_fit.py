"""Robust fitting tests: polynomials, sum-of-sines, LM solver."""

import numpy as np
import pytest

from xdem_tpu import fit


class TestLosses:
    def test_values(self):
        z = np.array([0.5, -0.5, 2.0])
        assert fit.rmse(z) == pytest.approx(np.sqrt(np.mean(z**2)))
        assert fit.huber_loss(z) == pytest.approx(0.125 + 0.125 + 1.5)
        assert fit.soft_loss(np.zeros(3)) == 0


class TestModels:
    def test_polynomial_1d(self):
        x = np.array([0.0, 1.0, 2.0])
        assert np.allclose(fit.polynomial_1d(x, 1.0, 2.0, 3.0), 1 + 2 * x + 3 * x**2)

    def test_polynomial_2d(self):
        x = np.array([1.0, 2.0])
        y = np.array([3.0, 4.0])
        # p=2: c00 + c01*y + c10*x + c11*x*y
        got = fit.polynomial_2d((x, y), 1.0, 2.0, 3.0, 4.0)
        want = 1 + 2 * y + 3 * x + 4 * x * y
        assert np.allclose(got, want)

    def test_polynomial_2d_bad_params(self):
        with pytest.raises(ValueError, match="perfect square"):
            fit.polynomial_2d((np.ones(2), np.ones(2)), 1.0, 2.0, 3.0)

    def test_sumsin_1d(self):
        x = np.linspace(0, 100, 500)
        got = fit.sumsin_1d(x, 2.0, 25.0, 0.5)
        want = 2 * np.sin(2 * np.pi / 25 * x + 0.5)
        assert np.allclose(got, want, atol=1e-6)
        # 2-D input shape preserved
        xx = x.reshape(25, 20)
        assert fit.sumsin_1d(xx, 2.0, 25.0, 0.5).shape == (25, 20)


class TestPolyFit:
    def test_recover_degree_and_coefs(self, rng):
        x = rng.uniform(-5, 5, 2000)
        y = 2.0 - 1.5 * x + 0.25 * x**3 + rng.normal(0, 0.2, x.size)
        coefs, deg = fit.robust_norder_polynomial_fit(x, y, random_state=42)
        assert deg == 3
        assert coefs[0] == pytest.approx(2.0, abs=0.1)
        assert coefs[1] == pytest.approx(-1.5, abs=0.1)
        assert coefs[3] == pytest.approx(0.25, abs=0.02)

    def test_robust_to_outliers(self, rng):
        x = rng.uniform(-5, 5, 2000)
        y = 1.0 + 2.0 * x
        out_idx = rng.choice(x.size, 200, replace=False)
        y[out_idx] += rng.normal(50, 10, 200)  # 10% gross outliers
        coefs, deg = fit.robust_norder_polynomial_fit(x, y, random_state=42)
        assert deg == 1
        assert coefs[1] == pytest.approx(2.0, abs=0.2)

    @pytest.mark.parametrize("estimator", ["Linear", "Theil-Sen", "RANSAC", "Huber"])
    def test_sklearn_estimators(self, rng, estimator):
        x = rng.uniform(-5, 5, 500)
        y = 1.0 + 2.0 * x + rng.normal(0, 0.1, 500)
        coefs, deg = fit.robust_norder_polynomial_fit(
            x, y, estimator_name=estimator, linear_pkg="sklearn", random_state=42)
        assert coefs[1] == pytest.approx(2.0, abs=0.2)


class TestSumsinFit:
    def test_recover_single_frequency(self, rng):
        x = rng.uniform(0, 10000, 4000)
        y = 1.5 * np.sin(2 * np.pi * x / 1200.0 + 0.8) + rng.normal(0, 0.1, x.size)
        coefs, nfreq = fit.robust_nfreq_sumsin_fit(x, y, random_state=42, hop_length=10.0)
        assert nfreq >= 1
        assert coefs[0] == pytest.approx(1.5, abs=0.2)
        assert coefs[1] == pytest.approx(1200.0, rel=0.05)

    def test_recover_two_frequencies(self, rng):
        x = rng.uniform(0, 20000, 6000)
        y = (3.0 * np.sin(2 * np.pi * x / 5000.0 + 1.0)
             + 1.0 * np.sin(2 * np.pi * x / 700.0 + 2.0)
             + rng.normal(0, 0.05, x.size))
        coefs, nfreq = fit.robust_nfreq_sumsin_fit(x, y, random_state=42, hop_length=10.0)
        assert nfreq >= 2
        # Sorted by decreasing amplitude
        assert coefs[0] == pytest.approx(3.0, abs=0.3)
        assert coefs[1] == pytest.approx(5000.0, rel=0.1)
        assert coefs[3] == pytest.approx(1.0, abs=0.3)
        assert coefs[4] == pytest.approx(700.0, rel=0.1)


class TestLM:
    def test_curve_fit_lm_exponential(self, rng):
        import jax.numpy as jnp

        x = np.linspace(0, 5, 200)
        y = 2.0 * np.exp(-1.3 * x) + rng.normal(0, 0.01, 200)

        def model(xx, a, b):
            return a * jnp.exp(-b * xx)

        popt = fit.curve_fit_lm(model, x, y, p0=[1.0, 1.0])
        assert popt[0] == pytest.approx(2.0, abs=0.05)
        assert popt[1] == pytest.approx(1.3, abs=0.05)

    def test_nan_masked(self, rng):
        import jax.numpy as jnp

        x = np.linspace(0, 5, 100)
        y = 3.0 + 2.0 * x
        y[::7] = np.nan
        popt = fit.curve_fit_lm(lambda xx, a, b: a + b * xx, x, y, p0=[0.0, 0.0])
        assert popt[0] == pytest.approx(3.0, abs=1e-3)
        assert popt[1] == pytest.approx(2.0, abs=1e-3)


class TestLossTwoArgConvention:
    """Losses accept both residuals and the reference's (ytrue, ypred) pair (fit.py:42-79)."""

    def test_all_losses_two_arg(self):
        ytrue = np.array([3.0, -4.0, 1.0])
        ypred = np.array([1.0, -1.0, 1.0])
        assert fit.rmse(ytrue, ypred) == pytest.approx(fit.rmse(ytrue - ypred))
        assert fit.huber_loss(ytrue, ypred) == pytest.approx(fit.huber_loss(ytrue - ypred))
        assert fit.soft_loss(ytrue, ypred) == pytest.approx(fit.soft_loss(ytrue - ypred))
        assert fit.soft_loss(ytrue, ypred, scale=2.0) == pytest.approx(
            fit.soft_loss(ytrue - ypred, scale=2.0))

    def test_soft_loss_scalar_second_positional_raises(self):
        with pytest.raises(TypeError, match="scale as a keyword"):
            fit.soft_loss(np.array([1.0, 2.0]), 2.0)
