"""Volume change, dDEM and DEMCollection tests."""

import numpy as np
import pandas as pd
import pytest

from xdem_tpu import volume
from xdem_tpu.ddem import dDEM
from xdem_tpu.dem import DEM
from xdem_tpu.demcollection import DEMCollection
from xdem_tpu.georef import Affine
from xdem_tpu.raster import Raster


@pytest.fixture()
def ref_and_dh(rng):
    h, w = 120, 150
    yy, xx = np.mgrid[0:h, 0:w]
    ref = (1000 - 3.0 * yy + 0.5 * xx).astype(np.float64)  # elevation ramp
    # dh depends linearly on elevation: dh = -20 + 0.015*z + noise
    dh = -20 + 0.015 * ref + rng.normal(0, 0.1, ref.shape)
    return ref, dh


class TestHypsometricBinning:
    def test_fixed_bins_recover_signal(self, ref_and_dh):
        ref, dh = ref_and_dh
        df = volume.hypsometric_binning(dh, ref, bins=50.0, kind="fixed")
        mids = df.index.mid.values
        expected = -20 + 0.015 * mids
        # Interior bins only: edge bins are truncated by the data range, shifting their median
        valid = np.array((df["count"] > 20).values)
        valid[0] = valid[-1] = False
        assert np.allclose(df["value"][valid], expected[valid], atol=0.1)

    @pytest.mark.parametrize("kind", ["count", "quantile"])
    def test_other_kinds(self, ref_and_dh, kind):
        ref, dh = ref_and_dh
        df = volume.hypsometric_binning(dh, ref, bins=10 if kind == "count" else 1000, kind=kind)
        assert df["count"].sum() > 0.95 * np.isfinite(dh).sum()

    def test_custom_bins(self, ref_and_dh):
        ref, dh = ref_and_dh
        edges = np.array([600.0, 800.0, 1000.0, 1100.0])
        df = volume.hypsometric_binning(dh, ref, bins=edges, kind="custom")
        assert len(df) == 3

    def test_interpolate_bins(self, ref_and_dh):
        ref, dh = ref_and_dh
        df = volume.hypsometric_binning(dh, ref, bins=50.0)
        df.loc[df.index[3], "value"] = np.nan
        filled = volume.interpolate_hypsometric_bins(df)
        assert np.isfinite(filled["value"]).all()

    def test_fit_poly(self, ref_and_dh):
        ref, dh = ref_and_dh
        df = volume.hypsometric_binning(dh, ref, bins=50.0)
        fitted = volume.fit_hypsometric_bins_poly(df, degree=1)
        mids = df.index.mid.values
        assert np.allclose(fitted["value"].values[1:-1], (-20 + 0.015 * mids)[1:-1], atol=0.2)

    def test_area_calculation(self, ref_and_dh):
        ref, dh = ref_and_dh
        df = volume.hypsometric_binning(dh, ref, bins=100.0)
        filled = volume.interpolate_hypsometric_bins(df)
        areas = volume.calculate_hypsometry_area(filled, ref, pixel_size=20.0)
        assert areas.sum() == pytest.approx(np.isfinite(ref).sum() * 400.0, rel=1e-6)


class TestGapFilling:
    def test_idw(self, rng):
        arr = rng.normal(10, 1, (50, 50))
        arr[20:25, 20:25] = np.nan
        filled = volume.idw_interpolation(arr, max_search_distance=10)
        assert np.isfinite(filled[22, 22])
        assert abs(filled[22, 22] - 10) < 3

    def test_hypsometric_interpolation(self, ref_and_dh):
        ref, dh = ref_and_dh
        mask = np.ones(ref.shape, dtype=bool)
        dh_voided = dh.copy()
        dh_voided[40:60, 40:80] = np.nan
        filled = volume.hypsometric_interpolation(dh_voided, ref, mask)
        got = filled.filled(np.nan)[50, 60]
        expected = -20 + 0.015 * ref[50, 60]
        assert got == pytest.approx(expected, abs=0.3)

    def test_local_hypsometric(self, ref_and_dh):
        ref, dh = ref_and_dh
        mask = np.zeros(ref.shape, dtype=bool)
        mask[10:60, 10:70] = True
        mask[70:110, 80:140] = True
        dh_voided = np.where(mask, dh, np.nan)
        dh_voided[30:40, 30:50] = np.nan
        filled = volume.local_hypsometric_interpolation(dh_voided, ref, mask)
        assert np.isfinite(filled.filled(np.nan)[35, 40])

    def test_regional_signal(self, ref_and_dh, rng):
        ref, dh = ref_and_dh
        glaciers = np.zeros(ref.shape, dtype=int)
        glaciers[10:60, 10:70] = 1
        glaciers[70:110, 80:140] = 2
        signal = volume.get_regional_hypsometric_signal(dh, ref, glaciers)
        assert len(signal) == 20
        assert np.isfinite(signal["median"]).sum() > 10
        filled = volume.norm_regional_hypsometric_interpolation(
            np.where(glaciers > 0, dh, np.nan), ref, glaciers)
        assert np.isfinite(filled.filled(np.nan)[glaciers > 0]).mean() > 0.9


class TestDDEM:
    def test_construction_and_time(self):
        import datetime

        r = Raster(np.ones((10, 10), np.float32), Affine.from_origin(0, 100, 10, 10), 32633)
        d = dDEM(r, start_time=datetime.datetime(1990, 8, 1), end_time=datetime.datetime(2009, 8, 1))
        assert d.time.days == pytest.approx(6940, abs=5)

    def test_from_array(self):
        import datetime

        arr = np.arange(100, dtype=np.float32).reshape(10, 10)
        d = dDEM.from_array(arr, Affine.from_origin(0, 100, 10, 10), 32633,
                            start_time=datetime.datetime(1990, 8, 1),
                            end_time=datetime.datetime(2009, 8, 1), error=0.5)
        assert isinstance(d, dDEM)
        assert d.error == 0.5
        assert d.time.days == pytest.approx(6940, abs=5)
        np.testing.assert_array_equal(d.get_nanarray(), arr)

    def test_interpolate_idw(self, rng):
        arr = rng.normal(5, 1, (40, 40)).astype(np.float32)
        arr[10:14, 10:14] = np.nan
        d = dDEM(Raster(arr, Affine.from_origin(0, 400, 10, 10), 32633))
        # Gappy and not yet interpolated: filled_data is None (reference ddem.py:118-131)
        assert d.filled_data is None
        assert d.fill_method == ""
        filled = d.interpolate(method="idw")
        assert np.isfinite(filled[11, 11])
        assert d.filled_data is not None
        assert d.fill_method == "idw"

    def test_filled_data_semantics(self, rng):
        arr = rng.normal(5, 1, (20, 20)).astype(np.float32)
        d = dDEM(Raster(arr, Affine.from_origin(0, 200, 10, 10), 32633))
        # Gap-free: filled_data is the original data without interpolating
        np.testing.assert_array_equal(d.filled_data, arr)
        # Setter validates size
        with pytest.raises(ValueError, match="differs from the data shape"):
            d.filled_data = np.zeros((3, 3))
        d.filled_data = np.zeros(arr.size)
        assert d.filled_data.shape == arr.shape


class TestDEMCollection:
    def test_series(self, rng):
        import datetime

        t = Affine.from_origin(0, 1000, 10, 10)
        base = rng.normal(1000, 50, (60, 60)).astype(np.float32)
        d0 = DEM(base, t, 32633)
        d1 = DEM(base - 5, t, 32633)
        d2 = DEM(base - 12, t, 32633)
        times = [datetime.datetime(y, 8, 1) for y in (1990, 2000, 2010)]
        col = DEMCollection([d0, d1, d2], timestamps=times, reference_dem=0)
        assert col.reference_dem is d0
        assert col.reference_timestamp == times[0]
        ddems = col.subtract_dems_intervalwise()
        assert len(ddems) == 2
        dh = col.get_dh_series(nans_ok=True)
        assert dh["dh"].iloc[0] == pytest.approx(-5, abs=1e-3)
        assert dh["dh"].iloc[1] == pytest.approx(-7, abs=1e-3)
        dv = col.get_dv_series(nans_ok=True)
        assert dv.iloc[0] == pytest.approx(-5 * 60 * 60 * 100, rel=1e-3)
        cum = col.get_cumulative_series(kind="dh", nans_ok=True)
        assert cum.iloc[0] == 0
        assert cum.iloc[-1] == pytest.approx(-12, abs=1e-2)

    def test_timestamps_required(self):
        t = Affine.from_origin(0, 1000, 10, 10)
        d = DEM(np.ones((5, 5), np.float32), t, 32633)
        with pytest.raises(ValueError, match="Timestamps"):
            DEMCollection([d])


class TestDEMCollectionRefWise:
    def test_subtract_dems_reference(self, rng):
        import datetime

        t = Affine.from_origin(0, 1000, 10, 10)
        base = rng.normal(1000, 50, (50, 50)).astype(np.float32)
        d0 = DEM(base, t, 32633)
        d1 = DEM(base - 5, t, 32633)
        d2 = DEM(base - 12, t, 32633)
        times = [datetime.datetime(y, 8, 1) for y in (1990, 2000, 2010)]
        col = DEMCollection([d0, d1, d2], timestamps=times, reference_dem=2)
        ddems = col.subtract_dems()
        # Like the reference, the reference DEM itself yields an all-zero dDEM so the
        # list stays index-aligned with dems (reference demcollection.py:115-125)
        assert len(ddems) == 3
        vals = sorted(float(np.nanmean(np.asarray(d.data))) for d in ddems)
        assert vals[0] == pytest.approx(-12, abs=1e-3)
        assert vals[1] == pytest.approx(-7, abs=1e-3)
        assert vals[2] == 0.0
        # Statistics skip the zero self-comparison dDEM
        dh = col.get_dh_series(nans_ok=True)
        assert len(dh) == 2
        # Cumulative series: anchored at the earliest timestamp = 0, elevation change
        # relative to it (reference demcollection.py:276-290)
        cum = col.get_cumulative_series(kind="dh", nans_ok=True)
        assert list(cum.index) == [pd.Timestamp(t) for t in times]
        assert cum.iloc[0] == 0.0
        assert cum.iloc[1] == pytest.approx(-5, abs=1e-3)   # base -> base-5 since 1990
        assert cum.iloc[2] == pytest.approx(-12, abs=1e-3)  # base -> base-12 since 1990


class TestDeviceHypsometricPaths:
    """Device segment-sort fast paths equal the host implementations (engaged by jax-array
    inputs; host numpy keeps the reference-parity path)."""

    def _data(self, shape=(300, 340), seed=0):
        rng = np.random.default_rng(seed)
        ref = rng.uniform(100, 2100, shape)
        dh = rng.normal(-2, 1, shape)
        dh[rng.random(shape) < 0.2] = np.nan
        return dh, ref

    @pytest.mark.parametrize("kind,bins", [("fixed", 100.0), ("count", 12), ("quantile", 10)])
    def test_binning_device_equals_host(self, kind, bins):
        import jax.numpy as jnp

        from xdem_tpu import volume

        dh, ref = self._data()
        host = volume.hypsometric_binning(dh, ref, bins=bins, kind=kind)
        dev = volume.hypsometric_binning(jnp.asarray(dh, jnp.float32),
                                         jnp.asarray(ref, jnp.float32), bins=bins, kind=kind)
        assert len(host) == len(dev)
        # f32 binning may move edge-straddling pixels by one bin; values agree closely
        assert np.abs(host["count"].values - dev["count"].values).max() <= 2
        np.testing.assert_allclose(dev["value"].values, host["value"].values,
                                   atol=5e-2, equal_nan=True)

    def test_regional_signal_device_equals_host(self):
        import jax.numpy as jnp

        from xdem_tpu import volume

        dh, ref = self._data()
        gid = (np.arange(dh.size).reshape(dh.shape) // 20000) % 5  # ids 0..4, 0 excluded
        host = volume.get_regional_hypsometric_signal(dh, ref, gid)
        dev = volume.get_regional_hypsometric_signal(
            jnp.asarray(dh, jnp.float32), jnp.asarray(ref, jnp.float32), gid)
        np.testing.assert_array_equal(host["count"].values, dev["count"].values)
        np.testing.assert_allclose(dev["median"].values, host["median"].values,
                                   atol=1e-5, equal_nan=True)
        np.testing.assert_allclose(dev["std"].values, host["std"].values,
                                   atol=1e-4, equal_nan=True)

    def test_custom_aggregation_stays_on_host(self):
        import jax.numpy as jnp

        from xdem_tpu import volume

        dh, ref = self._data(shape=(50, 60))
        # np.mean is not the device statistic: jax input must still work via the host path
        out = volume.hypsometric_binning(np.asarray(dh), np.asarray(ref), bins=200.0,
                                         aggregation_function=np.nanmean)
        assert "value" in out


class TestDEMCollectionReviewRegressions:
    """Round-3 elevation-objects review fixes (reference demcollection.py parity)."""

    def _collection(self, rng):
        import datetime

        t = Affine.from_origin(0, 1000, 10, 10)
        base = rng.normal(1000, 50, (50, 50)).astype(np.float32)
        dems = [DEM(base, t, 32633), DEM(base - 5, t, 32633), DEM(base - 12, t, 32633)]
        times = [datetime.datetime(y, 8, 1) for y in (1990, 2000, 2010)]
        return dems, times, t

    def test_subtract_rejects_shifted_transform(self, rng):
        # Same shape, different transform: used to silently difference misaligned grids
        import datetime

        t = Affine.from_origin(0, 1000, 10, 10)
        t_shift = Affine.from_origin(5000, 1000, 10, 10)
        base = rng.normal(1000, 50, (50, 50)).astype(np.float32)
        d0 = DEM(base, t, 32633)
        d1 = DEM(base - 5, t_shift, 32633)
        times = [datetime.datetime(y, 8, 1) for y in (1990, 2000)]
        col = DEMCollection([d0, d1], timestamps=times, reference_dem=0)
        # Non-overlapping grids: reprojection happens (no silent raw-array subtraction)
        ddems = col.subtract_dems()
        arr = np.asarray(ddems[1].data)
        assert np.isnan(arr).all()  # no overlap -> all NaN, not garbage values

    def test_ddem_mask_union_cascade(self, rng):
        import datetime

        from xdem_tpu.vector import Vector

        dems, times, t = self._collection(rng)
        sq1 = np.array([[0.0, 500.0], [200.0, 500.0], [200.0, 1000.0], [0.0, 1000.0]])
        sq2 = np.array([[300.0, 500.0], [500.0, 500.0], [500.0, 1000.0], [300.0, 1000.0]])
        v1 = Vector([[sq1]], crs=32633, properties=[{"name": "west"}])
        v2 = Vector([[sq2]], crs=32633, properties=[{"name": "east"}])
        col = DEMCollection(dems, timestamps=times,
                            outlines={times[0]: v1, times[2]: v2}, reference_dem=2)
        col.subtract_dems()
        # dDEM [1990, 2010]: start AND end outlines exist -> union of both squares
        d_union = next(d for d in col.ddems if d.start_time == times[0])
        m = col.get_ddem_mask(d_union)
        assert m.sum() == v1.create_mask(d_union).sum() + v2.create_mask(d_union).sum()
        # outlines_filter: pandas query over feature properties
        m_west = col.get_ddem_mask(d_union, outlines_filter="name == 'west'")
        np.testing.assert_array_equal(m_west, v1.create_mask(d_union))
        # dh series honors the filter
        dh_all = col.get_dh_series(nans_ok=True)
        dh_west = col.get_dh_series(outlines_filter="name == 'west'", nans_ok=True)
        assert dh_west["area"].iloc[0] < dh_all["area"].iloc[0]
        # foreign dDEM rejected
        other = dDEM(Raster(np.zeros((50, 50), np.float32), t, 32633),
                     start_time=times[0], end_time=times[1])
        with pytest.raises(ValueError, match="part of the DEMCollection"):
            col.get_ddem_mask(other)

    def test_interpolate_reprojects_reference_elevation(self, rng):
        import datetime

        t = Affine.from_origin(0, 1000, 10, 10)
        t_coarse = Affine.from_origin(0, 1000, 20, 20)
        base = np.add.outer(np.linspace(2000, 100, 50), np.zeros(50)).astype(np.float32)
        dh = rng.normal(-2, 0.1, (50, 50)).astype(np.float32)
        dh[10:14, 10:14] = np.nan
        d = dDEM(Raster(dh, t, 32633), start_time=datetime.datetime(1990, 8, 1),
                 end_time=datetime.datetime(2000, 8, 1))
        ref_coarse = Raster(base[::2, ::2], t_coarse, 32633)  # different grid
        mask = np.ones((50, 50), bool)
        filled = d.interpolate(method="local_hypsometric", reference_elevation=ref_coarse,
                               mask=mask)
        assert np.isfinite(filled[10:14, 10:14]).all()
        # A plain same-shape array is accepted; a wrong-shape array raises
        with pytest.raises(ValueError, match="reference_elevation"):
            d.interpolate(method="local_hypsometric",
                          reference_elevation=base[::2, ::2], mask=mask)


class TestFitSigmaWeights:
    def test_polynomial_fit_uses_sigma(self):
        # Heavily down-weighted corrupted half: the weighted fit must recover the clean
        # polynomial; sigma used to be silently ignored
        from xdem_tpu.fit import polynomial_1d, robust_norder_polynomial_fit

        rng = np.random.default_rng(11)
        x = np.linspace(-1, 1, 400)
        y_true = 2.0 + 3.0 * x
        y = y_true + rng.normal(0, 0.01, x.size)
        y[200:] += 5.0  # corrupted half
        sigma = np.r_[np.full(200, 0.01), np.full(200, 1e3)]
        coefs_w, deg_w = robust_norder_polynomial_fit(
            x, y, sigma=sigma, max_order=3, estimator_name=None)
        pred = polynomial_1d(x[:200], *coefs_w)
        assert np.abs(pred - y_true[:200]).max() < 0.1
        # sklearn Huber path accepts sample weights too
        coefs_sk, _ = robust_norder_polynomial_fit(
            x, y, sigma=sigma, max_order=2, estimator_name="Huber", linear_pkg="sklearn")
        pred_sk = polynomial_1d(x[:200], *coefs_sk)
        assert np.abs(pred_sk - y_true[:200]).max() < 0.2


class TestVolumeParamParity:
    """Round-3 parameter additions matching the reference's volume.py kwargs."""

    def test_idw_force_fill(self):
        arr = np.full((40, 40), 5.0)
        arr[10:30, 10:30] = np.nan  # a hole too large for 3 dilation rings
        out = volume.idw_interpolation(arr, max_search_distance=3)
        assert np.isnan(out).any()
        out_f = volume.idw_interpolation(arr, max_search_distance=3, force_fill=True)
        assert np.isfinite(out_f).all()
        # Remaining gaps got the median of the valid input
        assert out_f[20, 20] == pytest.approx(5.0)

    def test_norm_regional_min_elevation_range(self):
        rng = np.random.default_rng(5)
        ref = np.tile(np.linspace(100.0, 1100.0, 100), (100, 1))
        idx = np.zeros((100, 100), int)
        idx[10:90, 10:90] = 1
        ddem = rng.normal(-2.0, 0.1, (100, 100))
        voided = ddem.copy()
        # Valid data only in the LOWEST tenth of the elevation range of the glacier
        voided[:, 18:] = np.nan
        out_strict = volume.norm_regional_hypsometric_interpolation(
            voided, ref, idx, min_coverage=0.0,
            regional_signal=volume.get_regional_hypsometric_signal(ddem, ref, idx),
            min_elevation_range=0.5,
        )
        # Glacier skipped: the voids stay masked
        assert out_strict.mask[50, 50]
        out_loose = volume.norm_regional_hypsometric_interpolation(
            voided, ref, idx, min_coverage=0.0,
            regional_signal=volume.get_regional_hypsometric_signal(ddem, ref, idx),
            min_elevation_range=0.05,
        )
        assert not out_loose.mask[50, 50]

    def test_norm_regional_idealized(self):
        rng = np.random.default_rng(6)
        ref = np.tile(np.linspace(100.0, 1100.0, 80), (80, 1))
        idx = np.zeros((80, 80), int)
        idx[5:75, 5:75] = 1
        ddem = rng.normal(-3.0, 0.5, (80, 80))
        signal = volume.get_regional_hypsometric_signal(ddem, ref, idx)
        out = volume.norm_regional_hypsometric_interpolation(
            ddem, ref, idx, regional_signal=signal, idealized_ddem=True)
        # ALL glacier values replaced by the smooth scaled signal: spread collapses
        inside = np.asarray(out[idx == 1])
        assert np.nanstd(inside) < np.nanstd(ddem[idx == 1])

    def test_local_hypso_nodata_fill_value(self):
        rng = np.random.default_rng(7)
        ref = np.tile(np.linspace(0.0, 500.0, 60), (60, 1))
        mask = np.zeros((60, 60), bool)
        mask[10:50, 10:50] = True
        ddem = rng.normal(-1.0, 0.2, (60, 60))
        ddem[20:25, 20:25] = np.nan
        out = volume.local_hypsometric_interpolation(ddem, ref, mask, nodata=-42.0)
        assert out.fill_value == -42.0
        assert np.isfinite(np.asarray(out[20, 22]))
