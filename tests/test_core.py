"""Core substrate tests: georef math, interpolation, raster ops, examples."""

import numpy as np
import pytest

from xdem_tpu.georef import CRS, Affine, suggest_utm_crs, transform_points
from xdem_tpu.ops.interp import interp_rowcol
from xdem_tpu.raster import Raster
from xdem_tpu import examples


class TestAffine:
    def test_roundtrip(self):
        t = Affine.from_origin(5000.0, 90000.0, 20.0, 20.0)
        x, y = t.xy(3, 7)
        r, c = t.rowcol(x, y)
        assert r == pytest.approx(3) and c == pytest.approx(7)

    def test_compose_invert(self):
        t = Affine(2, 0.1, 5, -0.1, -2, 9)
        ident = t * t.invert()
        assert ident.almost_equals(Affine.identity(), precision=1e-9)


class TestCRS:
    def test_utm_roundtrip(self):
        crs = CRS(32633)
        lon = np.array([14.0, 15.0, 16.5, 13.2])
        lat = np.array([77.0, 78.0, 78.5, 79.9])
        x, y = transform_points(4326, crs, lon, lat)
        lon2, lat2 = transform_points(crs, 4326, x, y)
        assert np.allclose(lon, lon2, atol=1e-9)
        assert np.allclose(lat, lat2, atol=1e-9)

    def test_utm_central_meridian(self):
        # Points on the central meridian of zone 33 (15 deg E) have easting exactly 500000
        x, y = transform_points(4326, 32633, np.array([15.0]), np.array([70.0]))
        assert x[0] == pytest.approx(500000.0, abs=1e-6)

    def test_utm_known_point(self):
        # Equator at lon0: northing 0 (north) / 10,000,000 (south)
        x, y = transform_points(4326, 32633, np.array([15.0]), np.array([0.0]))
        assert y[0] == pytest.approx(0.0, abs=1e-6)
        xs, ys = transform_points(4326, 32733, np.array([15.0]), np.array([0.0]))
        assert ys[0] == pytest.approx(1e7, abs=1e-6)

    def test_polar_stereo_roundtrip(self):
        lon = np.array([-40.0, 10.0, 100.0])
        lat = np.array([70.0, 80.0, 85.0])
        x, y = transform_points(4326, 3413, lon, lat)
        lon2, lat2 = transform_points(3413, 4326, x, y)
        assert np.allclose(lon, lon2, atol=1e-8)
        assert np.allclose(lat, lat2, atol=1e-8)

    def test_properties(self):
        assert CRS(4326).is_geographic
        assert CRS(32633).is_projected
        assert CRS("EPSG:32633") == CRS(32633)


class TestInterp:
    def test_bilinear_vs_scipy(self):
        from scipy.ndimage import map_coordinates

        rng = np.random.default_rng(0)
        data = rng.normal(size=(30, 40)).astype(np.float32)
        rows = rng.uniform(0, 29, 200)
        cols = rng.uniform(0, 39, 200)
        got = np.asarray(interp_rowcol(data, rows, cols, method="linear"))
        want = map_coordinates(data.astype(np.float64), [rows, cols], order=1)
        assert np.allclose(got, want, atol=1e-5)

    def test_nan_and_oob(self):
        data = np.ones((10, 10), dtype=np.float32)
        data[5, 5] = np.nan
        got = np.asarray(interp_rowcol(data, np.array([4.5, -1.0, 9.5]), np.array([5.2, 3.0, 3.0])))
        assert np.isnan(got[0])  # touches NaN neighbor
        assert np.isnan(got[1])  # out of bounds
        assert np.isnan(got[2])  # out of bounds (row > H-1)

    def test_nearest_cubic(self):
        rng = np.random.default_rng(1)
        data = rng.normal(size=(20, 20)).astype(np.float32)
        got = np.asarray(interp_rowcol(data, np.array([3.0]), np.array([4.0]), method="nearest"))
        assert got[0] == pytest.approx(data[3, 4])
        got_c = np.asarray(interp_rowcol(data, np.array([3.0]), np.array([4.0]), method="cubic"))
        assert got_c[0] == pytest.approx(data[3, 4], abs=1e-5)


class TestGeoutilsParitySurface:
    """geoutils.Raster/PointCloud API members the reference documents (api.md autosummary)."""

    def _raster(self, arr=None):
        from xdem_tpu.georef import Affine
        from xdem_tpu.raster import Raster

        if arr is None:
            arr = np.arange(30, dtype=np.float32).reshape(5, 6)
        return Raster(arr, Affine(10.0, 0, 0, 0, -10.0, 50.0), 32633)

    def test_polygonize_roundtrip_with_holes(self):
        from xdem_tpu.georef import Affine
        from xdem_tpu.raster import Raster

        m = np.zeros((9, 9), bool)
        m[1:8, 1:8] = True
        m[3:5, 3:6] = False  # a hole
        m[0, 0] = True  # separate single-pixel component
        t = Affine(10.0, 0, 0, 0, -10.0, 200.0)
        vec = Raster(m.astype(np.float32), t, 32633).polygonize(1)
        assert len(vec) == 2  # two components; hole carried as an interior ring
        back = vec.create_mask(transform=t, shape=m.shape)
        np.testing.assert_array_equal(np.asarray(back), m)

    def test_polygonize_roundtrip_utm_scale_coordinates(self):
        # Regression: np.allclose-based ring-closure detection called corners 20 m apart
        # "equal" at UTM northings (~8.7e6 m), dropping a vertex and corrupting 4 pixels
        # of the glacier mask; also exercises the scanline rasterization fast path.
        from xdem_tpu import examples
        from xdem_tpu.raster import Raster

        dem = examples.get_ref_dem_test()
        rng = np.random.default_rng(11)
        mask = rng.random(dem.shape) > 0.55
        vec = Raster(mask.astype(np.float32), dem.transform, dem.crs).polygonize(1)
        back = np.asarray(vec.create_mask(dem))
        np.testing.assert_array_equal(back, mask)

    def test_polygonize_random_roundtrips(self):
        from xdem_tpu.georef import Affine
        from xdem_tpu.raster import Raster

        t = Affine(5.0, 0, 0, 0, -5.0, 500.0)
        rng = np.random.default_rng(7)
        for dens in (0.35, 0.65):
            m = rng.random((30, 22)) > dens
            back = Raster(m.astype(np.float32), t, 32633).polygonize(1).create_mask(
                transform=t, shape=m.shape)
            np.testing.assert_array_equal(np.asarray(back), m)

    def test_proximity(self):
        r = self._raster(np.full((5, 6), np.nan, np.float32))
        arr = np.asarray(r.data).copy()
        arr[2, 3] = 7.0
        r.data = arr
        prox = r.proximity()
        got = np.asarray(prox.data)
        assert got[2, 3] == 0.0
        assert got[2, 4] == pytest.approx(10.0)  # one pixel = 10 m
        assert got[0, 3] == pytest.approx(20.0)
        px = np.asarray(r.proximity(distance_unit="pixel").data)
        assert px[2, 5] == pytest.approx(2.0)
        tv = np.asarray(r.proximity(target_values=[7.0]).data)
        np.testing.assert_allclose(tv, got)

    def test_set_nodata(self):
        r = self._raster()
        r.set_nodata(12.0)
        assert np.isnan(np.asarray(r.data)[2, 0])  # value 12 recoded
        assert r.nodata == 12.0

    def test_set_area_or_point_shifts_georef(self):
        r = self._raster()
        c0 = r.transform.c
        r.set_area_or_point("Point")
        assert r.area_or_point == "Point"
        assert r.transform.c == pytest.approx(c0 + 5.0)  # half of the 10 m pixel
        r.set_area_or_point("Area")
        assert r.transform.c == pytest.approx(c0)
        with pytest.raises(ValueError, match="area_or_point"):
            r.set_area_or_point("Corner")

    def test_plot_and_to_file(self, tmp_path):
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        r = self._raster()
        ax = r.plot(cbar_title="elevation (m)")
        assert ax is not None
        plt.close("all")
        p = str(tmp_path / "o.tif")
        r.to_file(p)
        from xdem_tpu.raster import Raster

        assert Raster.open(p).shape == r.shape

    def test_pointcloud_constructors_and_crop(self):
        from xdem_tpu.pointcloud import PointCloud

        x = np.array([0.0, 10.0, 20.0, 30.0]); y = np.array([0.0, 5.0, 9.0, 2.0])
        z = np.array([1.0, 2.0, 3.0, 4.0])
        for pc in (PointCloud.from_xyz(x, y, z, 32633),
                   PointCloud.from_array(np.column_stack([x, y, z]), 32633),
                   PointCloud.from_array(np.column_stack([x, y, z]).T, 32633),
                   PointCloud.from_tuples(zip(x, y, z), 32633)):
            assert pc.point_count == 4
            np.testing.assert_allclose(pc.z, z)
        cropped = pc.crop((5.0, 0.0, 25.0, 10.0))
        assert cropped.point_count == 2 and cropped.z.tolist() == [2.0, 3.0]

    def test_rasterize_off_center_points(self):
        # Points anywhere inside a pixel bin to THAT pixel (review regression: floor()
        # pushed the left/top half into the neighbor and dropped the first row/col half)
        from xdem_tpu.georef import Affine
        from xdem_tpu.pointcloud import PointCloud

        t = Affine(10.0, 0, 0, 0, -10.0, 30.0)
        pc = PointCloud.from_xyz([4.0, 14.0], [26.0, 27.0], [1.0, 2.0], 32633)
        cnt = np.asarray(pc.rasterize(transform=t, shape=(3, 3), statistic="count").data)
        assert cnt[0, 0] == 1.0 and cnt[0, 1] == 1.0

    def test_pointcloud_rasterize_stats_info(self, tmp_path):
        from xdem_tpu.georef import Affine
        from xdem_tpu.pointcloud import PointCloud

        t = Affine(10.0, 0, 0, 0, -10.0, 30.0)
        pc = PointCloud.from_xyz([5.0, 5.0, 25.0], [25.0, 25.0, 5.0], [2.0, 4.0, 9.0], 32633)
        mean = np.asarray(pc.rasterize(transform=t, shape=(3, 3), statistic="mean").data)
        assert mean[0, 0] == pytest.approx(3.0)  # two points binned
        assert mean[2, 2] == pytest.approx(9.0)
        assert np.isnan(mean[1, 1])
        cnt = np.asarray(pc.rasterize(transform=t, shape=(3, 3), statistic="count").data)
        assert cnt[0, 0] == 2.0
        mn = np.asarray(pc.rasterize(transform=t, shape=(3, 3), statistic="min").data)
        assert mn[0, 0] == 2.0
        stats = pc.get_stats()
        assert stats["valid_count"] == 3 and stats["max"] == 9.0
        assert "3 points" in pc.info()
        p = str(tmp_path / "pc.csv")
        pc.to_file(p)
        from xdem_tpu.epc import read_epc

        assert read_epc(p, crs=32633).point_count == 3

    def test_coreg_matrix_exports(self):
        from xdem_tpu import coreg

        m = coreg.matrix_from_translations_rotations(1.0, 2.0, 3.0, 0.0, 0.0, 0.0)
        out = np.asarray(coreg.translations_rotations_from_matrix(m), dtype=float).ravel()
        np.testing.assert_allclose(out[:3], (1.0, 2.0, 3.0), atol=1e-12)
        np.testing.assert_allclose(out[3:6], 0.0, atol=1e-9)


class TestPackageConfig:
    def test_default_resampling_flows_into_reproject(self):
        import xdem_tpu
        from xdem_tpu.georef import Affine
        from xdem_tpu.raster import Raster

        data = np.arange(36, dtype=np.float32).reshape(6, 6)
        src = Raster(data, Affine(10.0, 0, 0, 0, -10.0, 60.0), 32633)
        dst = Raster(np.zeros((3, 3), np.float32), Affine(20.0, 0, 0, 0, -20.0, 60.0), 32633)
        linear = np.asarray(src.reproject(dst).data)
        with xdem_tpu.config_context(resampling="nearest"):
            nearest = np.asarray(src.reproject(dst).data)
        assert not np.allclose(linear, nearest)
        np.testing.assert_allclose(np.asarray(src.reproject(dst, resampling="nearest").data),
                                   nearest)
        # context restored the default
        np.testing.assert_allclose(np.asarray(src.reproject(dst).data), linear)

    def test_validation(self):
        import xdem_tpu

        with pytest.raises(KeyError, match="Unknown config key"):
            xdem_tpu.config["not_a_key"] = 1
        with pytest.raises(ValueError, match="resampling"):
            xdem_tpu.config["resampling"] = "sinc"

    def test_shape_bucketing_matches_unbucketed(self):
        import xdem_tpu
        from xdem_tpu import terrain

        rng = np.random.default_rng(3)
        for shape in [(100, 130), (101, 131), (97, 127)]:
            d = rng.normal(0, 20, shape).astype(np.float32)
            plain = terrain.get_terrain_attribute(
                d, ["slope", "hillshade", "terrain_ruggedness_index"], resolution=10.0)
            with xdem_tpu.config_context(shape_bucketing=64):
                bucketed = terrain.get_terrain_attribute(
                    d, ["slope", "hillshade", "terrain_ruggedness_index"], resolution=10.0)
            for p, b in zip(plain, bucketed):
                p, b = np.asarray(p), np.asarray(b)
                assert p.shape == shape and b.shape == shape
                np.testing.assert_array_equal(np.isnan(p), np.isnan(b))
                ok = np.isfinite(p)
                np.testing.assert_allclose(b[ok], p[ok], rtol=2e-4, atol=2e-4)

    def test_point_interpretation_in_raster_point_coreg(self):
        # A "Point" raster's samples sit at pixel corners; the raster-point coreg paths
        # must interpolate there (half-pixel shift), not at centers.
        from xdem_tpu.coreg import VerticalShift
        from xdem_tpu.epc import EPC
        from xdem_tpu.georef import Affine
        from xdem_tpu.raster import Raster

        t = Affine(10.0, 0, 0.0, 0, -10.0, 300.0)
        h, w = 30, 30
        cc, rr = np.meshgrid(np.arange(w, dtype=np.float64), np.arange(h, dtype=np.float64))
        corner_x, corner_y = t.xy(rr, cc, offset="ul")
        z = (0.01 * corner_x + 0.02 * corner_y).astype(np.float32)  # linear: interp exact
        rng = np.random.default_rng(0)
        px = rng.uniform(20, 260, 300)
        py = rng.uniform(40, 280, 300)
        pz = 0.01 * px + 0.02 * py + 5.0  # points sit 5 m above the surface

        point_raster = Raster(z, t, 32633, area_or_point="Point")
        vs = VerticalShift(subsample=1.0)
        vs.fit(point_raster, EPC(x=px, y=py, z=pz, crs=32633))
        # shift_z moves the to-be-aligned EPC onto the reference surface: -5 m
        assert vs.meta["outputs"]["affine"]["shift_z"] == pytest.approx(-5.0, abs=1e-4)
        # Area interpretation on the same data is half a pixel off -> biased dh
        area_raster = Raster(z, t, 32633, area_or_point="Area")
        vs2 = VerticalShift(subsample=1.0)
        vs2.fit(area_raster, EPC(x=px, y=py, z=pz, crs=32633))
        assert abs(vs2.meta["outputs"]["affine"]["shift_z"] - (-5.0)) > 0.04

    def test_shape_bucketing_coreg_paths(self):
        import jax

        import xdem_tpu
        from xdem_tpu import examples
        from xdem_tpu.coreg import NuthKaab, VerticalShift
        from xdem_tpu.coreg.affine import _nuth_kaab_rst_rst_device

        ref = examples.get_ref_dem_test()
        tba = examples.get_tba_dem_test()
        vs_plain = VerticalShift().fit(ref, tba).meta["outputs"]["affine"]["shift_z"]
        nk_plain = NuthKaab()
        nk_plain.fit(ref, tba, random_state=42)
        with xdem_tpu.config_context(shape_bucketing=64):
            # VerticalShift: NaN/False padding leaves the masked median exactly unchanged
            vs_bucketed = VerticalShift().fit(ref, tba).meta["outputs"]["affine"]["shift_z"]
            assert vs_bucketed == pytest.approx(vs_plain, abs=1e-6)
            # NuthKaab: subsample >= valid count here, so padding changes nothing — the
            # bucketed fit must reproduce the plain solution
            nk = NuthKaab()
            nk.fit(ref, tba, random_state=42)
            for k in ("shift_x", "shift_y", "shift_z"):
                assert nk.meta["outputs"]["affine"][k] == pytest.approx(
                    nk_plain.meta["outputs"]["affine"][k], abs=1e-4)
            # Two different crops of the same bucket share ONE compiled solver
            n_compiles = _nuth_kaab_rst_rst_device._cache_size()
            ref2 = ref.icrop((0, ref.shape[0] - 3), (0, ref.shape[1] - 5))
            tba2 = tba.icrop((0, tba.shape[0] - 3), (0, tba.shape[1] - 5))
            NuthKaab().fit(ref2, tba2, random_state=42)
            assert _nuth_kaab_rst_rst_device._cache_size() == n_compiles  # cache hit

    def test_shape_bucketing_texture_shading_unaffected(self):
        # The FFT attribute must not see the NaN pad band (review regression)
        import xdem_tpu
        from xdem_tpu import terrain

        rng = np.random.default_rng(5)
        from scipy.ndimage import gaussian_filter

        d = gaussian_filter(rng.normal(0, 50, (100, 130)), 4).astype(np.float32)
        plain = np.asarray(terrain.get_terrain_attribute(d, "texture_shading", resolution=10.0))
        with xdem_tpu.config_context(shape_bucketing=64):
            bucketed = np.asarray(terrain.get_terrain_attribute(d, "texture_shading",
                                                                resolution=10.0))
        np.testing.assert_allclose(bucketed, plain, rtol=1e-6, atol=1e-5)

    def test_config_bulk_set_validates(self):
        import xdem_tpu

        with pytest.raises(ValueError, match="resampling"):
            xdem_tpu.config.update(resampling="sinc")
        with pytest.raises(KeyError, match="Unknown"):
            xdem_tpu.config.update({"bogus": 1})
        assert xdem_tpu.config["resampling"] == "bilinear"  # unchanged after failures

    def test_coreg_apply_honors_config_resampling(self):
        import xdem_tpu
        from xdem_tpu.coreg import AffineCoreg
        from xdem_tpu.georef import Affine
        from xdem_tpu.raster import Raster

        rng = np.random.default_rng(0)
        t = Affine(10.0, 0, 0, 0, -10.0, 640.0)
        dem = Raster(rng.normal(100, 20, (64, 64)).astype(np.float32), t, 32633)
        step = AffineCoreg.from_translations(3.7, -2.2, 0.5)  # subpixel shift -> resampling
        out_linear = np.asarray(step.apply(dem).data)
        with xdem_tpu.config_context(resampling="nearest"):
            out_nearest = np.asarray(step.apply(dem).data)
        assert not np.allclose(np.nan_to_num(out_linear), np.nan_to_num(out_nearest))

    def test_point_interpretation_half_pixel_shift(self):
        import xdem_tpu
        from xdem_tpu.georef import Affine
        from xdem_tpu.raster import Raster

        data = np.arange(16, dtype=np.float32).reshape(4, 4)
        t = Affine(10.0, 0, 0, 0, -10.0, 40.0)
        area = Raster(data, t, 32633, area_or_point="Area")
        point = Raster(data, t, 32633, area_or_point="Point")
        # Area: value 5 (row 1, col 1) sits at the pixel CENTER (15, 25)
        assert float(area.interp_points(([15.0], [25.0]))[0]) == pytest.approx(5.0)
        # Point: the same sample sits at the pixel CORNER (10, 30)
        assert float(point.interp_points(([10.0], [30.0]))[0]) == pytest.approx(5.0)
        # Toggle off -> Point behaves like Area again
        with xdem_tpu.config_context(shift_area_or_point=False):
            assert float(point.interp_points(([15.0], [25.0]))[0]) == pytest.approx(5.0)

    def test_warn_area_or_point_toggle(self):
        import warnings

        import xdem_tpu
        from xdem_tpu.coreg import VerticalShift
        from xdem_tpu.georef import Affine
        from xdem_tpu.raster import Raster

        t = Affine(10.0, 0, 0, 0, -10.0, 100.0)
        ref = Raster(np.random.default_rng(0).normal(0, 1, (10, 10)).astype(np.float32), t,
                     32633, area_or_point="Area")
        tba = Raster(np.asarray(ref.data) + 1.0, t, 32633, area_or_point="Point")
        with pytest.warns(UserWarning, match="pixel interpretations"):
            VerticalShift().fit(ref, tba)
        with xdem_tpu.config_context(warn_area_or_point=False):
            with warnings.catch_warnings():
                warnings.simplefilter("error")
                VerticalShift().fit(ref, tba)


class TestDeviceMask:
    def test_packed_upload_matches(self):
        from xdem_tpu.ops import device_mask

        rng = np.random.default_rng(2)
        for shape in [(7, 13), (64, 33), (5, 8)]:  # incl. non-multiple-of-8 sizes
            m = rng.random(shape) > 0.4
            got = np.asarray(device_mask(m))
            np.testing.assert_array_equal(got, m)

    def test_none_and_passthrough(self):
        import jax.numpy as jnp

        from xdem_tpu.ops import device_mask

        assert np.asarray(device_mask(None, (3, 4))).all()
        dev = jnp.zeros((2, 2), bool)
        assert device_mask(dev) is not None and not np.asarray(device_mask(dev)).any()
        with pytest.raises(ValueError, match="shape"):
            device_mask(None)


class TestMaskedArrayInputs:
    """np.ma.MaskedArray is the reference's array idiom (geoutils Raster.data): every public
    array entry point must honor the mask — np.asarray() alone silently leaks the garbage
    under it. Each case plants a poison value beneath the mask and checks masked input gives
    the NaN-input result."""

    @pytest.fixture()
    def masked_pair(self):
        rng = np.random.default_rng(7)
        a = (rng.random((40, 40)) * 50 + 100).astype(np.float64)
        mask = rng.random((40, 40)) > 0.8
        poisoned = a.copy()
        poisoned[mask] = 1e9  # garbage under the mask
        ma = np.ma.masked_array(poisoned, mask)
        nan = a.copy()
        nan[mask] = np.nan
        return ma, nan

    def test_terrain(self, masked_pair):
        from xdem_tpu import terrain

        ma, nan = masked_pair
        got = np.asarray(terrain.slope(ma, resolution=10.0))
        want = np.asarray(terrain.slope(nan.astype(np.float32), resolution=10.0))
        np.testing.assert_allclose(got, want, rtol=0, atol=0, equal_nan=True)

    def test_nd_binning(self, masked_pair):
        from xdem_tpu import spatialstats

        ma, nan = masked_pair
        df_ma = spatialstats.nd_binning(ma, [nan], ["v"])
        df_nan = spatialstats.nd_binning(nan, [nan], ["v"])
        np.testing.assert_allclose(df_ma["nanmedian"].values.astype(float),
                                   df_nan["nanmedian"].values.astype(float), equal_nan=True)

    def test_hypsometric_binning(self, masked_pair):
        from xdem_tpu import volume

        ma, nan = masked_pair
        ref = np.tile(np.linspace(0, 400, 40), (40, 1))
        df_ma = volume.hypsometric_binning(ma, ref)
        df_nan = volume.hypsometric_binning(nan, ref)
        np.testing.assert_allclose(df_ma["value"].values, df_nan["value"].values, equal_nan=True)

    def test_polynomial_fit(self, masked_pair):
        from xdem_tpu import fit

        ma, nan = masked_pair
        x = np.tile(np.arange(40.0), (40, 1))
        coefs_ma, deg_ma = fit.robust_norder_polynomial_fit(x.ravel(), ma.ravel(), random_state=1)
        coefs_nan, deg_nan = fit.robust_norder_polynomial_fit(x.ravel(), nan.ravel(), random_state=1)
        assert deg_ma == deg_nan
        np.testing.assert_allclose(coefs_ma, coefs_nan)

    def test_coreg_fit(self, masked_pair):
        from xdem_tpu import coreg

        ma, nan = masked_pair
        transform = (10.0, 0.0, 0.0, 0.0, -10.0, 400.0)
        c_ma = coreg.VerticalShift(subsample=1000)
        c_ma.fit(nan + 2.0, ma, transform=transform, crs=32633, random_state=1)
        c_nan = coreg.VerticalShift(subsample=1000)
        c_nan.fit(nan + 2.0, nan, transform=transform, crs=32633, random_state=1)
        assert c_ma.meta["outputs"]["affine"]["shift_z"] == pytest.approx(
            c_nan.meta["outputs"]["affine"]["shift_z"], abs=1e-6)


class TestRaster:
    def test_value_at_coords(self, ref_dem_test):
        """Nearest-pixel lookup (geoutils Raster.value_at_coords): exact pixel values at
        pixel centers, NaN out of bounds, scalar for scalar input."""
        arr = np.asarray(ref_dem_test.data)
        x, y = ref_dem_test.ij2xy(np.array([3, 10]), np.array([7, 2]))
        vals = ref_dem_test.value_at_coords(x, y)
        assert vals == pytest.approx([arr[3, 7], arr[10, 2]])
        b = ref_dem_test.bounds
        assert np.isnan(ref_dem_test.value_at_coords(b.left - 100.0, b.top + 100.0))
        one = ref_dem_test.value_at_coords(float(np.atleast_1d(x)[0]), float(np.atleast_1d(y)[0]))
        assert np.ndim(one) == 0 and one == pytest.approx(arr[3, 7])
        # Off-center points stay in the CONTAINING pixel (fractional rowcol rounds, not
        # truncates): 0.4 px east/south of the (3, 7) center is still pixel (3, 7)
        rx, ry = ref_dem_test.res
        off = ref_dem_test.value_at_coords(float(np.atleast_1d(x)[0]) + 0.4 * rx,
                                           float(np.atleast_1d(y)[0]) - 0.4 * ry)
        assert off == pytest.approx(arr[3, 7])
        # And just inside the left edge is pixel column 0, not out of bounds
        edge = ref_dem_test.value_at_coords(b.left + 0.1 * rx, float(np.atleast_1d(y)[0]))
        assert edge == pytest.approx(arr[3, 0])
        # Array-in/array-out even for a single point (geoutils contract)
        one_arr = ref_dem_test.value_at_coords(np.atleast_1d(x)[:1], np.atleast_1d(y)[:1])
        assert one_arr.shape == (1,) and one_arr[0] == pytest.approx(arr[3, 7])
        # NaN coordinates give NaN, silently (filterwarnings turns warnings into errors)
        assert np.isnan(ref_dem_test.value_at_coords(np.nan, np.nan))
        # Point-convention rasters read the SAME pixel as interp_points(method="nearest")
        pt = ref_dem_test.copy()
        pt.set_area_or_point("Point", shift_area_or_point=False)
        xq = float(np.atleast_1d(x)[0]) + 0.2 * rx
        yq = float(np.atleast_1d(y)[0]) - 0.2 * ry
        v_nn = float(np.asarray(pt.interp_points((xq, yq), method="nearest")))
        assert pt.value_at_coords(xq, yq) == pytest.approx(v_nn)

    def test_reproject_to_self_grid(self, ref_dem_test):
        back = ref_dem_test.reproject(ref_dem_test)
        a = np.asarray(ref_dem_test.data)
        b = np.asarray(back.data)
        both = np.isfinite(a) & np.isfinite(b)
        assert np.allclose(a[both], b[both], atol=1e-3)

    def test_translate_roundtrip(self, ref_dem_test):
        shifted = ref_dem_test.translate(35.0, -12.0)
        assert shifted.bounds.left == pytest.approx(ref_dem_test.bounds.left + 35.0)
        # Regridding the shifted raster back onto the original grid undoes the shift (interior)
        back = shifted.reproject(ref_dem_test)
        a = np.asarray(ref_dem_test.data)
        b = np.asarray(back.data)
        # interior only (edges lose data)
        interior = np.zeros(a.shape, bool)
        interior[5:-5, 5:-5] = True
        both = np.isfinite(a) & np.isfinite(b) & interior
        # values at shifted positions differ, but the grid georeferencing should be exact:
        assert back.transform.almost_equals(ref_dem_test.transform)
        assert both.sum() > 0

    def test_crop(self, ref_dem_full):
        b = ref_dem_full.bounds
        sub = ref_dem_full.crop((b.left + 2000, b.bottom + 2000, b.left + 6000, b.bottom + 6000))
        assert sub.width < ref_dem_full.width
        assert sub.res == ref_dem_full.res

    def test_crop_match_extent(self, ref_dem_full):
        """mode="match_extent" matches the requested bounds EXACTLY, adjusting resolution
        (geoutils crop semantics); match_pixel snaps to the grid instead."""
        b = ref_dem_full.bounds
        # Off-grid bounds: not multiples of the 20 m pixel
        bbox = (b.left + 2013.0, b.bottom + 1997.0, b.left + 6008.0, b.bottom + 6011.0)
        sub = ref_dem_full.crop(bbox, mode="match_extent")
        sb = sub.bounds
        assert (sb.left, sb.bottom, sb.right, sb.top) == pytest.approx(bbox, abs=1e-6)
        # Resolution stays within half a pixel of the source
        assert sub.res[0] == pytest.approx(ref_dem_full.res[0], rel=0.05)
        # match_pixel with the same box does NOT match the bounds exactly
        snap = ref_dem_full.crop(bbox)
        assert snap.bounds.left != pytest.approx(bbox[0], abs=1e-6)

    def test_crop_bad_mode_raises(self, ref_dem_full):
        b = ref_dem_full.bounds
        with pytest.raises(ValueError, match="match_pixel"):
            ref_dem_full.crop((b.left, b.bottom, b.right, b.top), mode="exact")

    def test_reproject_silent_false_warns_on_noop(self, ref_dem_test):
        with pytest.warns(UserWarning, match="identical"):
            ref_dem_test.reproject(ref_dem_test, silent=False)
        # Default silent=True stays quiet (the full suite turns UserWarning into errors,
        # so reaching this line IS the assertion)
        ref_dem_test.reproject(ref_dem_test)

    def test_arithmetic(self, ref_dem_test):
        dd = ref_dem_test - ref_dem_test
        assert np.nanmax(np.abs(np.asarray(dd.data))) == 0

    def test_comparison_casts_to_mask(self, ref_dem_test):
        """Comparisons yield boolean mask rasters like the reference's geoutils Raster
        (reference tests/test_dem.py:161-168); NaN nodata compares False."""
        arr = np.asarray(ref_dem_test.data)
        thresh = float(np.nanmedian(arr))
        mask = ref_dem_test > thresh
        got = np.asarray(mask.data)
        assert got.dtype == np.bool_ and type(mask) is type(ref_dem_test)
        want = np.where(np.isfinite(arr), arr > thresh, False)
        np.testing.assert_array_equal(got, want)
        # Complements partition the finite pixels
        low = np.asarray((ref_dem_test <= thresh).data)
        assert not (got & low).any()
        assert ((got | low) == np.isfinite(arr)).all()

    def test_extra_arithmetic_ops(self, ref_dem_test):
        arr = np.asarray(ref_dem_test.data)
        np.testing.assert_allclose(np.asarray((2.0 * ref_dem_test).data), 2.0 * arr)
        np.testing.assert_allclose(np.asarray(abs(-ref_dem_test).data), np.abs(arr))
        np.testing.assert_allclose(np.asarray((ref_dem_test ** 2).data), arr ** 2, rtol=1e-6)
        with np.errstate(divide="ignore", invalid="ignore"):
            np.testing.assert_allclose(np.asarray((1.0 / ref_dem_test).data), 1.0 / arr, rtol=1e-6)

    def test_get_stats_reference_aliases(self, ref_dem_test):
        """get_stats accepts the reference's stat names case/space-insensitively, including
        LE90 / 90th percentile / sum of squares (geoutils Raster.get_stats alias set)."""
        s = ref_dem_test.get_stats(["LE90", "90thpercentile", "sumofsquares",
                                    "Standard deviation", "validcount", "Maximum"])
        arr = np.asarray(ref_dem_test.data)
        v = arr[np.isfinite(arr)]
        # LE90 is geoutils' linear_error: the central 90% interval width p95 - p5
        assert s["LE90"] == float(np.percentile(v, 95) - np.percentile(v, 5))
        assert s["90thpercentile"] == float(np.percentile(v, 90))
        assert s["sumofsquares"] == pytest.approx(float(np.sum(v ** 2)), rel=1e-6)
        assert s["Standard deviation"] == float(np.std(v))
        assert s["validcount"] == v.size
        assert s["Maximum"] == float(np.max(v))
        # Single-string form returns the scalar (reference accuracy.py:230)
        assert ref_dem_test.get_stats("mean") == float(np.mean(v))
        with pytest.raises(KeyError, match="Unknown statistic"):
            ref_dem_test.get_stats(["bogus"])

    def test_deprecate_version_gate(self):
        """deprecate() warns until the removal version, then raises (reference
        _misc.py:92-151, tests/test_misc.py:52)."""
        from xdem_tpu._misc import deprecate

        @deprecate(removal_version="9.9.9", details="Use shiny instead.")
        def f():
            return 1

        with pytest.warns(DeprecationWarning, match="removed in version 9.9.9"):
            assert f() == 1

        @deprecate(removal_version="0.0.1")
        def g():
            return 1

        with pytest.raises(ValueError, match="was removed in 0.0.1"):
            g()

    def test_diff_environment_yml(self, capsys):
        """diff_environment_yml prints dev-only deps (conda line, then pip line with 'None'
        placeholder) and raises when a base dep is missing from dev (reference
        _misc.py:214-298, tests/test_misc.py env-diff cases)."""
        from xdem_tpu._misc import diff_environment_yml

        env = {"dependencies": ["numpy", "jax", {"pip": ["alpha"]}]}
        devenv = {"dependencies": ["numpy", "jax", "pytest", {"pip": ["alpha", "beta", "-e ./"]}]}
        diff_environment_yml(env, devenv, input_dict=True)
        out = capsys.readouterr().out.splitlines()
        assert out == ["pytest", "beta"]

        diff_environment_yml(env, env, input_dict=True, print_dep="pip")
        assert capsys.readouterr().out.splitlines() == ["None"]

        with pytest.raises(ValueError, match="listed in env but not dev-env"):
            diff_environment_yml({"dependencies": ["onlyinenv"]}, {"dependencies": []}, input_dict=True)
        with pytest.raises(ValueError, match='"print_dep"'):
            diff_environment_yml(env, devenv, input_dict=True, print_dep="bogus")

    def test_set_mask_and_subsample(self, ref_dem_test):
        """set_mask poisons pixels to nodata in place; subsample draws valid values or
        (rows, cols) indices (reference geoutils Raster methods used across its docs)."""
        dem = ref_dem_test.copy()
        mask = np.zeros(dem.shape, dtype=bool)
        mask[:10, :10] = True
        dem.set_mask(mask)
        assert not np.isfinite(np.asarray(dem.data)[:10, :10]).any()
        with pytest.raises(ValueError, match="shape"):
            dem.set_mask(np.ones((3, 3), dtype=bool))
        vals = ref_dem_test.subsample(0.1, random_state=1)
        n_valid = int(np.isfinite(np.asarray(ref_dem_test.data)).sum())
        assert vals.size == int(0.1 * n_valid) and np.isfinite(vals).all()
        rr, cc = ref_dem_test.subsample(50, random_state=1, return_indices=True)
        assert rr.size == 50
        assert np.isfinite(np.asarray(ref_dem_test.data)[rr, cc]).all()
        # subsample <= 1 is a FRACTION even as an int: 1 means all valid pixels
        assert ref_dem_test.subsample(1).size == n_valid
        # A float mask's NaN (= the mask raster has no data there) must not mask
        d2 = ref_dem_test.copy()
        fmask = np.zeros(d2.shape, np.float32)
        fmask[0, 0] = np.nan
        fmask[1, 1] = 1.0
        d2.set_mask(fmask)
        a2 = np.asarray(d2.data)
        a0 = np.asarray(ref_dem_test.data)
        assert np.isfinite(a2[0, 0]) == np.isfinite(a0[0, 0])
        assert not np.isfinite(a2[1, 1])

    def test_eq_mask_and_ambiguous_bool(self, ref_dem_test):
        """== / != are elementwise mask rasters; truthiness raises like numpy; None
        comparison keeps object semantics."""
        eq = ref_dem_test == ref_dem_test
        arr = np.asarray(eq.data)
        assert arr.dtype == np.bool_
        assert arr[np.isfinite(np.asarray(ref_dem_test.data))].all()
        assert (ref_dem_test == None) is False  # noqa: E711
        assert (ref_dem_test != None) is True  # noqa: E711
        with pytest.raises(ValueError, match="ambiguous"):
            bool(ref_dem_test)
        # hashable despite __eq__ (identity hash)
        assert len({ref_dem_test, ref_dem_test}) == 1

    def test_vector_rasterize_index_map(self, ref_dem_test):
        """Vector.rasterize burns per-feature indices 1..N by default, a scalar otherwise
        (reference geoutils Vector.rasterize, plot_norm_regional_hypso.py:49)."""
        outlines = examples.get_glacier_outlines()
        full = examples.get_ref_dem()
        idx = outlines.rasterize(full)
        arr = np.asarray(idx.data)
        mask = outlines.create_mask(full)
        assert ((arr > 0) == mask).all()
        assert arr.max() <= len(outlines.polygons)
        burn = outlines.rasterize(full, in_value=7.5, out_value=np.nan)
        b = np.asarray(burn.data)
        assert np.nanmax(b) == 7.5 and np.isnan(b[~mask]).all()
        with pytest.raises(ValueError, match="entries"):
            outlines.rasterize(full, in_value=[1.0])

    def test_path_constructor_downsample_and_nodata(self, ref_dem_test, tmp_path):
        """DEM(path, downsample=N) decimates on load; nodata= forces the nodata value
        (reference dem.py:92 via geoutils' decimated read)."""
        from xdem_tpu.dem import DEM

        p = str(tmp_path / "d.tif")
        ref_dem_test.save(p)
        full = DEM(p)
        half = DEM(p, downsample=2)
        assert half.res[0] == 2 * full.res[0]
        np.testing.assert_array_equal(np.asarray(half.data), np.asarray(full.data)[::2, ::2])
        assert half.bounds.left == full.bounds.left and half.bounds.top == full.bounds.top
        forced = DEM(p, nodata=float(np.nanmax(np.asarray(full.data))))
        assert (~np.isfinite(np.asarray(forced.data))).sum() > (~np.isfinite(np.asarray(full.data))).sum()
        with pytest.raises(TypeError, match="file path"):
            DEM(np.ones((4, 4)), full.transform, full.crs, downsample=2)

    def test_to_pointcloud(self, ref_dem_test):
        pc = ref_dem_test.to_pointcloud(subsample=1000, random_state=42)
        assert len(pc) == 1000
        assert pc.crs == ref_dem_test.crs


class TestExamples:
    def test_shapes_and_shift(self):
        ref = examples.get_ref_dem_test()
        tba = examples.get_tba_dem_test()
        assert ref.shape == tba.shape
        assert ref.crs == CRS(32633)

    def test_mask(self):
        mask = examples.get_glacier_mask()
        assert mask.dtype == bool and mask.any() and not mask.all()

    def test_vector_mask_rasterization(self):
        ref = examples.get_ref_dem()
        outlines = examples.get_glacier_outlines()
        mask = outlines.create_mask(ref)
        true_mask = examples.get_glacier_mask()
        # Convex hulls cover the blobs: vast majority of true pixels inside
        assert (mask & true_mask).sum() / true_mask.sum() > 0.95

    def test_vector_crop(self, ref_dem_test):
        """Vector.crop keeps intersecting features; clip=True cuts rings to the rectangle
        (the reference crops outlines to a cropped DEM's bounds, examples.py:245)."""
        from xdem_tpu.vector import Vector

        sq = np.array([[0.0, 0.0], [10.0, 0.0], [10.0, 10.0], [0.0, 10.0], [0.0, 0.0]])
        far = sq + 100.0
        v = Vector([[sq], [far]], crs=32633, properties=[{"name": "near"}, {"name": "far"}])
        out = v.crop((-5.0, -5.0, 5.0, 5.0))
        assert len(out) == 1 and out.properties[0]["name"] == "near"
        # True geometric intersection, not bbox: a triangle whose bbox overlaps the crop
        # rectangle but whose geometry is disjoint must be dropped
        tri = np.array([[0.0, 0.0], [10.0, 0.0], [0.0, 10.0]])
        vt = Vector([[tri]], crs=32633)
        assert len(vt.crop((6.0, 6.0, 9.0, 9.0))) == 0
        assert len(vt.crop((1.0, 1.0, 4.0, 4.0))) == 1
        clipped = v.crop((-5.0, -5.0, 5.0, 5.0), clip=True)
        assert len(clipped) == 1
        ring = clipped.polygons[0][0]
        assert ring[:, 0].max() <= 5.0 and ring[:, 1].max() <= 5.0
        assert ring[:, 0].min() >= 0.0 and ring[:, 1].min() >= 0.0
        # Raster input: cropping the full outlines to the test DEM keeps a subset
        full = examples.get_glacier_outlines()
        sub = full.crop(ref_dem_test)
        assert 0 < len(sub) <= len(full)
        # Every kept feature's bbox intersects the DEM bounds
        b = ref_dem_test.bounds
        for poly in sub.polygons:
            ext = poly[0]
            assert ext[:, 0].max() >= b.left and ext[:, 0].min() <= b.right
            assert ext[:, 1].max() >= b.bottom and ext[:, 1].min() <= b.top


class TestExamplePaths:
    def test_get_path_dem(self, tmp_path, monkeypatch):
        import xdem_tpu.examples as ex

        monkeypatch.setattr(ex, "_CACHE_DIR", str(tmp_path))
        p = ex.get_path_test("longyearbyen_ref_dem")
        from xdem_tpu.dem import DEM

        dem = DEM.open(p)
        assert dem.crs.epsg == 32633
        # Cached on second call
        assert ex.get_path_test("longyearbyen_ref_dem") == p

    def test_get_path_outlines(self, tmp_path, monkeypatch):
        import json

        import xdem_tpu.examples as ex

        monkeypatch.setattr(ex, "_CACHE_DIR", str(tmp_path))
        p = ex.get_path("longyearbyen_glacier_outlines")
        geo = json.load(open(p))
        assert geo["type"] == "FeatureCollection"

    def test_unknown_name_raises(self):
        from xdem_tpu import examples as ex

        with pytest.raises(ValueError, match="not in available"):
            ex.get_path("bogus_dataset")

    def test_get_all_data(self, tmp_path):
        """get_all_data generates every dataset and can copy them out (reference
        examples.py:204-212)."""
        import os

        from xdem_tpu import examples as ex

        out = ex.get_all_data(output_dir=str(tmp_path / "copyto"))
        files = os.listdir(out)
        # One file per available dataset, names preserved
        for name in ex.available:
            assert any(f.startswith(name) for f in files), name


class TestConicAndDatumCRS:
    """LCC / Albers / non-WGS84 UTM datums, validated by self-consistent oracles:
    exact definition points, roundtrips, and numeric scale/area factors (which pin the
    projection constants without external coordinate tables)."""

    @staticmethod
    def _ellipsoidal_dists(lon, lat, dlon, dlat, a=6378137.0, f=1 / 298.257222101):
        """Local ellipsoidal distances for small displacements (dlon, dlat) in degrees."""
        e2 = f * (2 - f)
        phi = np.deg2rad(lat)
        N = a / np.sqrt(1 - e2 * np.sin(phi) ** 2)
        M = a * (1 - e2) / (1 - e2 * np.sin(phi) ** 2) ** 1.5
        return np.deg2rad(dlon) * N * np.cos(phi), np.deg2rad(dlat) * M

    def test_lcc_definition_point_and_roundtrip(self):
        # Lambert-93: the grid origin is exactly (x_0, y_0) at (lon_0, lat_0)
        x, y = transform_points(4326, 2154, np.array([3.0]), np.array([46.5]))
        assert x[0] == pytest.approx(700000.0, abs=1e-6)
        assert y[0] == pytest.approx(6600000.0, abs=1e-6)
        lon = np.linspace(-4.5, 8.0, 12)
        lat = np.linspace(41.5, 51.0, 12)
        x, y = transform_points(4326, 2154, lon, lat)
        lon2, lat2 = transform_points(2154, 4326, x, y)
        np.testing.assert_allclose(lon2, lon, atol=1e-9)
        np.testing.assert_allclose(lat2, lat, atol=1e-9)

    @pytest.mark.parametrize("lat_sp", [49.0, 44.0])
    def test_lcc_unit_scale_at_standard_parallels(self, lat_sp):
        lon0 = 3.0
        eps = 1e-5
        x0, y0 = transform_points(4326, 2154, np.array([lon0]), np.array([lat_sp]))
        x1, _ = transform_points(4326, 2154, np.array([lon0 + eps]), np.array([lat_sp]))
        _, y2 = transform_points(4326, 2154, np.array([lon0]), np.array([lat_sp + eps]))
        de, dn = self._ellipsoidal_dists(lon0, lat_sp, eps, eps)
        k_along = (x1[0] - x0[0]) / de
        k_across = (y2[0] - y0[0]) / dn
        assert k_along == pytest.approx(1.0, abs=2e-6)
        assert k_across == pytest.approx(1.0, abs=2e-6)  # conformal: equal scales

    @pytest.mark.parametrize("epsg,lon_rng,lat_rng", [
        (5070, (-120.0, -75.0), (25.0, 48.0)),   # NAD83 Conus Albers
        (3577, (115.0, 150.0), (-42.0, -12.0)),  # GDA94 Australian Albers (n < 0)
    ])
    def test_albers_roundtrip_and_equal_area(self, epsg, lon_rng, lat_rng):
        lon = np.linspace(*lon_rng, 9)
        lat = np.linspace(*lat_rng, 9)
        x, y = transform_points(4326, epsg, lon, lat)
        lon2, lat2 = transform_points(epsg, 4326, x, y)
        np.testing.assert_allclose(lon2, lon, atol=1e-8)
        np.testing.assert_allclose(lat2, lat, atol=1e-8)
        # Equal-area: the numeric Jacobian determinant equals the ellipsoidal area element
        eps = 1e-5
        for lo, la in [(np.mean(lon_rng), np.mean(lat_rng)), (lon_rng[0] + 2, lat_rng[1] - 2)]:
            x00, y00 = transform_points(4326, epsg, np.array([lo]), np.array([la]))
            x10, y10 = transform_points(4326, epsg, np.array([lo + eps]), np.array([la]))
            x01, y01 = transform_points(4326, epsg, np.array([lo]), np.array([la + eps]))
            J = (x10[0] - x00[0]) * (y01[0] - y00[0]) - (x01[0] - x00[0]) * (y10[0] - y00[0])
            de, dn = self._ellipsoidal_dists(lo, la, eps, eps)
            assert J / (de * dn) == pytest.approx(1.0, abs=5e-6)

    def test_nad83_utm_matches_wgs84_utm(self):
        # GRS80 vs WGS84 differ by <0.1 mm in flattening: same zone must agree to ~mm
        lon = np.array([-75.5, -74.2])
        lat = np.array([40.0, 44.5])
        x83, y83 = transform_points(4326, 26918, lon, lat)
        x84, y84 = transform_points(4326, 32618, lon, lat)
        np.testing.assert_allclose(x83, x84, atol=2e-3)
        np.testing.assert_allclose(y83, y84, atol=2e-3)

    def test_etrs89_and_mga_roundtrip(self):
        for epsg, lon, lat in [(25832, 9.5, 51.0), (28355, 146.5, -37.0)]:
            x, y = transform_points(4326, epsg, np.array([lon]), np.array([lat]))
            lon2, lat2 = transform_points(epsg, 4326, x, y)
            assert lon2[0] == pytest.approx(lon, abs=1e-9)
            assert lat2[0] == pytest.approx(lat, abs=1e-9)
        # MGA southern false northing
        _, y = transform_points(4326, 28355, np.array([147.0]), np.array([-37.0]))
        assert 5.5e6 < y[0] < 6.2e6

    def test_ed50_datum_shift_structure(self):
        # ED50 differs from WGS84 by the 3-parameter European shift: offset must be
        # ~100-300 m horizontally in western Europe, and exactly invertible
        lon = np.array([5.0, 9.0])
        lat = np.array([52.0, 47.0])
        xe, ye = transform_points(4326, 23031, lon, lat)
        xw, yw = transform_points(4326, 32631, lon, lat)
        d = np.hypot(xe - xw, ye - yw)
        assert ((d > 80) & (d < 350)).all()
        lon2, lat2 = transform_points(23031, 4326, xe, ye)
        np.testing.assert_allclose(lon2, lon, atol=1e-8)
        np.testing.assert_allclose(lat2, lat, atol=1e-8)

    def test_lambert_zone_ii(self):
        # NTF (Paris) / Lambert zone II (etendu): roundtrip + scale k_0 at the origin
        # latitude + Paris plausibility box
        x, y = transform_points(4326, 27572, np.array([2.3522]), np.array([48.8566]))
        assert 5.8e5 < x[0] < 6.2e5 and 2.40e6 < y[0] < 2.45e6
        lon = np.linspace(-2.0, 7.0, 8)
        lat = np.linspace(45.0, 50.0, 8)
        xs, ys = transform_points(4326, 27572, lon, lat)
        lon2, lat2 = transform_points(27572, 4326, xs, ys)
        np.testing.assert_allclose(lon2, lon, atol=1e-8)
        np.testing.assert_allclose(lat2, lat, atol=1e-8)
        # The 1SP scale is defined in NTF space on the Clarke 1880 ellipsoid: measure it
        # there directly (the WGS84 path adds a datum-shifted latitude, skewing the oracle)
        from xdem_tpu.georef import _PROJ_DEFS, _lcc_forward

        eps = 1e-5
        p = _PROJ_DEFS[27572]
        lo, la = p["lon_0"], p["lat_0"]
        x0, _ = _lcc_forward(np.array([lo]), np.array([la]), p)
        x1, _ = _lcc_forward(np.array([lo + eps]), np.array([la]), p)
        de, _ = self._ellipsoidal_dists(lo, la, eps, eps, a=6378249.2, f=1 / 293.4660212936269)
        assert (x1[0] - x0[0]) / de == pytest.approx(0.99987742, abs=1e-6)


class TestCropSnap:
    """Raster.crop pixel-grid snapping semantics (reference geoutils crop behavior)."""

    def _raster(self):
        from xdem_tpu.raster import Raster

        data = np.arange(100, dtype=np.float32).reshape(10, 10)
        t = Affine(10.0, 0.0, 1000.0, 0.0, -10.0, 2000.0)
        return Raster(data, t, 32633)

    def test_exact_pixel_bounds(self):
        r = self._raster()
        out = r.crop((1020.0, 1950.0, 1060.0, 1980.0))
        assert out.shape == (3, 4)
        assert out.bounds == (1020.0, 1950.0, 1060.0, 1980.0)
        np.testing.assert_array_equal(np.asarray(out.data), np.asarray(r.data)[2:5, 2:6])

    def test_subpixel_bounds_snap(self):
        r = self._raster()
        # Bounds inside pixel interiors snap to the nearest pixel edges
        out = r.crop((1024.0, 1947.0, 1058.0, 1976.0))
        assert out.transform.c % 10 == 0 and out.transform.f % 10 == 0
        assert out.bounds[0] in (1020.0, 1030.0)
        # Snapped window must still cover a grid-aligned subset
        assert out.shape[0] >= 2 and out.shape[1] >= 2

    def test_crop_to_other_raster(self):
        r = self._raster()
        sub = r.icrop((3, 8), (2, 7))
        out = r.crop(sub)
        assert out.bounds == sub.bounds
        np.testing.assert_array_equal(np.asarray(out.data), np.asarray(sub.data))

    def test_disjoint_raises(self):
        r = self._raster()
        with pytest.raises(ValueError, match="intersect"):
            r.crop((5000.0, 5000.0, 6000.0, 6000.0))


class TestProjectionControlPoints:
    """External authoritative fixed points: EPSG Guidance Note 7-2 worked examples and the
    swisstopo projection reference point. These pin the transcribed projection constants —
    a self-consistent transcription error (wrong lat_2, Helmert term, ...) that survives
    roundtrip tests cannot survive an independent published coordinate."""

    @staticmethod
    def _dms(d, m, s):
        sgn = -1 if d < 0 else 1
        return sgn * (abs(d) + m / 60 + s / 3600)

    def _fwd_raw(self, code_or_def, lon, lat):
        from xdem_tpu import projections as P

        d = code_or_def if isinstance(code_or_def, dict) else P.epsg_def(code_or_def)
        p = P.normalize_def(d)
        x, y = P.projdef_forward_raw(p, np.array([lon]), np.array([lat]))
        return float(x[0]), float(y[0])

    def test_tmerc_osgb_worked_example(self):
        # EPSG GN7-2 Transverse Mercator example (OSGB36/BNG): 50d30'N 00d30'E
        x, y = self._fwd_raw(27700, 0.5, 50.5)
        assert x == pytest.approx(577274.99, abs=0.02)
        assert y == pytest.approx(69740.50, abs=0.02)

    def test_lcc2sp_texas_worked_example(self):
        # EPSG GN7-2 LCC (2SP) example: NAD27 Texas South Central, US survey feet
        ft = 1200.0 / 3937.0
        d = dict(proj="lcc", ellps="clrk66", lat_1=self._dms(28, 23, 0),
                 lat_2=self._dms(30, 17, 0), lat_0=self._dms(27, 50, 0), lon_0=-99.0,
                 x_0=2000000 * ft, y_0=0.0)
        x, y = self._fwd_raw(d, -96.0, 28.5)
        assert x / ft == pytest.approx(2963503.91, abs=0.05)
        assert y / ft == pytest.approx(254759.80, abs=0.05)

    def test_lcc1sp_jamaica_worked_example(self):
        # EPSG GN7-2 LCC (1SP) example: Jamaica 1969 / Jamaica National Grid (Clarke 1866),
        # 17d55'55.80"N 76d56'37.26"W -> E 255966.58, N 142493.51
        d = dict(proj="lcc", ellps="clrk66", lat_1=18.0, lat_0=18.0, lon_0=-77.0,
                 k_0=1.0, x_0=250000.0, y_0=150000.0)
        x, y = self._fwd_raw(d, -self._dms(76, 56, 37.26), self._dms(17, 55, 55.80))
        assert x == pytest.approx(255966.58, abs=0.05)
        assert y == pytest.approx(142493.51, abs=0.05)

    def test_polar_stereo_variant_b_worked_example(self):
        # EPSG GN7-2 PS variant B example: Australian Antarctic (EPSG:3032), 75dS 120dE
        x, y = self._fwd_raw(3032, 120.0, -75.0)
        assert x == pytest.approx(7255380.79, abs=0.02)
        assert y == pytest.approx(7053389.56, abs=0.02)

    def test_oblique_stereographic_rd_worked_example(self):
        # EPSG GN7-2 Oblique Stereographic example: Amersfoort / RD New, 53dN 6dE
        x, y = self._fwd_raw(28992, 6.0, 53.0)
        assert x == pytest.approx(196105.283, abs=0.005)
        assert y == pytest.approx(557057.739, abs=0.005)

    def test_laea_europe_worked_example(self):
        # EPSG GN7-2 LAEA example: ETRS89-LAEA (EPSG:3035), 50dN 5dE
        x, y = self._fwd_raw(3035, 5.0, 50.0)
        assert x == pytest.approx(3962799.45, abs=0.02)
        assert y == pytest.approx(2999718.85, abs=0.02)

    def test_albers_snyder_worked_example(self):
        # Snyder 1987 p.292 ellipsoidal Albers example (Clarke 1866), 35dN 75dW
        d = dict(proj="aea", ellps="clrk66", lat_1=29.5, lat_2=45.5, lat_0=23.0, lon_0=-96.0)
        x, y = self._fwd_raw(d, -75.0, 35.0)
        assert x == pytest.approx(1885472.7, abs=0.1)
        assert y == pytest.approx(1535925.0, abs=0.1)

    def test_mercator_makassar_worked_example(self):
        # EPSG GN7-2 Mercator (variant A) example: Makassar / NEIEZ, 3dS 120dE
        d = dict(proj="merc", ellps="bessel", k_0=0.997, lon_0=110.0,
                 x_0=3900000.0, y_0=900000.0)
        x, y = self._fwd_raw(d, 120.0, -3.0)
        assert x == pytest.approx(5009726.58, abs=0.02)
        assert y == pytest.approx(569150.82, abs=0.02)

    def test_swiss_lv03_reference_point_full_datum_path(self):
        # swisstopo reference: ETRS/WGS84 46d02'38.87"N 8d43'49.79"E -> LV03 (700000, 100000).
        # Exercises the CH1903 Helmert shift AND the somerc kernel end to end.
        from xdem_tpu import projections as P

        p = P.normalize_def(P.epsg_def(21781))
        x, y = P.projdef_from_wgs84(
            p, np.array([self._dms(8, 43, 49.79)]), np.array([self._dms(46, 2, 38.87)])
        )
        assert float(x[0]) == pytest.approx(700000.0, abs=0.1)
        assert float(y[0]) == pytest.approx(100000.0, abs=0.1)

    def test_helmert_position_vector_wgs72_example(self):
        # EPSG GN7-2 position-vector 7-parameter example (WGS72 -> WGS84) in ECEF
        from xdem_tpu import projections as P

        m, _, t = P._helmert_matrices((0.0, 0.0, 4.5, 0.0, 0.0, 0.554, 0.219))
        out = m @ np.array([3657660.66, 255768.55, 5201382.11]) + t
        np.testing.assert_allclose(out, [3657660.78, 255778.43, 5201387.75], atol=0.01)

    def test_lambert93_definition_point(self):
        # IGN: the Lambert-93 natural origin (3dE, 46.5dN) is exactly (700000, 6600000)
        x, y = self._fwd_raw(2154, 3.0, 46.5)
        assert x == pytest.approx(700000.0, abs=1e-6)
        assert y == pytest.approx(6600000.0, abs=1e-6)


class TestGenericCRS:
    """The generic CRS front-end: arbitrary EPSG codes, proj-strings, WKT1/WKT2 — every
    family that was previously outside the curated table (reference: pyproj-everywhere,
    /root/reference/xdem/dem.py:150-173)."""

    # 25 previously-unsupported real-world EPSG codes across all new families
    NEW_CODES = [
        27700, 29903, 2157,              # GB / Ireland TM grids
        21781, 2056,                     # Swiss somerc
        28992, 3844,                     # double stereographic
        3035, 6931, 6932, 2163,          # LAEA (oblique, polar, sphere)
        3067, 3006, 2180, 2193,          # national TM grids
        31467,                           # DHDN Gauss-Krueger (7-param Helmert)
        27561, 27573,                    # NTF Lambert 1SP zones
        3395,                            # world Mercator
        4087,                            # equidistant cylindrical
        6933,                            # cylindrical equal area
        3976, 3032, 5041,                # polar stereographic variants
        26712,                           # NAD27 UTM (datum-shifted range family)
        32233,                           # WGS72 UTM (7-param range family)
        3338,                            # Alaska Albers
    ]

    # Representative in-extent test coordinates (lon, lat) per code
    COORDS = {
        27700: (-1.5, 52.5), 29903: (-7.5, 53.5), 2157: (-7.5, 53.5),
        21781: (8.0, 46.8), 2056: (8.0, 46.8), 28992: (5.5, 52.2), 3844: (25.0, 45.8),
        3035: (10.0, 51.0), 6931: (-40.0, 75.0), 6932: (100.0, -75.0), 2163: (-100.0, 45.0),
        3067: (25.0, 62.0), 3006: (15.0, 60.0), 2180: (19.0, 52.0), 2193: (172.0, -41.0),
        31467: (9.0, 50.5), 27561: (2.0, 49.0), 27573: (3.0, 44.0), 3395: (10.0, 45.0),
        4087: (10.0, 45.0), 6933: (10.0, 45.0), 3976: (0.0, -75.0), 3032: (70.0, -70.0),
        5041: (10.0, 85.0), 26712: (-111.0, 45.0), 32233: (-153.0, 60.0), 3338: (-150.0, 62.0),
    }

    @pytest.mark.parametrize("code", NEW_CODES)
    def test_roundtrip_and_io(self, code, tmp_path):
        """Every new CRS: transform roundtrip is exact, and a DEM in it opens from GeoTIFF."""
        from xdem_tpu.io import read_raster, write_raster
        from xdem_tpu.raster import Raster

        lon0, lat0 = self.COORDS[code]
        lon = np.linspace(lon0 - 0.2, lon0 + 0.2, 7)
        lat = np.linspace(lat0 - 0.2, lat0 + 0.2, 7)
        x, y = transform_points(4326, code, lon, lat)
        assert np.all(np.isfinite(x)) and np.all(np.isfinite(y))
        lon2, lat2 = transform_points(code, 4326, x, y)
        np.testing.assert_allclose(np.mod(lon2 - lon + 180, 360) - 180, 0, atol=2e-7)
        np.testing.assert_allclose(lat2 - lat, 0, atol=2e-7)
        # GeoTIFF write/read preserves the CRS identity
        t = Affine(50.0, 0.0, float(np.min(x)), 0.0, -50.0, float(np.max(y)))
        r = Raster(np.random.default_rng(1).normal(size=(8, 9)).astype(np.float32), t, code)
        path = str(tmp_path / f"dem_{code}.tif")
        write_raster(path, r)
        back = read_raster(path)
        assert back.crs == CRS(code)

    @pytest.mark.parametrize("code", [27700, 21781, 28992, 3035, 2193, 31467, 3844])
    def test_reproject_dem_between_new_crs(self, code):
        """A synthetic DEM in each new CRS reprojects onto UTM with sensible values."""
        from xdem_tpu.raster import Raster

        lon0, lat0 = self.COORDS[code]
        xs, ys = transform_points(4326, code, np.array([lon0]), np.array([lat0]))
        t = Affine(40.0, 0.0, float(xs[0]), 0.0, -40.0, float(ys[0]))
        rng = np.random.default_rng(0)
        data = (rng.normal(size=(40, 40)) + 100.0).astype(np.float32)
        r = Raster(data, t, code)
        utm = suggest_utm_crs(lon0, lat0)
        out = r.reproject(crs=utm)
        arr = np.asarray(out.data)
        valid = np.isfinite(arr)
        assert valid.mean() > 0.2
        assert abs(np.nanmean(arr) - 100.0) < 2.0

    def test_wkt1_without_epsg_code(self):
        # A WKT PROJCS with no AUTHORITY still yields a working CRS
        wkt = ('PROJCS["my grid",GEOGCS["unused",DATUM["unknown",'
               'SPHEROID["GRS 1980",6378137,298.257222101]],PRIMEM["Greenwich",0],'
               'UNIT["degree",0.0174532925199433]],PROJECTION["Transverse_Mercator"],'
               'PARAMETER["latitude_of_origin",0],PARAMETER["central_meridian",27],'
               'PARAMETER["scale_factor",0.9996],PARAMETER["false_easting",500000],'
               'PARAMETER["false_northing",0],UNIT["metre",1]]')
        crs = CRS(wkt)
        assert crs.epsg is None
        assert crs == CRS(3067)  # numerically the same definition
        x, y = transform_points(4326, crs, np.array([27.0]), np.array([60.0]))
        assert x[0] == pytest.approx(500000.0, abs=1e-6)

    def test_wkt2_parsing(self):
        wkt2 = ('PROJCRS["WGS 84 / UTM zone 33N",BASEGEOGCRS["WGS 84",'
                'DATUM["World Geodetic System 1984",ELLIPSOID["WGS 84",6378137,'
                '298.257223563,LENGTHUNIT["metre",1]]],PRIMEM["Greenwich",0]],'
                'CONVERSION["UTM zone 33N",METHOD["Transverse Mercator",ID["EPSG",9807]],'
                'PARAMETER["Latitude of natural origin",0,ANGLEUNIT["degree",'
                '0.0174532925199433],ID["EPSG",8801]],'
                'PARAMETER["Longitude of natural origin",15,ANGLEUNIT["degree",'
                '0.0174532925199433],ID["EPSG",8802]],'
                'PARAMETER["Scale factor at natural origin",0.9996,SCALEUNIT["unity",1],'
                'ID["EPSG",8805]],PARAMETER["False easting",500000,LENGTHUNIT["metre",1],'
                'ID["EPSG",8806]],PARAMETER["False northing",0,LENGTHUNIT["metre",1],'
                'ID["EPSG",8807]]],CS[Cartesian,2],AXIS["(E)",east],AXIS["(N)",north],'
                'LENGTHUNIT["metre",1],ID["EPSG",32633]]')
        crs = CRS(wkt2)
        assert crs.epsg == 32633
        assert crs == CRS(32633)

    def test_projstring_with_explicit_ellipsoid_and_towgs84(self):
        crs = CRS("+proj=tmerc +lat_0=0 +lon_0=9 +k=1 +x_0=3500000 +y_0=0 "
                  "+a=6377397.155 +rf=299.1528128 "
                  "+towgs84=598.1,73.7,418.2,0.202,0.045,-2.455,6.7 +units=m +no_defs")
        assert crs == CRS(31467)

    def test_projstring_paris_meridian(self):
        crs = CRS("+proj=lcc +lat_1=46.8 +lat_0=46.8 +lon_0=0 +k_0=0.99987742 "
                  "+x_0=600000 +y_0=2200000 +a=6378249.2 +b=6356515 "
                  "+towgs84=-168,-60,320,0,0,0,0 +pm=paris +units=m +no_defs")
        # Same grid as EPSG:27572 (proj expresses it as lcc with lat_1==lat_0 + Paris pm)
        x1, y1 = transform_points(crs, 4326, np.array([600000.0]), np.array([2200000.0]))
        x2, y2 = transform_points(27572, 4326, np.array([600000.0]), np.array([2200000.0]))
        assert x1[0] == pytest.approx(x2[0], abs=1e-7)
        assert y1[0] == pytest.approx(y2[0], abs=1e-7)

    def test_us_survey_feet_units(self):
        ft = 1200.0 / 3937.0
        crs = CRS(f"+proj=lcc +lat_1=28.383333333 +lat_2=30.283333333 +lat_0=27.833333333 "
                  f"+lon_0=-99 +x_0={2000000 * ft} +y_0=0 +ellps=clrk66 +units=us-ft +no_defs")
        x, y = transform_points(4326, crs, np.array([-96.0]), np.array([28.5]))
        # Projected coords come out in feet
        assert x[0] == pytest.approx(2963503.91, abs=0.1)

    def test_carried_only_epsg_raises_with_guidance(self):
        crs = CRS(29194)  # not in the table: representable, not transformable
        assert crs.epsg == 29194 and not crs.is_transformable
        with pytest.raises(NotImplementedError, match="WKT|proj"):
            transform_points(crs, 4326, np.array([0.0]), np.array([0.0]))

    def test_crs_hash_consistency(self):
        a = CRS(32633)
        b = CRS("+proj=utm +zone=33 +datum=WGS84")
        assert a == b and hash(a) == hash(b)
        assert len({a, b}) == 1

    def test_geographic_legacy_datum(self):
        # NAD27 geographic -> WGS84 shifts by tens of meters in Conus
        lon, lat = transform_points(4267, 4326, np.array([-100.0]), np.array([40.0]))
        d_m = np.hypot((lon[0] + 100.0) * 85000.0, (lat[0] - 40.0) * 111000.0)
        assert 10 < d_m < 300


class TestRasterPathConstructor:
    def test_dem_from_path(self, tmp_path):
        # Reference pattern: xdem.DEM(path) (reference dem.py:92)
        from xdem_tpu.dem import DEM

        d = DEM(np.full((5, 6), 42.0, np.float32), Affine.from_origin(0, 50, 10, 10), 32633)
        p = str(tmp_path / "d.tif")
        d.save(p)
        back = DEM(p)
        assert back.crs == CRS(32633)
        np.testing.assert_allclose(np.asarray(back.data), 42.0)
        with pytest.raises(TypeError, match="transform/crs"):
            DEM(p, Affine.identity(), 32633)
        with pytest.raises(TypeError, match="missing 2 required"):
            Raster(np.ones((2, 2), np.float32))


class TestKrovakAndOmerc:
    """Krovak (EPSG 9819, S-JTSK) and Hotine oblique Mercator variant B (EPSG 9815)."""

    def test_omerc_epsg_worked_example(self):
        # EPSG GN7-2 method 9815 example: Timbalai 1948 / RSO Borneo (m), 5d23'14.1129"N
        # 115d48'19.8196"E -> E 679245.73, N 596562.78 (Everest Sabah/Sarawak ellipsoid)
        from xdem_tpu import projections as P

        def dms(d, m, s):
            return d + m / 60 + s / 3600

        p = P.normalize_def(P.epsg_def(29873))
        x, y = P.projdef_forward_raw(p, np.array([dms(115, 48, 19.8196)]),
                                     np.array([dms(5, 23, 14.1129)]))
        assert float(x[0]) == pytest.approx(679245.73, abs=0.02)
        assert float(y[0]) == pytest.approx(596562.78, abs=0.02)

    def test_krovak_prague_and_roundtrip(self):
        # S-JTSK / Krovak East North: negative axes; central Prague ~ (-743e3, -1043e3)
        x, y = transform_points(4326, 5514, np.array([14.42]), np.array([50.087]))
        assert -744500 < x[0] < -741500
        assert -1044500 < y[0] < -1041500
        lon = np.linspace(12.2, 22.4, 15)
        lat = np.linspace(47.8, 51.0, 15)
        xs, ys = transform_points(4326, 5514, lon, lat)
        lon2, lat2 = transform_points(5514, 4326, xs, ys)
        np.testing.assert_allclose(lon2, lon, atol=1e-8)
        np.testing.assert_allclose(lat2, lat, atol=1e-8)

    def test_krovak_conformality(self):
        # Conformal: equal scales both directions, ~0.9999 near the pseudo-SP region
        from xdem_tpu import projections as P

        d = P.normalize_def(P.epsg_def(5514))
        ell = P._ell_consts(d)
        eps, lo, la = 1e-6, 16.0, 49.5
        phi = np.deg2rad(la)
        nn = ell["a"] / np.sqrt(1 - ell["e2"] * np.sin(phi) ** 2)
        mm = ell["a"] * (1 - ell["e2"]) / (1 - ell["e2"] * np.sin(phi) ** 2) ** 1.5
        x0, y0 = P.projdef_forward_raw(d, np.array([lo]), np.array([la]))
        x1, y1 = P.projdef_forward_raw(d, np.array([lo + eps]), np.array([la]))
        x2, y2 = P.projdef_forward_raw(d, np.array([lo]), np.array([la + eps]))
        ke = np.hypot(x1[0] - x0[0], y1[0] - y0[0]) / (np.deg2rad(eps) * nn * np.cos(phi))
        kn = np.hypot(x2[0] - x0[0], y2[0] - y0[0]) / (np.deg2rad(eps) * mm)
        assert ke == pytest.approx(kn, abs=1e-6)
        assert ke == pytest.approx(0.9999, abs=2e-4)

    @pytest.mark.parametrize("code", [5514, 29873, 3376])
    def test_wkt_roundtrip_and_io(self, code, tmp_path):
        from xdem_tpu.io import read_raster, write_raster
        from xdem_tpu.raster import Raster

        crs = CRS(code)
        assert CRS(crs.to_wkt()) == crs
        p = str(tmp_path / f"k{code}.tif")
        write_raster(p, Raster(np.ones((4, 5), np.float32), Affine.from_origin(0, 50, 10, 10), crs))
        assert read_raster(p).crs == crs

    def test_projstring_krovak(self):
        c = CRS("+proj=krovak +lat_0=49.5 +lon_0=24.833333333333332 "
                "+alpha=30.28813972222222 +k=0.9999 +x_0=0 +y_0=0 +ellps=bessel "
                "+towgs84=589,76,480")
        assert c == CRS(5514)


class TestReviewRegressions:
    """Regressions from the round-3 code review of the CRS/geoid/volume work."""

    def test_wkt2_primem_with_own_angleunit(self):
        # A PRIMEM stated in grads must use ITS unit, not the CRS-level degree unit
        from xdem_tpu import projections as P

        wkt = ('PROJCS["NTF Paris Lambert II",GEOGCS["NTF (Paris)",DATUM["NTF",'
               'SPHEROID["Clarke 1880 (IGN)",6378249.2,293.4660212936269],'
               'TOWGS84[-168,-60,320,0,0,0,0]],'
               'PRIMEM["Paris",2.5969213,ANGLEUNIT["grad",0.0157079632679489]],'
               'UNIT["degree",0.0174532925199433]],'
               'PROJECTION["Lambert_Conformal_Conic_1SP"],'
               'PARAMETER["latitude_of_origin",46.8],PARAMETER["central_meridian",0],'
               'PARAMETER["scale_factor",0.99987742],PARAMETER["false_easting",600000],'
               'PARAMETER["false_northing",2200000],UNIT["metre",1]]')
        crs = CRS(wkt)
        # Same grid as EPSG:27572: origin point must agree to mm
        x1, y1 = transform_points(crs, 4326, np.array([600000.0]), np.array([2200000.0]))
        x2, y2 = transform_points(27572, 4326, np.array([600000.0]), np.array([2200000.0]))
        assert x1[0] == pytest.approx(x2[0], abs=1e-7)
        assert y1[0] == pytest.approx(y2[0], abs=1e-7)

    def test_oblique_stere_raises(self):
        with pytest.raises(NotImplementedError, match="sterea"):
            CRS("+proj=stere +lat_0=52.156 +lon_0=5.388 +k=0.9999079 +x_0=155000 "
                "+y_0=463000 +ellps=bessel")

    def test_identification_only_wkt_roundtrip(self):
        # Carried-only EPSG: to_wkt -> CRS must round-trip, not raise
        crs = CRS(9999)
        assert not crs.is_transformable
        back = CRS(crs.to_wkt())
        assert back.epsg == 9999 and back == crs

    def test_large_epsg_code_io_roundtrip(self, tmp_path):
        # EPSG codes beyond the SHORT geokey range persist via citation WKT, and a
        # carried-only one must come back as itself, not EPSG:4326
        from xdem_tpu.io import read_raster
        from xdem_tpu.raster import Raster

        crs = CRS(900913)
        p = str(tmp_path / "big.tif")
        Raster(np.ones((3, 3), np.float32), Affine.from_origin(0, 30, 10, 10), crs).save(p)
        assert read_raster(p).crs.epsg == 900913

    def test_dict_utm_shorthand(self):
        crs = CRS({"proj": "utm", "zone": 33, "ellps": "WGS84"})
        assert crs == CRS(32633)
        crs_s = CRS({"proj": "utm", "zone": 33, "south": True, "ellps": "WGS84"})
        assert crs_s == CRS(32733)

    def test_nzmg_is_carried_only(self):
        # EPSG:27200 (NZMG, a complex-polynomial projection) must raise, not approximate
        crs = CRS(27200)
        assert not crs.is_transformable
        with pytest.raises(NotImplementedError):
            transform_points(crs, 4326, np.array([2.5e6]), np.array([6.0e6]))

    def test_geokeys_ascending_order(self, tmp_path):
        # GeoTIFF requires ascending GeoKey IDs, incl. when the citation key is present
        import struct

        from xdem_tpu.raster import Raster

        crs = CRS("+proj=tmerc +lat_0=0 +lon_0=27 +k=0.9996 +x_0=500000 +y_0=0 +ellps=GRS80")
        for name, make in (
            ("codec", lambda q: Raster(np.ones((3, 4), np.float32),
                                       Affine.from_origin(0, 30, 10, 10), crs).save(q)),
        ):
            q = str(tmp_path / f"{name}.tif")
            make(q)
            data = open(q, "rb").read()
            # Locate the GeoKeyDirectory payload: header (1, 1, 0, N) then 4-SHORT entries.
            # N grew past the citation-only 4 when user-defined projections started
            # emitting parameter GeoKeys (3075 + ProjNatOrigin*/ProjFalse*), so find the
            # 3-SHORT header prefix and read N from the directory itself.
            idx = data.find(struct.pack("<3H", 1, 1, 0))
            assert idx > 0
            n = struct.unpack_from("<H", data, idx + 6)[0]
            assert n >= 4
            keys = [struct.unpack_from("<H", data, idx + 8 * (1 + k))[0] for k in range(n)]
            assert keys == sorted(keys), keys
            # A parameter-GeoKey CRS must carry ProjCoordTransGeoKey (3075)
            assert 3075 in keys, keys

    def test_regional_signal_negative_ids_densified(self):
        import jax.numpy as jnp

        from xdem_tpu import volume

        rng = np.random.default_rng(3)
        shape = (120, 140)
        ref = rng.uniform(100, 900, shape)
        dh = rng.normal(-1, 0.5, shape)
        gid = np.zeros(shape, int)
        gid[10:60, 10:60] = -1     # negative id: a real glacier for the host path
        gid[70:110, 70:130] = 2
        host = volume.get_regional_hypsometric_signal(dh, ref, gid)
        dev = volume.get_regional_hypsometric_signal(
            jnp.asarray(dh, jnp.float32), jnp.asarray(ref, jnp.float32), gid)
        np.testing.assert_array_equal(host["count"].values, dev["count"].values)
        np.testing.assert_allclose(dev["median"].values, host["median"].values,
                                   atol=1e-5, equal_nan=True)

    def test_hetero_mesh_never_silently_ignored(self):
        import jax
        from jax.sharding import Mesh

        from xdem_tpu import examples
        from xdem_tpu.spatialstats import infer_heteroscedasticity_from_stable

        ref = examples.get_ref_dem_test()
        mesh = Mesh(np.array(jax.devices()[:2]), ("runs",))
        with pytest.raises(ValueError, match="device path"):
            infer_heteroscedasticity_from_stable(
                dvalues=ref, list_var=[np.ones(ref.shape)],  # numpy var -> host path
                subsample=100, mesh=mesh,
            )

    def test_reproject_to_geographic_default_resolution(self):
        # Cross-CRS reproject without res= preserves the pixel count (rasterio
        # calculate_default_transform semantics); carrying 20 m into degrees used to
        # collapse the output to a 1x1 NaN grid
        from xdem_tpu.raster import Raster

        r = Raster(np.full((30, 30), 7.0, np.float32),
                   Affine.from_origin(500000, 8.8e6, 20, 20), 32633)
        out = r.reproject(crs=4326)
        a = np.asarray(out.data)
        assert out.shape == (30, 30)
        assert np.isfinite(a).mean() > 0.8
        assert np.nanmean(a) == pytest.approx(7.0)


class TestEpsgTableSweep:
    """Every explicit EPSG table entry: projection roundtrip near its origin + WKT
    writer/parser identity. Catches transcription errors in any entry wholesale."""

    @staticmethod
    def _codes():
        from xdem_tpu import projections as P

        return sorted(P._EPSG_DEFS)

    def test_roundtrip_near_origin_all_codes(self):
        from xdem_tpu import projections as P

        bad = []
        for code in self._codes():
            p = P.normalize_def(P.epsg_def(code))
            if p["proj"] == "longlat":
                continue
            lat0 = p.get("lat_0", 0.0)
            if abs(lat0) >= 89.0:  # polar: probe at the lat_ts ring (or 80 deg)
                lat0 = p.get("lat_ts", math_copysign_80(lat0))
            lat = np.clip(np.array([lat0 - 1.5, lat0, lat0 + 1.5]), -85.0, 85.0)
            lon0 = p.get("lon_0", 0.0)
            lon = np.array([lon0 - 2.0, lon0 + 0.3, lon0 + 2.0])
            x, y = P.projdef_forward_raw(p, lon, lat)
            if not (np.isfinite(x).all() and np.isfinite(y).all()):
                bad.append((code, "nonfinite forward"))
                continue
            lon2, lat2 = P.projdef_inverse_raw(p, x, y)
            err = max(np.abs(np.mod(lon2 - lon + 180, 360) - 180).max(), np.abs(lat2 - lat).max())
            if err > 1e-7:
                bad.append((code, f"roundtrip err {err:.2e}"))
        assert not bad, bad

    def test_wkt_identity_all_codes(self):
        from xdem_tpu import projections as P

        bad = []
        for code in self._codes():
            d = P.normalize_def(P.epsg_def(code))
            w = P.def_to_wkt1(d, name=f"c{code}", epsg=code)
            p2, epsg2, _ = P.parse_wkt(w)
            if epsg2 != code or p2 is None:
                bad.append((code, "identification lost"))
                continue
            if P.canonical_key(P.normalize_def(p2)) != P.canonical_key(d):
                bad.append((code, "definition changed through WKT"))
        assert not bad, bad

    def test_range_families_spot(self):
        # One representative per generated range family
        for code in (32601, 32760, 26905, 26710, 25830, 28355, 23035, 32212, 32330):
            from xdem_tpu import projections as P

            p = P.normalize_def(P.epsg_def(code))
            lon0 = p["lon_0"]
            lat = np.array([-40.0 if p["y_0"] else 40.0])
            x, y = P.projdef_forward_raw(p, np.array([lon0]), lat)
            assert x[0] == pytest.approx(500000.0, abs=1e-6)


def math_copysign_80(v):
    return 80.0 if v >= 0 else -80.0


class TestStatePlaneAndGaussKruger:
    """Round-4 EPSG breadth (VERDICT item 8): US State Plane zones + Pulkovo GK families.

    Control-point discipline: the ftUS LCC-2SP math is pinned by the EPSG GN7-2 worked
    example evaluated THROUGH the table code (EPSG:32040), the TM math by the GN7-2 OSGB
    example (test_tmerc_osgb_worked_example); each zone's transcription is additionally
    pinned by its EPSG-defined false-origin invariant forward(lat_0, lon_0) == (x_0, y_0).
    """

    NEW_ZONES = (26929, 26930, 26941, 26942, 26943, 26944, 26945, 26946, 26948, 26949,
                 26950, 26953, 26954, 26955, 26958, 26959, 26960, 26971, 26972, 32100,
                 32104, 32115, 32116, 32117, 32118, 32128, 32129, 32137, 32138, 32139,
                 32140, 32141, 32146, 32147, 32148, 32149, 2229, 2263, 2276, 32040)

    def test_gn72_texas_worked_example_through_the_code(self):
        # EPSG GN7-2 LCC (2SP) example via the table entry: NAD27 / Texas South Central,
        # 28d30'N 96dW -> E 2,963,503.91 / N 254,759.80 US survey feet
        from xdem_tpu import projections as P

        p = P.normalize_def(P.epsg_def(32040))
        x, y = P.projdef_forward_raw(p, np.array([-96.0]), np.array([28.5]))
        ft = p["to_meter"]
        assert float(x[0]) / ft == pytest.approx(2963503.91, abs=0.05)
        assert float(y[0]) / ft == pytest.approx(254759.80, abs=0.05)

    @pytest.mark.parametrize("code", NEW_ZONES)
    def test_false_origin_invariant(self, code):
        # The EPSG definition fixes forward(lat_0, lon_0) == (FE, FN) exactly — catches any
        # transcribed origin/false-offset error in the zone constants
        from xdem_tpu import projections as P

        p = P.normalize_def(P.epsg_def(code))
        x, y = P.projdef_forward_raw(p, np.array([p["lon_0"]]), np.array([p["lat_0"]]))
        assert float(x[0]) == pytest.approx(p["x_0"], abs=1e-5)
        assert float(y[0]) == pytest.approx(p["y_0"], abs=1e-5)

    def test_ftus_twin_scales_exactly(self):
        # NAD83 CA zone 5 ftUS (2229) == meter zone (26945) with axes in US survey feet
        from xdem_tpu.georef import transform_points

        lon, lat = -117.5, 34.2
        xm, ym = transform_points(4326, 26945, np.array([lon]), np.array([lat]))
        xf, yf = transform_points(4326, 2229, np.array([lon]), np.array([lat]))
        assert float(xf[0]) * (1200.0 / 3937.0) == pytest.approx(float(xm[0]), abs=1e-6)
        assert float(yf[0]) * (1200.0 / 3937.0) == pytest.approx(float(ym[0]), abs=1e-6)

    def test_gauss_kruger_zone_families(self):
        from xdem_tpu import projections as P
        from xdem_tpu.georef import CRS

        # Zone-numbered and CM variants are the same projection, offset by the zone prefix
        p7 = P.normalize_def(P.epsg_def(28407))
        c7 = P.normalize_def(P.epsg_def(28467))
        assert p7["lon_0"] == c7["lon_0"] == 39.0
        assert p7["x_0"] == 7_500_000.0 and c7["x_0"] == 500_000.0
        x, y = P.projdef_forward_raw(p7, np.array([39.0]), np.array([55.0]))
        assert float(x[0]) == pytest.approx(7_500_000.0, abs=1e-6)
        # Equals its proj-string twin (definition-based CRS equality), Krassowsky + datum
        assert CRS(28407) == CRS(
            "+proj=tmerc +lat_0=0 +lon_0=39 +k=1 +x_0=7500000 +y_0=0 +ellps=krass "
            "+towgs84=28,-130,-95"
        )
        # Central-meridian formula across the range
        for z in (4, 13, 32):
            assert P.normalize_def(P.epsg_def(28400 + z))["lon_0"] == 6.0 * z - 3.0

    def test_state_plane_dem_reprojects(self):
        # A DEM on a state-plane CRS reprojects to geographic and lands in the right state
        from xdem_tpu.georef import Affine
        from xdem_tpu.raster import Raster

        r = Raster(np.ones((8, 8), np.float32),
                   Affine.from_origin(1_968_500.0, 600_000.0, 100.0, 100.0), 26945)
        out = r.reproject(crs=4326, res=0.01)
        # CA zone 5 false origin region maps near (-118, 33.5)
        assert -121.0 < out.transform.c < -115.0
        assert 32.0 < out.transform.f < 36.5


class TestExamplesOutputDir:
    def test_get_path_output_dir_and_overwrite(self, tmp_path):
        p = examples.get_path_test("longyearbyen_ref_dem", output_dir=str(tmp_path))
        assert p.startswith(str(tmp_path))
        import os
        mtime = os.path.getmtime(p)
        p2 = examples.get_path("longyearbyen_ref_dem", output_dir=str(tmp_path))
        assert p2 != p and p2.startswith(str(tmp_path))
        p3 = examples.get_path_test("longyearbyen_ref_dem", output_dir=str(tmp_path))
        assert os.path.getmtime(p3) == mtime  # cached, not regenerated
