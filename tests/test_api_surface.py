"""Explicit-signature and constructor parity with the reference's user-facing API.

The reference exposes every terrain attribute / elevation-object option as a named
parameter (reference terrain/terrain.py:694-1800, dem.py:429-810, epc/epc.py:48-90,
base.py:2542); these tests pin that our wrappers do too, and that deprecated aliases
route with the reference's semantics.
"""

import inspect
import warnings

import numpy as np
import pandas as pd
import pytest

from xdem_tpu import coreg, examples, terrain
from xdem_tpu.dem import DEM
from xdem_tpu.epc import EPC, write_epc


@pytest.fixture(scope="module")
def dem():
    return examples.get_ref_dem_test()


class TestTerrainSignatures:
    def test_slope_signature(self):
        params = inspect.signature(terrain.slope).parameters
        for p in ("method", "surface_fit", "degrees", "resolution"):
            assert p in params
        assert params["surface_fit"].default == "Florinsky"
        assert params["degrees"].default is True

    def test_hillshade_signature(self):
        params = inspect.signature(terrain.hillshade).parameters
        for p, want in (("azimuth", 315.0), ("altitude", 45.0), ("z_factor", 1.0)):
            assert params[p].default == want

    def test_curvature_signatures(self):
        for fn in (terrain.profile_curvature, terrain.tangential_curvature,
                   terrain.planform_curvature, terrain.flowline_curvature,
                   terrain.max_curvature, terrain.min_curvature):
            params = inspect.signature(fn).parameters
            assert params["surface_fit"].default == "Florinsky"
            assert params["curv_method"].default == "geometric"

    def test_windowed_signatures(self):
        assert inspect.signature(terrain.topographic_position_index).parameters["window_size"].default == 3
        assert inspect.signature(terrain.roughness).parameters["window_size"].default == 3
        assert inspect.signature(terrain.fractal_roughness).parameters["window_size_fractal"].default == 13
        assert inspect.signature(terrain.texture_shading).parameters["alpha"].default == 0.8

    def test_slope_method_deprecation(self, dem):
        """`method=` is the deprecated surface-fit alias for slope/aspect/hillshade
        (reference terrain.py:437-446)."""
        with pytest.warns(DeprecationWarning, match="surface_fit"):
            got = terrain.slope(dem, method="Horn")
        want = terrain.slope(dem, surface_fit="Horn")
        np.testing.assert_array_equal(np.asarray(got.data), np.asarray(want.data))

    def test_tri_method_is_not_the_deprecated_alias(self, dem):
        """For terrain_ruggedness_index the reference's `method=` selects Riley/Wilson
        (terrain.py:1531-1533) — it must NOT be treated as the deprecated surface-fit alias."""
        with warnings.catch_warnings():
            warnings.simplefilter("error", DeprecationWarning)
            wilson = terrain.terrain_ruggedness_index(dem, method="Wilson")
        riley = terrain.terrain_ruggedness_index(dem)
        assert np.nanmax(np.abs(np.asarray(wilson.data) - np.asarray(riley.data))) > 0

    def test_legacy_curvature_defaults_florinsky(self, dem):
        """Legacy curvature warns and defaults to the Florinsky fit like the reference
        (terrain.py:944-990)."""
        with pytest.warns(DeprecationWarning, match="curvature"):
            got = terrain.curvature(dem)
        with pytest.warns(DeprecationWarning):
            want = terrain.curvature(dem, surface_fit="Florinsky")
        np.testing.assert_array_equal(np.asarray(got.data), np.asarray(want.data))


class TestDEMMethodSignatures:
    def test_dem_methods_expose_reference_params(self):
        cases = {
            "slope": ("method", "surface_fit", "degrees"),
            "aspect": ("method", "surface_fit", "degrees"),
            "hillshade": ("method", "surface_fit", "azimuth", "altitude", "z_factor"),
            "profile_curvature": ("surface_fit", "curv_method"),
            "max_curvature": ("surface_fit", "curv_method"),
            "topographic_position_index": ("window_size",),
            "terrain_ruggedness_index": ("method", "window_size"),
            "roughness": ("window_size",),
            "fractal_roughness": ("window_size_fractal",),
            "texture_shading": ("alpha",),
        }
        for meth, wanted in cases.items():
            params = inspect.signature(getattr(DEM, meth)).parameters
            for p in wanted:
                assert p in params, f"DEM.{meth} is missing '{p}'"

    def test_dem_tri_wilson(self, dem):
        with warnings.catch_warnings():
            warnings.simplefilter("error", DeprecationWarning)
            wilson = dem.terrain_ruggedness_index(method="Wilson", window_size=5)
        assert np.isfinite(np.asarray(wilson.data)).any()


class TestEPCConstructor:
    def test_from_file(self, tmp_path):
        e = EPC(x=[1.0, 2.0], y=[3.0, 4.0], z=[5.0, 6.0], crs=32633)
        p = str(tmp_path / "pts.npz")
        write_epc(p, e)
        read_back = EPC(p)
        assert len(read_back) == 2
        assert read_back.crs.epsg == 32633

    def test_from_dataframe(self):
        df = pd.DataFrame({"x": [1.0, 2.0], "y": [3.0, 4.0], "h": [5.0, 6.0]})
        e = EPC(df, data_column="h", crs=32633)
        assert len(e) == 2 and e.data_column == "h"
        with pytest.raises(ValueError, match="columns"):
            EPC(pd.DataFrame({"x": [1.0], "y": [2.0]}), data_column="h", crs=32633)
        with pytest.raises(ValueError, match="CRS"):
            EPC(df, data_column="h")

    def test_wrap_pointcloud_and_vcrs(self):
        base = EPC(x=[0.0], y=[0.0], z=[1.0], crs=32633)
        wrapped = EPC(base, vcrs="EGM96")
        assert wrapped.vcrs_name == "EGM96"
        # Re-wrapping carries the source's vertical CRS; a conflicting crs= raises
        assert EPC(wrapped).vcrs_name == "EGM96"
        with pytest.raises(ValueError, match="reproject"):
            EPC(wrapped, crs=4326)

    def test_missing_file_raises(self):
        with pytest.raises(FileNotFoundError):
            EPC("/nonexistent/points.las")

    def test_bad_type_raises(self):
        with pytest.raises(TypeError, match="file path"):
            EPC(12345)


class TestFitAndApplyKwargs:
    def test_fit_kwargs_apply_kwargs_dicts(self, dem):
        """The reference's fit_and_apply accepts explicit fit_kwargs/apply_kwargs dicts
        (base.py:2542-2560)."""
        tba = examples.get_tba_dem_test()
        vs = coreg.VerticalShift()
        out = vs.fit_and_apply(
            dem, tba,
            fit_kwargs={"subsample": 5000, "random_state": 7},
            apply_kwargs={"resample": True},
        )
        assert out.shape == tba.shape
        assert vs._meta["outputs"]["affine"]["shift_z"] != 0.0

    def test_flat_kwargs_still_route(self, dem):
        tba = examples.get_tba_dem_test()
        vs = coreg.VerticalShift()
        out = vs.fit_and_apply(dem, tba, subsample=5000, random_state=7)
        assert out.shape == tba.shape


class TestBlockwiseApplyName:
    def test_keyword_name_matches_reference(self):
        """Reference blockwise.py:351 names the argument to_be_aligned_elev."""
        params = inspect.signature(coreg.BlockwiseCoreg.apply).parameters
        assert "to_be_aligned_elev" in params
        assert "threshold_ransac" in params and "max_iterations_ransac" in params


class TestWorkflowsInitNames:
    def test_parameter_names(self):
        from xdem_tpu.workflows.workflows import Workflows

        params = inspect.signature(Workflows.__init__).parameters
        assert "user_config" in params and "output" in params


class TestModuleForModuleSurface:
    """Every public symbol the reference defines exists at the same module path here
    (reference xdem/: top-level defs/classes not starting with '_', per module). This is
    the module-level companion of the signature tests above: a symbol moving or vanishing
    breaks migration, so the full map is pinned."""

    REFERENCE_SURFACE = {
        "xdem_tpu._misc": ["copy_doc", "deprecate", "diff_environment_yml", "get_progress",
                           "import_optional"],
        "xdem_tpu.cli": ["main"],
        # reference coreg/affine.py + base.py + biascorr.py + blockwise.py
        "xdem_tpu.coreg.affine": ["AffineCoreg", "CPD", "DhMinimize", "ICP", "LZD", "NuthKaab",
                                  "VerticalShift", "cpd", "dh_minimize", "icp", "lzd",
                                  "nuth_kaab", "vertical_shift"],
        "xdem_tpu.coreg.base": ["Coreg", "CoregDict", "CoregPipeline", "InAffineDict",
                                "InFitOrBinDict", "InIterativeDict", "InRandomDict",
                                "InSpecificDict", "InputCoregDict", "NotImplementedCoregApply",
                                "NotImplementedCoregFit", "OutAffineDict", "OutFitOrBinDict",
                                "OutIterativeDict", "OutRandomDict", "OutSpecificDict",
                                "OutputCoregDict", "apply_matrix", "invert_matrix",
                                "matrix_from_translations_rotations",
                                "translations_rotations_from_matrix"],
        "xdem_tpu.coreg.biascorr": ["BiasCorr", "Deramp", "DirectionalBias", "TerrainBias"],
        "xdem_tpu.coreg.blockwise": ["BlockwiseCoreg"],
        "xdem_tpu.ddem": ["dDEM"],
        "xdem_tpu.dem": ["DEM"],
        "xdem_tpu.demcollection": ["DEMCollection"],
        "xdem_tpu.epc": ["EPC"],
        "xdem_tpu.examples": ["get_all_data", "get_path", "get_path_test"],
        "xdem_tpu.fit": ["huber_loss", "polynomial_1d", "polynomial_2d", "rmse",
                         "robust_nfreq_sumsin_fit", "robust_norder_polynomial_fit",
                         "soft_loss", "sumsin_1d"],
        "xdem_tpu.spatialstats": ["EmpiricalVariogramKArgs", "convolution",
                                  "correlation_from_variogram", "covariance_from_variogram",
                                  "fit_sum_model_variogram", "get_perbin_nd_binning",
                                  "get_variogram_model_func",
                                  "infer_heteroscedasticity_from_stable",
                                  "infer_spatial_correlation_from_stable", "interp_nd_binning",
                                  "mean_filter_nan", "nd_binning",
                                  "neff_circular_approx_numerical",
                                  "neff_circular_approx_theoretical", "neff_exact",
                                  "neff_hugonnet_approx", "nmad", "number_effective_samples",
                                  "patches_method", "plot_1d_binning", "plot_2d_binning",
                                  "plot_variogram", "sample_empirical_variogram",
                                  "spatial_error_propagation", "two_step_standardization"],
        "xdem_tpu.terrain": ["aspect", "curvature", "flowline_curvature", "fractal_roughness",
                             "get_terrain_attribute", "hillshade", "max_curvature",
                             "min_curvature", "planform_curvature", "profile_curvature",
                             "roughness", "rugosity", "slope", "tangential_curvature",
                             "terrain_ruggedness_index", "texture_shading",
                             "topographic_position_index"],
        "xdem_tpu.vcrs": ["VCRSMetaDict"],
        "xdem_tpu.volume": ["calculate_hypsometry_area", "fit_hypsometric_bins_poly",
                            "get_regional_hypsometric_signal", "hypsometric_binning",
                            "hypsometric_interpolation", "idw_interpolation",
                            "interpolate_hypsometric_bins", "local_hypsometric_interpolation",
                            "norm_regional_hypsometric_interpolation"],
        "xdem_tpu.workflows.accuracy": ["Accuracy"],
        "xdem_tpu.workflows.schemas": ["CustomValidator", "make_coreg_step",
                                       "validate_configuration"],
        "xdem_tpu.workflows.topo": ["Topo"],
        "xdem_tpu.workflows.workflows": ["Workflows"],
    }

    def test_every_reference_symbol_importable_at_same_path(self):
        import importlib

        missing = []
        for module, names in self.REFERENCE_SURFACE.items():
            mod = importlib.import_module(module)
            missing += [f"{module}.{n}" for n in names if not hasattr(mod, n)]
        assert not missing, f"reference symbols missing at their module path: {missing}"

    def test_package_exports_match_reference(self):
        """Reference xdem/__init__.py:19-23 exports these submodules and classes."""
        import xdem_tpu

        for name in ["coreg", "dem", "examples", "fit", "spatialstats", "terrain", "volume",
                     "DEM", "dDEM", "DEMCollection", "EPC"]:
            assert hasattr(xdem_tpu, name), name
