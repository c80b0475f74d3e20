"""The README quickstart must keep working verbatim-ish (guards against doc rot)."""

import numpy as np


def test_readme_quickstart(tmp_path, monkeypatch):
    import xdem_tpu
    from xdem_tpu import coreg, examples

    monkeypatch.setattr(examples, "_CACHE_DIR", str(tmp_path))
    ref_path = examples.get_path_test("longyearbyen_ref_dem")
    ref = xdem_tpu.DEM.open(ref_path)
    tba = examples.get_tba_dem_test()

    slope, aspect, hs = ref.get_terrain_attribute(["slope", "aspect", "hillshade"])
    assert np.isfinite(np.asarray(hs.data)).any()

    nk = coreg.NuthKaab()
    aligned = nk.fit_and_apply(ref, tba, random_state=42)
    assert np.nanstd(np.asarray((ref - aligned).data)) < np.nanstd(np.asarray((ref - tba).data))

    sig, rho = ref.estimate_uncertainty(tba, random_state=42, subsample=200)
    assert float(rho(np.array([0.0]))[0]) == 1.0


def test_gallery_scripts_run(tmp_path, monkeypatch):
    """The gallery scripts execute end-to-end (on small crops via monkeypatched examples)."""
    import pathlib
    import runpy

    import xdem_tpu.examples as ex

    monkeypatch.chdir(tmp_path)
    r0, r1, c0, c1 = ex._TEST_ICROP
    orig_ref, orig_tba, orig_mask = ex.get_ref_dem, ex.get_tba_dem, ex.get_glacier_mask
    monkeypatch.setattr(ex, "get_ref_dem", lambda: orig_ref().icrop((r0, r1), (c0, c1)))
    monkeypatch.setattr(ex, "get_tba_dem", lambda: orig_tba().icrop((r0, r1), (c0, c1)))
    monkeypatch.setattr(ex, "get_glacier_mask", lambda: orig_mask()[r0:r1, c0:c1])

    gallery = pathlib.Path(__file__).parent.parent / "examples_gallery"
    for script in ["basic_terrain.py", "basic_coregistration.py", "advanced_out_of_core.py",
                   "basic_files_and_masks.py", "basic_vertical_ref.py",
                   "basic_icp_coregistration.py", "advanced_slope_methods.py",
                   "advanced_regional_hypso.py", "advanced_point_uncertainty.py",
                   "advanced_patches_validation.py", "basic_3d_manipulation.py"]:
        runpy.run_path(str(gallery / script), run_name="__main__")
    assert (tmp_path / "gallery_outputs" / "terrain_attributes.png").exists()
    assert (tmp_path / "gallery_outputs" / "slope_methods.png").exists()


def test_gallery_scripts_run_stats(tmp_path, monkeypatch):
    """The statistics/volume/bias gallery scripts execute end-to-end (cropped examples).

    Split from test_gallery_scripts_run so a failure localizes; advanced_multihost is the
    one script left out (it spawns a 2-process jax.distributed cluster, covered by
    tests/test_graft_entry.py's dryrun instead)."""
    import pathlib
    import runpy

    import xdem_tpu.examples as ex

    monkeypatch.chdir(tmp_path)
    r0, r1, c0, c1 = ex._TEST_ICROP
    orig_ref, orig_tba, orig_mask = ex.get_ref_dem, ex.get_tba_dem, ex.get_glacier_mask
    monkeypatch.setattr(ex, "get_ref_dem", lambda: orig_ref().icrop((r0, r1), (c0, c1)))
    monkeypatch.setattr(ex, "get_tba_dem", lambda: orig_tba().icrop((r0, r1), (c0, c1)))
    monkeypatch.setattr(ex, "get_glacier_mask", lambda: orig_mask()[r0:r1, c0:c1])

    # The infer_* scripts open the processed dDEM by path; serve a cropped raw-difference
    # dDEM instead (vertical truth removed) so everything stays on the small crop.
    import numpy as np

    ref_c = ex.get_ref_dem()
    tba_c = ex.get_tba_dem()
    dh_arr = ref_c.get_nanarray() - tba_c.get_nanarray()
    dh_arr -= np.nanmedian(dh_arr)
    ddem_path = str(tmp_path / "ddem_crop.tif")
    ref_c.copy(new_array=dh_arr).save(ddem_path)
    orig_get_path = ex.get_path
    monkeypatch.setattr(
        ex, "get_path",
        lambda name: ddem_path if name == "longyearbyen_ddem" else orig_get_path(name),
    )

    gallery = pathlib.Path(__file__).parent.parent / "examples_gallery"
    import warnings

    for script in ["basic_dem_subtraction.py", "basic_logging_profiling.py",
                   "basic_infer_heterosc.py", "basic_infer_spatial_correlation.py",
                   "advanced_dem_collection.py", "advanced_error_propagation.py",
                   "advanced_standardization.py", "advanced_variogram_modelling.py",
                   "advanced_deramp_directional.py", "advanced_blockwise.py",
                   "advanced_uncertainty.py"]:
        with warnings.catch_warnings():
            # The test crop shrinks the glacier to a handful of hypsometric bins; the
            # scripts' full-size parameters then legitimately warn (not-enough-bins,
            # sparse-variogram fits). Those specific messages are fine here.
            warnings.filterwarnings("default", message="Not enough valid bins.*")
            warnings.filterwarnings("default", message=".*bins have a count.*")
            runpy.run_path(str(gallery / script), run_name="__main__")
