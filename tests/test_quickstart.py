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
