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
