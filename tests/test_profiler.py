"""Profiler subsystem tests."""

import numpy as np

from xdem_tpu import examples, terrain
from xdem_tpu.profiler import Profiler, profile


class TestProfiler:
    def test_disabled_no_overhead(self):
        calls = []

        @profile("test.fn")
        def fn(x):
            calls.append(x)
            return x * 2

        Profiler.disable()
        assert fn(3) == 6
        assert Profiler.records() == []

    def test_records_and_summary(self, tmp_path, ref_dem_test):
        Profiler.enable(save_graphs=True, save_raw_data=True)
        try:
            terrain.get_terrain_attribute(ref_dem_test, "slope")
            terrain.get_terrain_attribute(ref_dem_test, "hillshade")
            recs = Profiler.records()
            assert len(recs) == 2
            assert all(r["name"] == "xdem_tpu.terrain.get_terrain_attribute" for r in recs)
            assert all(r["wall_s"] > 0 for r in recs)
            assert all(np.isfinite(r["peak_mem_mb"]) for r in recs)
            out = Profiler.generate_summary(tmp_path / "prof")
            assert (out / "profiling_summary.csv").exists()
            assert (out / "profiling_raw.csv").exists()
            assert (out / "profiling_graph.png").exists()
        finally:
            Profiler.disable()

    def test_coreg_entry_points_profiled(self, ref_dem_test):
        from xdem_tpu import coreg

        Profiler.enable()
        try:
            c = coreg.VerticalShift()
            tba = ref_dem_test + 2.0
            c.fit(ref_dem_test, tba, random_state=42)
            c.apply(tba)
            names = {r["name"] for r in Profiler.records()}
            assert "xdem_tpu.coreg.Coreg.fit" in names
            assert "xdem_tpu.coreg.Coreg.apply" in names
        finally:
            Profiler.disable()
