"""Workflow + CLI tests: schema validation, topo and accuracy runs, template emission."""

import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest
import yaml

from xdem_tpu import examples
from xdem_tpu.workflows.schemas import (
    ACCURACY_SCHEMA,
    TOPO_SCHEMA,
    validate_configuration,
)


@pytest.fixture(scope="module")
def dem_files(tmp_path_factory):
    d = tmp_path_factory.mktemp("data")
    ref = examples.get_ref_dem().icrop((100, 400), (200, 500))
    tba = examples.get_tba_dem().icrop((100, 400), (200, 500))
    # path_to_mask marks UNSTABLE terrain (glacier outlines), reference convention
    mask = examples.get_glacier_mask()[100:400, 200:500]
    ref_path = str(d / "ref.tif")
    tba_path = str(d / "tba.tif")
    mask_path = str(d / "glaciers.tif")
    ref.save(ref_path)
    tba.save(tba_path)
    from xdem_tpu.raster import Raster

    Raster(mask.astype(np.float32), ref.transform, ref.crs).save(mask_path)
    return ref_path, tba_path, mask_path


class TestSchemas:
    def test_topo_defaults(self, dem_files):
        ref_path, _, _ = dem_files
        cfg = validate_configuration({"inputs": {"path_to_elev": ref_path}}, TOPO_SCHEMA)
        assert cfg["terrain_attributes"] == ["slope", "aspect", "max_curvature"]
        assert cfg["outputs"]["path"] == "outputs"
        assert "nmad" in cfg["statistics"]

    def test_missing_path_raises(self):
        with pytest.raises(ValueError, match="path does not exist"):
            validate_configuration({"inputs": {"path_to_elev": "/nonexistent/file.tif"}}, TOPO_SCHEMA)

    def test_custom_validator_facade(self, dem_files):
        """Cerberus-style class surface (reference schemas.py:52): validate/errors/document."""
        from xdem_tpu.workflows.schemas import CustomValidator

        ref_path, _, _ = dem_files
        v = CustomValidator(TOPO_SCHEMA)
        assert v.validate({"inputs": {"path_to_elev": ref_path}})
        assert v.errors == {}
        assert v.document["outputs"]["path"] == "outputs"
        assert not v.validate({"inputs": {"path_to_elev": "/nonexistent/file.tif"}})
        assert "path does not exist" in v.errors["config"][0]
        assert v.document is None

    def test_unknown_field_raises(self, dem_files):
        ref_path, _, _ = dem_files
        with pytest.raises(ValueError, match="Unknown configuration"):
            validate_configuration({"inputs": {"path_to_elev": ref_path}, "bogus": 1}, TOPO_SCHEMA)

    def test_bad_attribute_raises(self, dem_files):
        ref_path, _, _ = dem_files
        with pytest.raises(ValueError, match="unallowed|anyof"):
            validate_configuration(
                {"inputs": {"path_to_elev": ref_path}, "terrain_attributes": ["slop"]}, TOPO_SCHEMA
            )

    def test_accuracy_default_coreg(self, dem_files):
        ref_path, tba_path, mask_path = dem_files
        cfg = validate_configuration(
            {"inputs": {"reference_elev": {"path_to_elev": ref_path},
                        "to_be_aligned_elev": {"path_to_elev": tba_path}}},
            ACCURACY_SCHEMA,
        )
        assert cfg["coregistration"]["step_one"]["method"] == "NuthKaab"


class TestTopoWorkflow:
    def test_run(self, dem_files, tmp_path):
        from xdem_tpu.workflows import Topo

        ref_path, _, _ = dem_files
        cfg = {
            "inputs": {"path_to_elev": ref_path},
            "terrain_attributes": ["slope", "hillshade"],
            "outputs": {"path": str(tmp_path / "out"), "level": 2},
        }
        Topo(cfg).run()
        out = tmp_path / "out"
        assert (out / "report.html").exists()
        assert (out / "plots" / "slope.png").exists()
        assert (out / "tables" / "slope_stats.csv").exists()
        assert (out / "rasters" / "slope.tif").exists()
        # Written attribute raster round-trips
        from xdem_tpu.raster import Raster

        slope = Raster.open(str(out / "rasters" / "slope.tif"))
        assert np.nanmax(np.asarray(slope.data)) < 90

    def test_run_generate_pdf(self, dem_files, tmp_path):
        """generate_pdf: true writes a real multi-page PDF (matplotlib-rendered — the
        reference needs the optional plutoprint HTML renderer for this)."""
        from xdem_tpu.workflows import Topo

        ref_path, _, _ = dem_files
        cfg = {
            "inputs": {"path_to_elev": ref_path},
            "terrain_attributes": ["slope"],
            "outputs": {"path": str(tmp_path / "outp"), "level": 2, "generate_pdf": True},
        }
        Topo(cfg).run()
        pdf = tmp_path / "outp" / "report.pdf"
        assert pdf.exists()
        data = pdf.read_bytes()
        assert data[:5] == b"%PDF-" and len(data) > 10_000
        # Multi-page: one text page + at least one figure page
        assert data.count(b"/Type /Page") >= 2 or data.count(b"/Type/Page") >= 2


class TestAccuracyWorkflow:
    def test_run_recovers_shift(self, dem_files, tmp_path):
        from xdem_tpu.workflows import Accuracy

        ref_path, tba_path, mask_path = dem_files
        cfg = {
            "inputs": {
                "reference_elev": {"path_to_elev": ref_path},
                "to_be_aligned_elev": {"path_to_elev": tba_path, "path_to_mask": mask_path},
            },
            "coregistration": {"step_one": {"method": "NuthKaab", "extra_information": {"subsample": 100000}}},
            "outputs": {"path": str(tmp_path / "acc")},
        }
        wf = Accuracy(cfg)
        wf.run()
        out = tmp_path / "acc"
        assert (out / "report.html").exists()
        assert (out / "tables" / "dh_before_stats.csv").exists()
        assert (out / "tables" / "dh_after_stats.csv").exists()
        import pandas as pd

        before = pd.read_csv(out / "tables" / "dh_before_stats.csv")["nmad"][0]
        after = pd.read_csv(out / "tables" / "dh_after_stats.csv")["nmad"][0]
        assert after < before
        # NuthKaab should recover the synthetic inter-DEM shift
        tx, ty, tz = wf.coreg.to_translations()
        assert tx == pytest.approx(-examples.TBA_SHIFT[0], abs=1.5)
        assert ty == pytest.approx(-examples.TBA_SHIFT[1], abs=1.5)


class TestCLI:
    def _run(self, *args):
        import os

        env = dict(os.environ, JAX_PLATFORMS="cpu")
        return subprocess.run([sys.executable, "-m", "xdem_tpu.cli", *args],
                              capture_output=True, text=True, env=env,
                              cwd=str(Path(__file__).parent.parent))

    def test_template_topo(self):
        res = self._run("topo", "--template-config")
        assert res.returncode == 0
        tpl = yaml.safe_load(res.stdout)
        assert "inputs" in tpl and "terrain_attributes" in tpl

    def test_template_accuracy_to_file(self, tmp_path):
        dest = str(tmp_path / "tpl.yaml")
        res = self._run("accuracy", "--template-config", dest)
        assert res.returncode == 0
        tpl = yaml.safe_load(open(dest))
        assert tpl["coregistration"]["step_one"]["method"] == "NuthKaab"

    def test_cli_topo_run(self, dem_files, tmp_path):
        ref_path, _, _ = dem_files
        cfg_path = tmp_path / "cfg.yaml"
        yaml.safe_dump({
            "inputs": {"path_to_elev": ref_path},
            "terrain_attributes": ["slope"],
            "outputs": {"path": str(tmp_path / "cli_out")},
        }, open(cfg_path, "w"))
        res = self._run("topo", "--config", str(cfg_path))
        assert res.returncode == 0, res.stderr[-2000:]
        assert (tmp_path / "cli_out" / "report.html").exists()

    def test_cli_requires_config(self):
        res = self._run("topo")
        assert res.returncode != 0


class TestTopoMultiDEM:
    def test_list_inputs(self, dem_files, tmp_path):
        from xdem_tpu.workflows import Topo

        ref_path, tba_path, _ = dem_files
        cfg = {
            "inputs": [{"path_to_elev": ref_path}, {"path_to_elev": tba_path}],
            "terrain_attributes": ["slope"],
            "outputs": {"path": str(tmp_path / "multi")},
        }
        Topo(cfg).run()
        out = tmp_path / "multi"
        assert (out / "plots" / "slope_dem1.png").exists()
        assert (out / "plots" / "slope_dem2.png").exists()


class TestDownsample:
    def test_topo_downsample(self, dem_files, tmp_path):
        from xdem_tpu.workflows import Topo

        ref_path, _, _ = dem_files
        cfg = {
            "inputs": {"path_to_elev": ref_path, "downsample": 2},
            "terrain_attributes": ["slope"],
            "outputs": {"path": str(tmp_path / "ds")},
        }
        wf = Topo(cfg)
        dem = wf._load_dem(wf.config["inputs"])
        from xdem_tpu.dem import DEM
        from xdem_tpu.raster import Raster

        orig = Raster.open(ref_path)
        assert dem.res[0] == pytest.approx(orig.res[0] * 2)
        assert abs(dem.width - orig.width // 2) <= 1
        wf.run()
        assert (tmp_path / "ds" / "report.html").exists()


class TestSchemaEdgeCases:
    def test_invalid_coreg_method_raises(self, dem_files):
        ref_path, tba_path, _ = dem_files
        with pytest.raises(ValueError, match="step_one"):
            validate_configuration(
                {"inputs": {"reference_elev": {"path_to_elev": ref_path},
                            "to_be_aligned_elev": {"path_to_elev": tba_path}},
                 "coregistration": {"step_one": {"method": "MagicAlign"}}},
                ACCURACY_SCHEMA,
            )

    def test_invalid_statistic_raises(self, dem_files):
        ref_path, _, _ = dem_files
        with pytest.raises(ValueError, match="statistics"):
            validate_configuration(
                {"inputs": {"path_to_elev": ref_path}, "statistics": ["bogus_stat"]},
                TOPO_SCHEMA,
            )

    def test_outputs_level_allowed(self, dem_files):
        ref_path, _, _ = dem_files
        with pytest.raises(ValueError, match="level"):
            validate_configuration(
                {"inputs": {"path_to_elev": ref_path}, "outputs": {"level": 5}}, TOPO_SCHEMA
            )

    def test_terrain_attributes_as_dict_with_options(self, dem_files):
        ref_path, _, _ = dem_files
        cfg = validate_configuration(
            {"inputs": {"path_to_elev": ref_path},
             "terrain_attributes": {"slope": {"surface_fit": "Horn"}, "hillshade": None}},
            TOPO_SCHEMA,
        )
        assert set(cfg["terrain_attributes"].keys()) == {"slope", "hillshade"}

    def test_three_step_pipeline_validates(self, dem_files):
        ref_path, tba_path, _ = dem_files
        cfg = validate_configuration(
            {"inputs": {"reference_elev": {"path_to_elev": ref_path},
                        "to_be_aligned_elev": {"path_to_elev": tba_path}},
             "coregistration": {
                 "step_one": {"method": "VerticalShift"},
                 "step_two": {"method": "NuthKaab"},
                 "step_three": {"method": "LZD"},
             }},
            ACCURACY_SCHEMA,
        )
        assert cfg["coregistration"]["step_two"]["method"] == "NuthKaab"


class TestAccuracyPipelines:
    def test_two_step_pipeline_runs(self, dem_files, tmp_path):
        from xdem_tpu.workflows import Accuracy

        ref_path, tba_path, mask_path = dem_files
        cfg = {
            "inputs": {
                "reference_elev": {"path_to_elev": ref_path},
                "to_be_aligned_elev": {"path_to_elev": tba_path, "path_to_mask": mask_path},
            },
            "coregistration": {
                "step_one": {"method": "VerticalShift", "extra_information": {"subsample": 20000}},
                "step_two": {"method": "NuthKaab", "extra_information": {"subsample": 50000}},
            },
            "outputs": {"path": str(tmp_path / "acc2")},
        }
        wf = Accuracy(cfg)
        wf.run()
        import pandas as pd

        out = tmp_path / "acc2"
        before = pd.read_csv(out / "tables" / "dh_before_stats.csv")["nmad"][0]
        after = pd.read_csv(out / "tables" / "dh_after_stats.csv")["nmad"][0]
        assert after < before

    def test_lzd_method_runs(self, dem_files, tmp_path):
        from xdem_tpu.workflows import Accuracy

        ref_path, tba_path, mask_path = dem_files
        cfg = {
            "inputs": {
                "reference_elev": {"path_to_elev": ref_path},
                "to_be_aligned_elev": {"path_to_elev": tba_path, "path_to_mask": mask_path},
            },
            "coregistration": {"step_one": {"method": "LZD", "extra_information": {"subsample": 50000}}},
            "outputs": {"path": str(tmp_path / "acclzd")},
        }
        wf = Accuracy(cfg)
        wf.run()
        tx, ty, tz = wf.coreg.to_translations()
        assert tx == pytest.approx(-examples.TBA_SHIFT[0], abs=3.0)

    def test_statistics_selection(self, dem_files, tmp_path):
        from xdem_tpu.workflows import Accuracy

        ref_path, tba_path, _ = dem_files
        cfg = {
            "inputs": {
                "reference_elev": {"path_to_elev": ref_path},
                "to_be_aligned_elev": {"path_to_elev": tba_path},
            },
            "statistics": ["median", "nmad"],
            "outputs": {"path": str(tmp_path / "accsel")},
        }
        wf = Accuracy(cfg)
        wf.run()
        import pandas as pd

        df = pd.read_csv(tmp_path / "accsel" / "tables" / "dh_after_stats.csv")
        assert "median" in df.columns and "nmad" in df.columns


class TestAccuracyReportParity:
    """Report section parity with the reference (accuracy.py:248-450): per-dataset summary
    table, stable-terrain (inlier-only) stats, per-step coreg metadata, applied-correction
    map, annotated histogram."""

    def test_full_section_set_level2(self, dem_files, tmp_path):
        from xdem_tpu.workflows import Accuracy

        ref_path, tba_path, mask_path = dem_files
        cfg = {
            "inputs": {
                "reference_elev": {"path_to_elev": ref_path},
                "to_be_aligned_elev": {"path_to_elev": tba_path, "path_to_mask": mask_path},
            },
            "coregistration": {"step_one": {"method": "VerticalShift", "extra_information": {}},
                               "step_two": {"method": "NuthKaab",
                                            "extra_information": {"subsample": 50000}}},
            "outputs": {"path": str(tmp_path / "acc2"), "level": 2},
        }
        wf = Accuracy(cfg)
        wf.run()
        out = tmp_path / "acc2"
        html = (out / "report.html").read_text()
        # Section set
        assert "Stable-terrain (inlier) statistics" in html
        assert "Statistics summary" in html
        assert "Coregistration step 1: VerticalShift" in html
        assert "Coregistration step 2: NuthKaab" in html
        assert "Estimated transformation" in html
        assert "dh_histogram.png" in html
        assert "dh_aligned_vs_tba.png" in html
        assert "Elapsed:" in html
        # Level-2 artifacts
        for f in ["dh_before.tif", "dh_after.tif", "dh_aligned_vs_tba.tif", "aligned_dem.tif"]:
            assert (out / "rasters" / f).exists(), f
        # Summary table: per-dataset rows incl. the level-2 input elevations
        import pandas as pd

        df = pd.read_csv(out / "tables" / "stats_summary.csv")
        assert set(df["Data"]) >= {"dh before coreg", "dh after coreg", "reference elevation",
                                   "to-be-aligned elevation", "aligned elevation"}
        stable = pd.read_csv(out / "tables" / "dh_stable_stats.csv")
        # Coreg quality on stable terrain: nmad improves
        nmads = dict(zip(stable["Data"], stable["nmad"]))
        assert nmads["dh after (stable terrain)"] < nmads["dh before (stable terrain)"]


class TestCliArgListAlias:
    def test_main_accepts_arg_list(self, capsys):
        """The reference's main(arg_list=...) spelling works (reference cli.py:28)."""
        import pytest as _pytest

        from xdem_tpu import cli

        with _pytest.raises(SystemExit):
            cli.main(arg_list=["--help"])
        assert "topo" in capsys.readouterr().out


class TestWorkflowsReferenceSurface:
    """The reference's public Workflows/Topo helper methods exist with the same contracts
    (reference workflows.py:122-484, topo.py:98-243)."""

    @pytest.fixture()
    def topo(self, dem_files, tmp_path):
        from xdem_tpu.workflows import Topo

        ref_path, _, _ = dem_files
        return Topo({
            "inputs": {"path_to_elev": ref_path},
            "terrain_attributes": ["slope", "hillshade"],
            "outputs": {"path": str(tmp_path / "wout"), "level": 1},
        })

    def test_outputs_folder_alias_and_create_output_dir(self, topo, tmp_path):
        assert topo.outputs_folder == topo.output_dir
        new = tmp_path / "moved"
        topo.create_output_dir(sub_dir=new)
        assert topo.outputs_folder == new
        for sub in ("plots", "rasters", "tables"):
            assert (new / sub).is_dir()

    def test_load_config_revalidates(self, topo):
        cfg = topo.load_config()
        assert cfg["terrain_attributes"] == ["slope", "hillshade"]
        assert cfg["outputs"]["path"] == topo.config["outputs"]["path"]

    def test_floats_process_rounds_nested(self, topo):
        out = topo.floats_process({"a": 1.23456, "b": [2.345, {"c": (3.456, None)}], "d": "x"})
        assert out == {"a": 1.23, "b": [2.35, {"c": (3.46, None)}], "d": "x"}

    def test_remove_none_keeps_statistics(self, topo):
        out = topo.remove_none({"a": None, "b": {"c": None, "d": 1}, "statistics": None,
                                "e": [1, None, 2]})
        assert out == {"b": {"d": 1}, "statistics": None, "e": [1, 2]}

    def test_format_values_stats(self, topo):
        assert topo.format_values_stats("valid_count", 42.7) == "42"
        assert topo.format_values_stats("valid percentage", 93.456) == "93.46%"
        assert topo.format_values_stats("mean", 1.23456) == "1.235"
        assert "e" in topo.format_values_stats("sum", 2.5e6)
        assert "e" in topo.format_values_stats("tiny", 2.5e-6)

    def test_save_stat_as_csv(self, topo):
        import csv

        topo.save_stat_as_csv({"mean": np.float32(1.5), "count": 3}, "unit")
        path = topo.outputs_folder / "tables" / "unit_stats.csv"
        rows = list(csv.DictReader(path.open()))
        assert rows[0]["mean"] == "1.5" and rows[0]["count"] == "3"

    def test_generate_plots(self, topo, dem_files):
        from xdem_tpu.dem import DEM

        dem = DEM(dem_files[0])
        topo.generate_plot(dem, "left", "pair", dem_right=dem, title_dem_right="right")
        assert (topo.outputs_folder / "plots" / "pair.png").stat().st_size > 1000
        topo.generate_plot_with_profiles(dem, "with profiles", "prof")
        assert (topo.outputs_folder / "plots" / "prof.png").stat().st_size > 1000
        # extra kwargs forward to imshow (reference workflows.py:183-241 passes them
        # through to dem.plot) instead of being silently dropped
        topo.generate_plot(dem, "interp", "pair_nearest", interpolation="nearest")
        assert (topo.outputs_folder / "plots" / "pair_nearest.png").stat().st_size > 1000

    def test_static_load_dem(self, dem_files):
        from xdem_tpu.workflows.workflows import Workflows

        ref_path, _, mask_path = dem_files
        dem, inlier, mpath = Workflows.load_dem({"path_to_elev": ref_path,
                                                 "path_to_mask": mask_path})
        assert dem.shape == (300, 300)
        # inlier_mask is True on STABLE terrain: the mask file marks glaciers
        assert inlier.dtype == bool and 0 < inlier.sum() < inlier.size
        assert mpath == mask_path
        assert Workflows.load_dem(None) == (None, None, None)

    def test_static_load_dem_resolves_mask_alias(self):
        """Example-data aliases resolve for BOTH path_to_elev and path_to_mask, like the
        reference (workflows.py:357-399)."""
        from xdem_tpu.workflows.workflows import Workflows

        dem, inlier, mpath = Workflows.load_dem(
            {"path_to_elev": "longyearbyen_tba_dem",
             "path_to_mask": "longyearbyen_glacier_outlines"})
        assert dem is not None and inlier is not None
        assert inlier.dtype == bool and 0 < inlier.sum() < inlier.size
        assert str(mpath).endswith(".geojson")

    def test_generate_terrain_attributes(self, topo):
        rasters = topo.generate_terrain_attributes(export_tif=True)
        assert len(rasters) == 2
        assert (topo.outputs_folder / "plots" / "terrain_attributes_map.png").exists()
        assert (topo.outputs_folder / "rasters" / "slope.tif").exists()
        assert (topo.outputs_folder / "rasters" / "hillshade.tif").exists()

    def test_generate_pdf_gated_on_config(self, topo):
        # generate_pdf() is a no-op when outputs.generate_pdf is false
        topo.generate_pdf()
        assert not (topo.outputs_folder / "report.pdf").exists()
        topo.config["outputs"]["generate_pdf"] = True
        topo.add_report_section(topo.stats_to_html({"a": 1.0}, "t"))
        topo.generate_pdf()
        assert (topo.outputs_folder / "report.pdf").read_bytes()[:5] == b"%PDF-"
