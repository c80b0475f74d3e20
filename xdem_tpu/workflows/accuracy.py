"""Accuracy workflow: coregister a DEM pair, report before/after dh statistics.

Reference parity: /root/reference/xdem/workflows/accuracy.py — load (:78), prepare/reproject
(:177-228), 1-3-step coreg pipeline from config (:132-175), before/after stats + histogram
(:248-298), report (:300, :477).
"""

from __future__ import annotations

import logging
from typing import Any

import numpy as np

from xdem_tpu.raster import Raster
from xdem_tpu.workflows.schemas import ACCURACY_SCHEMA
from xdem_tpu.workflows.workflows import Workflows


class Accuracy(Workflows):
    """Coregistration accuracy workflow for a reference/to-be-aligned DEM pair."""

    schema = ACCURACY_SCHEMA

    def _build_pipeline(self):
        """Build a 1-3 step coreg pipeline from the config (reference accuracy.py:132-175)."""
        from xdem_tpu import coreg as _coreg

        steps = []
        cfg = self.config.get("coregistration", {})
        for key in ("step_one", "step_two", "step_three"):
            step_cfg = cfg.get(key)
            if not step_cfg or step_cfg.get("method") in (None, "None"):
                continue
            method = getattr(_coreg, step_cfg["method"])
            kwargs = step_cfg.get("extra_information") or {}
            steps.append(method(**kwargs))
        if not steps:
            return None
        pipeline = steps[0]
        for s in steps[1:]:
            pipeline = pipeline + s
        return pipeline

    def run(self) -> None:
        inputs = self.config["inputs"]
        tba = self._load_dem(inputs["to_be_aligned_elev"])
        ref = self._load_dem(inputs["reference_elev"]) if inputs.get("reference_elev") else None
        if ref is None:
            raise ValueError("The accuracy workflow requires a reference elevation input.")
        mask = self._load_mask(inputs["to_be_aligned_elev"], tba)

        # Common grid: reproject onto the chosen sampling grid (reference :177-228)
        sampling = inputs.get("sampling_grid", "reference_elev")
        if sampling == "to_be_aligned_elev":
            ref = ref.reproject(tba)
        else:
            tba_on_grid = tba.reproject(ref)
            tba = tba.copy(new_array=tba_on_grid.data)
            tba.transform, tba.crs = ref.transform, ref.crs

        inlier_mask = ~mask if mask is not None else None

        dh_before = Raster(ref.data - tba.data, ref.transform, ref.crs)
        stats_names = self.config["statistics"]
        stats_before = self.compute_stats(dh_before, stats_names)
        self.save_stats_table(stats_before, "dh_before_stats")
        self.save_raster_plot(dh_before, "dh_before", cmap="RdBu", title="dh before coregistration")
        self.add_report_section(self.stats_to_html(stats_before, "Elevation difference BEFORE coregistration"))
        self.add_report_section('<img src="plots/dh_before.png">')

        process = self.config.get("coregistration", {}).get("process", True)
        pipeline = self._build_pipeline() if process else None
        if pipeline is not None:
            logging.info("Running coregistration pipeline: %s", pipeline)
            aligned = pipeline.fit_and_apply(ref, tba, inlier_mask=inlier_mask)
            self.coreg = pipeline
            dh_after = Raster(ref.data - aligned.data, ref.transform, ref.crs)
            stats_after = self.compute_stats(dh_after, stats_names)
            self.save_stats_table(stats_after, "dh_after_stats")
            self.save_raster_plot(dh_after, "dh_after", cmap="RdBu", title="dh after coregistration")
            self.add_report_section(self.stats_to_html(stats_after, "Elevation difference AFTER coregistration"))
            self.add_report_section('<img src="plots/dh_after.png">')
            if self.level >= 2:
                aligned.save(str(self.output_dir / "rasters" / "aligned_dem.tif"))
                dh_after.save(str(self.output_dir / "rasters" / "dh_after.tif"))

            # Matrix summary
            try:
                from xdem_tpu.coreg.base import translations_rotations_from_matrix

                tx, ty, tz, a, b, g = translations_rotations_from_matrix(pipeline.to_matrix())
                self.add_report_section(self.stats_to_html(
                    {"shift_x": tx, "shift_y": ty, "shift_z": tz, "rot_x": a, "rot_y": b, "rot_z": g},
                    "Estimated transformation",
                ))
            except NotImplementedError:
                pass

            self._histogram(dh_before, dh_after)
        else:
            self._histogram(dh_before, None)

        self.create_html("xdem-tpu Accuracy report")
        logging.info("Accuracy workflow complete: outputs in %s", self.output_dir)

    def _histogram(self, dh_before: Raster, dh_after: Raster | None) -> None:
        try:
            import matplotlib

            matplotlib.use("Agg")
            import matplotlib.pyplot as plt
        except ImportError:
            return
        fig, ax = plt.subplots(figsize=(7, 4))
        b = dh_before.get_nanarray().ravel()
        b = b[np.isfinite(b)]
        rng_lim = np.nanpercentile(np.abs(b), 99) if b.size else 1.0
        bins = np.linspace(-rng_lim, rng_lim, 100)
        ax.hist(b, bins=bins, alpha=0.5, label="before", density=True)
        if dh_after is not None:
            a = dh_after.get_nanarray().ravel()
            a = a[np.isfinite(a)]
            ax.hist(a, bins=bins, alpha=0.5, label="after", density=True)
        ax.set_xlabel("dh (m)")
        ax.legend()
        path = self.output_dir / "plots" / "dh_histogram.png"
        fig.savefig(path, dpi=120, bbox_inches="tight")
        plt.close(fig)
        self.add_report_section('<img src="plots/dh_histogram.png">')
