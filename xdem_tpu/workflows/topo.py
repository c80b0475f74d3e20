"""Topo workflow: compute terrain attributes + statistics + report for one or more DEMs.

Reference parity: /root/reference/xdem/workflows/topo.py (:40, :159, :245).
"""

from __future__ import annotations

import logging
from typing import Any

from xdem_tpu.workflows.schemas import TOPO_SCHEMA
from xdem_tpu.workflows.workflows import Workflows


class Topo(Workflows):
    """Compute selected terrain attributes, write rasters/plots/stats tables and a report."""

    schema = TOPO_SCHEMA

    def run(self) -> None:
        inputs = self.config["inputs"]
        dem_cfgs = inputs if isinstance(inputs, list) else [inputs]
        attrs_cfg = self.config.get("terrain_attributes") or []
        if isinstance(attrs_cfg, dict):
            attr_items = list(attrs_cfg.items())
        else:
            attr_items = [(a, {}) for a in attrs_cfg]
        stats_names = self.config["statistics"]

        for i, dem_cfg in enumerate(dem_cfgs):
            suffix = f"_dem{i+1}" if len(dem_cfgs) > 1 else ""
            logging.info("Topo workflow: loading DEM %d", i + 1)
            dem = self._load_dem(dem_cfg)

            reproj = self.config.get("reproject")
            if reproj and reproj.get("crs"):
                crs = reproj["crs"]
                dem = dem.reproject(crs=dem.get_metric_crs() if crs is True else crs)

            # path_to_mask marks UNSTABLE terrain (reference workflows.py:387-395:
            # inlier_mask = ~create_mask; topo.py:88-90 then set_mask(~inlier) EXCLUDES the
            # masked area): statistics and attributes are computed on the complement.
            mask = self._load_mask(dem_cfg, dem)
            if mask is not None:
                import numpy as np

                dem = dem.copy(new_array=np.where(mask, np.nan, np.asarray(dem.data)))

            # DEM itself
            self.save_raster_plot(dem, f"dem{suffix}", title="Elevation")
            dem_stats = self.compute_stats(dem, stats_names)
            self.save_stats_table(dem_stats, f"dem_stats{suffix}")
            self.add_report_section(self.stats_to_html(dem_stats, f"Elevation statistics{suffix}"))
            self.add_report_section(f'<img src="plots/dem{suffix}.png">')

            for attr_name, extra in attr_items:
                logging.info("Computing attribute: %s", attr_name)
                attr = dem.get_terrain_attribute(attr_name, **(extra or {}))
                if self.level >= 2:
                    attr.save(str(self.output_dir / "rasters" / f"{attr_name}{suffix}.tif"))
                cmap = "Greys_r" if attr_name == "hillshade" else "viridis"
                self.save_raster_plot(attr, f"{attr_name}{suffix}", cmap=cmap, title=attr_name)
                stats = self.compute_stats(attr, stats_names)
                self.save_stats_table(stats, f"{attr_name}_stats{suffix}")
                self.add_report_section(self.stats_to_html(stats, f"{attr_name}{suffix}"))
                self.add_report_section(f'<img src="plots/{attr_name}{suffix}.png">')

        self.create_html("xdem-tpu Topo report")
        logging.info("Topo workflow complete: outputs in %s", self.output_dir)
