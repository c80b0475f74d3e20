"""Workflow base class: config loading/validation, output tree, stats, reporting.

Reference parity (/root/reference/xdem/workflows/workflows.py): abstract Workflows class (:77),
YAML load with None-string fix (:170-181), output tree plots/rasters/tables (:122-135), stats
aliasing (:58-74), CSV/HTML report.
"""

from __future__ import annotations

import logging
import os
from abc import ABC, abstractmethod
from pathlib import Path
from typing import Any

import numpy as np

from xdem_tpu.dem import DEM
from xdem_tpu.raster import Raster

# Statistic names resolve through Raster.get_stats' shared alias resolver (reference :58-74)


def load_yaml_config(path: str) -> dict[str, Any]:
    """Load a YAML config, converting 'None'/'null' strings to None (reference :170-181)."""
    import yaml

    with open(path) as f:
        cfg = yaml.safe_load(f)

    def fix(obj: Any) -> Any:
        if isinstance(obj, dict):
            return {k: fix(v) for k, v in obj.items()}
        if isinstance(obj, list):
            return [fix(v) for v in obj]
        if isinstance(obj, str) and obj.strip().lower() in ("none", "null", ""):
            return None
        return obj

    return fix(cfg)


class Workflows(ABC):
    """Base class for YAML-driven processing workflows."""

    schema: dict[str, Any] = {}

    def __init__(self, user_config: str | dict[str, Any], output: str | None = None,
                 output_dir: str | None = None):
        from xdem_tpu.workflows.schemas import validate_configuration

        # `user_config`/`output` are the reference's parameter names (workflows.py:82);
        # output_dir is kept as an accepted alias.
        config = user_config
        if output_dir is None:
            output_dir = output
        if isinstance(config, str):
            config = load_yaml_config(config)
        self.config = validate_configuration(config, self.schema)
        out_cfg = self.config.get("outputs", {})
        self.output_dir = Path(output_dir or out_cfg.get("path", "outputs"))
        self.level = out_cfg.get("level", 1)
        self.generate_pdf = out_cfg.get("generate_pdf", False)
        self._make_output_tree()
        self._report_sections: list[str] = []

    def _make_output_tree(self) -> None:
        for sub in ("plots", "rasters", "tables"):
            os.makedirs(self.output_dir / sub, exist_ok=True)

    # ------------------------------------------------------------------ helpers

    def _load_dem(self, dem_cfg: dict[str, Any]) -> DEM:
        """Load a DEM from an inputs config dict (path, nodata, vcrs, downsample)."""
        # Decimated read + forced nodata through the path constructor, like the reference's
        # DEM(path, downsample=..., nodata=...) (geoutils decimated read; dem.py:92)
        nd = dem_cfg.get("force_source_nodata")
        ds = int(dem_cfg.get("downsample", 1) or 1)
        dem = DEM(dem_cfg["path_to_elev"],
                  nodata=float(nd) if nd is not None else None,
                  downsample=ds if ds > 1 else 1)
        if dem_cfg.get("force_vcrs") is not None:
            dem.set_vcrs(dem_cfg["force_vcrs"])
        return dem

    def _load_mask(self, dem_cfg: dict[str, Any], dem: DEM) -> np.ndarray | None:
        path = dem_cfg.get("path_to_mask")
        if path is None:
            return None
        if str(path).endswith((".json", ".geojson")):
            from xdem_tpu.vector import Vector

            return Vector.from_geojson(str(path)).create_mask(dem)
        mask_r = Raster.open(str(path))
        if mask_r.shape != dem.shape:
            mask_r = mask_r.reproject(dem, resampling="nearest")
        return np.asarray(mask_r.data) > 0

    def compute_stats(self, raster: Raster, names: list[str]) -> dict[str, float]:
        return raster.get_stats(names)

    def save_stats_table(self, stats: dict[str, Any], name: str) -> Path:
        import pandas as pd

        path = self.output_dir / "tables" / f"{name}.csv"
        pd.DataFrame([stats]).to_csv(path, index=False)
        return path

    def save_raster_plot(self, raster: Raster, name: str, cmap: str = "terrain",
                         title: str | None = None, vmin: float | None = None,
                         vmax: float | None = None) -> Path | None:
        try:
            import matplotlib

            matplotlib.use("Agg")
            import matplotlib.pyplot as plt
        except ImportError:
            return None
        fig, ax = plt.subplots(figsize=(7, 5))
        arr = raster.get_nanarray()
        b = raster.bounds
        if vmin is None or vmax is None:
            auto = np.nanpercentile(arr, [2, 98]) if np.isfinite(arr).any() else (0, 1)
            vmin = auto[0] if vmin is None else vmin
            vmax = auto[1] if vmax is None else vmax
        im = ax.imshow(arr, cmap=cmap, vmin=vmin, vmax=vmax, extent=(b.left, b.right, b.bottom, b.top))
        fig.colorbar(im, ax=ax, shrink=0.8)
        ax.set_title(title or name)
        path = self.output_dir / "plots" / f"{name}.png"
        fig.savefig(path, dpi=120, bbox_inches="tight")
        plt.close(fig)
        return path

    @staticmethod
    def table_to_html(df, caption: str) -> str:
        """Render a pandas DataFrame as an HTML report section."""
        return f"<h3>{caption}</h3>" + df.to_html(float_format=lambda v: f"{v:.6g}")

    def add_report_section(self, html: str) -> None:
        self._report_sections.append(html)

    def create_html(self, title: str) -> Path:
        body = "\n".join(self._report_sections)
        html = f"""<!DOCTYPE html>
<html><head><meta charset="utf-8"><title>{title}</title>
<style>body{{font-family:sans-serif;margin:2em}} table{{border-collapse:collapse}}
td,th{{border:1px solid #999;padding:4px 8px}} img{{max-width:45em}}</style></head>
<body><h1>{title}</h1>
{body}
</body></html>"""
        path = self.output_dir / "report.html"
        path.write_text(html)
        if self.generate_pdf:
            self.create_pdf(title)
        return path

    def create_pdf(self, title: str) -> Path | None:
        """Multi-page PDF report rendered natively with matplotlib.

        The reference reaches PDF through the optional plutoprint HTML renderer
        (reference workflows.py:~460); here the same report sections (stats tables,
        metadata, figures) are laid out directly — no HTML engine needed.
        """
        import re

        try:
            import matplotlib

            matplotlib.use("Agg")
            import matplotlib.image as mpimg
            import matplotlib.pyplot as plt
            from matplotlib.backends.backend_pdf import PdfPages
        except ImportError:
            logging.warning("matplotlib unavailable; skipping PDF report.")
            return None

        def section_lines(s: str) -> list[str]:
            """Flatten one HTML section into display lines (captions, table rows, text)."""
            out: list[str] = []
            for cap in re.findall(r"<h3>(.*?)</h3>", s, re.S):
                out += ["", cap.strip(), "-" * min(len(cap.strip()), 70)]
            for row in re.findall(r"<tr>(.*?)</tr>", s, re.S):
                cells = re.findall(r"<t[hd][^>]*>(.*?)</t[hd]>", row, re.S)
                cells = [re.sub(r"<[^>]+>", "", c).strip() for c in cells]
                if any(cells):
                    out.append("  ".join(f"{c:<18}" if i == 0 else c for i, c in enumerate(cells)))
            for par in re.findall(r"<p>(.*?)</p>", s, re.S):
                out += ["", re.sub(r"<[^>]+>", "", par).strip()]
            return out

        path = self.output_dir / "report.pdf"
        page_size = (8.27, 11.69)  # A4 portrait
        max_lines = 58
        with PdfPages(path) as pdf:
            pending: list[str] = [title, "=" * min(len(title), 70)]

            def flush_text() -> None:
                nonlocal pending
                while pending:
                    chunk, pending = pending[:max_lines], pending[max_lines:]
                    fig = plt.figure(figsize=page_size)
                    fig.text(0.07, 0.95, "\n".join(chunk), va="top", family="monospace",
                             fontsize=9)
                    pdf.savefig(fig)
                    plt.close(fig)

            for section in self._report_sections:
                m = re.search(r'<img src="([^"]+)"', section)
                if m:
                    img_path = self.output_dir / m.group(1)
                    if not img_path.exists():
                        continue
                    flush_text()
                    fig, ax = plt.subplots(figsize=page_size)
                    ax.imshow(mpimg.imread(str(img_path)))
                    ax.axis("off")
                    ax.set_title(img_path.stem)
                    pdf.savefig(fig)
                    plt.close(fig)
                else:
                    pending += section_lines(section)
            flush_text()
        return path

    @staticmethod
    def stats_to_html(stats: dict[str, Any], caption: str) -> str:
        rows = "".join(f"<tr><th>{k}</th><td>{v:.6g}</td></tr>" if isinstance(v, float)
                       else f"<tr><th>{k}</th><td>{v}</td></tr>" for k, v in stats.items())
        return f"<h3>{caption}</h3><table>{rows}</table>"

    @abstractmethod
    def run(self) -> None:
        """Execute the workflow."""
