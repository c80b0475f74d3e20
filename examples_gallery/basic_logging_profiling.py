"""Logging configuration and the profiler.

Mirrors the reference gallery's plot_logging_configuration.py plus the profiler quickstart
(reference geoutils profiler / doc/source/config.md): INFO logging shows per-iteration
coreg progress; the profiler wraps the entry points and reports wall time + peak memory.
"""
import logging
import os

import numpy as np

from xdem_tpu import coreg, examples
from xdem_tpu.profiler import Profiler

os.makedirs("gallery_outputs", exist_ok=True)

# 1. Logging: INFO level surfaces iteration-by-iteration coreg diagnostics
logging.basicConfig(level=logging.INFO, format="%(levelname)s - %(message)s", force=True)

ref = examples.get_ref_dem()
tba = examples.get_tba_dem()

# 2. Profiler: enable, run, summarize (the reference's Profiler.enable/generate_summary)
Profiler.enable(save_raw_data=True)
nk = coreg.NuthKaab()
aligned = nk.fit_and_apply(ref, tba, inlier_mask=~examples.get_glacier_mask(),
                           random_state=42)
summary_path = Profiler.generate_summary("gallery_outputs")
Profiler.disable()

logging.getLogger().setLevel(logging.WARNING)
print("recovered translation:", [round(float(v), 2) for v in nk.to_translations()])
print(f"profiler summary written to {summary_path}/profiling_summary.csv:")
for line in open(f"{summary_path}/profiling_summary.csv").read().splitlines()[:6]:
    print("  ", line)
