"""Nuth & Kaab coregistration of the example pair (mirrors the reference's coreg gallery)."""
import os

import numpy as np

from xdem_tpu import coreg, examples

os.makedirs("gallery_outputs", exist_ok=True)
ref = examples.get_ref_dem()
tba = examples.get_tba_dem()
inlier_mask = ~examples.get_glacier_mask()

pipeline = coreg.NuthKaab() + coreg.VerticalShift()
aligned = pipeline.fit_and_apply(ref, tba, inlier_mask=inlier_mask, random_state=42)

dh_before = np.asarray((ref - tba).data)[inlier_mask]
dh_after = np.asarray((ref - aligned).data)[inlier_mask]
print(f"translation estimated: {np.round(pipeline.to_matrix()[:3, 3], 3)} (truth: "
      f"{tuple(-s for s in examples.TBA_SHIFT)})")
print(f"stable dh NMAD: before {1.4826*np.nanmedian(np.abs(dh_before - np.nanmedian(dh_before))):.3f} m, "
      f"after {1.4826*np.nanmedian(np.abs(dh_after - np.nanmedian(dh_after))):.3f} m")
