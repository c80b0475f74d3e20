"""Blockwise coregistration: per-tile NuthKaab solved in one vmapped program."""
import numpy as np

from xdem_tpu import examples
from xdem_tpu.coreg.blockwise import BlockwiseNuthKaab

ref = examples.get_ref_dem()
tba = examples.get_tba_dem()
bw = BlockwiseNuthKaab(block_size_fit=256, subsample_per_tile=20000, random_state=42)
bw.fit(ref, tba, inlier_mask=~examples.get_glacier_mask())
print(f"tiling grid: {bw.shape_tiling_grid}, per-tile shift_x median: "
      f"{np.nanmedian(bw.shifts_x):.2f} m (truth {-examples.TBA_SHIFT[0]:.2f})")
aligned = bw.apply(tba)
dh = np.asarray((ref - aligned).data)
print(f"dh NMAD after blockwise apply: {1.4826*np.nanmedian(np.abs(dh - np.nanmedian(dh))):.3f} m")
