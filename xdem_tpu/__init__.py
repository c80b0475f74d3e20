"""xdem_tpu: a TPU-native (JAX/XLA/Pallas) framework for DEM and elevation point-cloud analysis.

Re-designed from scratch with the capability surface of GlacioHack/xdem: elevation objects
(DEM/EPC), terrain attributes as fused stencil kernels, 3-D coregistration as jit-compiled
iterative solvers, uncertainty analysis (heteroscedasticity, variograms, error propagation) as
sharded pairwise kernels, and volume change / workflows / CLI on top.
"""

from __future__ import annotations

__version__ = "0.1.0"

import os as _os

if _os.environ.get("XDEM_TPU_PLATFORM"):
    # Escape hatch for environments where a site hook pre-imports jax with a pinned platform
    # (making JAX_PLATFORMS ineffective): force the platform through the config API.
    import jax as _jax

    _jax.config.update("jax_platforms", _os.environ["XDEM_TPU_PLATFORM"])

import jax as _jax

# CPU is "forced" only when the resolved platform list leads with cpu (env-list syntax like
# "tpu,cpu" keeps the cache on; config-API-forced cpu is detected via the jax config value).
_platforms = (_jax.config.jax_platforms or _os.environ.get("JAX_PLATFORMS", "") or "")
_cpu_forced = _platforms.split(",")[0].strip().lower() == "cpu"
if not _os.environ.get("XDEM_TPU_NO_COMPILE_CACHE") and not _cpu_forced:
    # Persistent compilation cache: every new raster shape otherwise costs a fresh XLA compile
    # (3-30 s through a tunneled TPU; warm shapes re-hit the cache across processes). CPU runs
    # skip it — their compiles are fast and reloading CPU AOT entries logs machine-feature
    # mismatch noise.
    import jax as _jax

    try:
        _cache_dir = _os.environ.get(
            "XDEM_TPU_COMPILE_CACHE_DIR",
            _os.path.join(_os.path.expanduser("~"), ".cache", "xdem_tpu", "jax_cache"),
        )
        _os.makedirs(_cache_dir, exist_ok=True)
        _jax.config.update("jax_compilation_cache_dir", _cache_dir)
        _jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
        _jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:  # config names shift between jax versions; the cache is best-effort
        pass

from xdem_tpu import examples, fit, georef, ops, spatialstats, terrain, vcrs, volume  # noqa: F401
from xdem_tpu.ddem import dDEM  # noqa: F401
from xdem_tpu.dem import DEM  # noqa: F401
from xdem_tpu.demcollection import DEMCollection  # noqa: F401
from xdem_tpu.epc import EPC  # noqa: F401
from xdem_tpu.georef import CRS, Affine  # noqa: F401
from xdem_tpu.pointcloud import PointCloud  # noqa: F401
from xdem_tpu.raster import Raster  # noqa: F401
from xdem_tpu.vector import Vector  # noqa: F401
from xdem_tpu.config import config, config_context  # noqa: F401

def __getattr__(name: str):
    # Lazy submodule imports (coreg pulls in the full solver stack; workflows pulls in reporting)
    if name in ("coreg", "workflows", "uncertainty", "parallel", "io"):
        import importlib

        mod = importlib.import_module(f"xdem_tpu.{name}")
        globals()[name] = mod
        return mod
    raise AttributeError(f"module 'xdem_tpu' has no attribute {name!r}")


def __dir__():
    # Surface the lazy submodules in dir()/tab completion (PEP 562)
    return sorted(set(globals()) | {"coreg", "workflows", "uncertainty", "parallel", "io"})


__all__ = [
    "DEM",
    "dDEM",
    "DEMCollection",
    "EPC",
    "Raster",
    "PointCloud",
    "Vector",
    "CRS",
    "Affine",
    "config",
    "config_context",
    "coreg",
    "terrain",
    "spatialstats",
    "volume",
    "fit",
    "examples",
    "georef",
    "vcrs",
    "ops",
]
