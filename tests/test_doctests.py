"""Doctest runner for modules with deterministic docstring examples.

The reference runs pytest --doctest-modules over the whole package (pyproject.toml:24-29);
here doctests are opt-in per module to keep device-dependent output out of docstrings.
"""

import doctest

import pytest

import sys

import xdem_tpu.config  # noqa: F401  (the package re-exports `config` as the dict, so the
import xdem_tpu.fit  # module object must come from sys.modules)
import xdem_tpu.geoid
import xdem_tpu.georef
import xdem_tpu.coreg.base
import xdem_tpu.ops.reductions
import xdem_tpu.spatialstats
import xdem_tpu.terrain.terrain
import xdem_tpu.vector
import xdem_tpu.volume

_config_mod = sys.modules["xdem_tpu.config"]


@pytest.mark.parametrize("module", [xdem_tpu.georef, xdem_tpu.fit, xdem_tpu.volume,
                                    xdem_tpu.geoid, _config_mod, xdem_tpu.vector,
                                    xdem_tpu.terrain.terrain, xdem_tpu.coreg.base,
                                    xdem_tpu.ops.reductions, xdem_tpu.spatialstats])
def test_doctests(module):
    results = doctest.testmod(module, verbose=False)
    assert results.failed == 0, f"{results.failed} doctest failures in {module.__name__}"
