"""Doctest runner for modules with deterministic docstring examples.

The reference runs pytest --doctest-modules over the whole package (pyproject.toml:24-29);
here doctests are opt-in per module to keep device-dependent output out of docstrings.
"""

import doctest

import pytest

import xdem_tpu.fit
import xdem_tpu.geoid
import xdem_tpu.georef
import xdem_tpu.volume


@pytest.mark.parametrize("module", [xdem_tpu.georef, xdem_tpu.fit, xdem_tpu.volume, xdem_tpu.geoid])
def test_doctests(module):
    results = doctest.testmod(module, verbose=False)
    assert results.failed == 0, f"{results.failed} doctest failures in {module.__name__}"
