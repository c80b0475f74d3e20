"""Type aliases shared across the package.

Mirrors the role of the reference's typing module (/root/reference/xdem/_typing.py:39-41)
with JAX-aware aliases.
"""

from __future__ import annotations

from typing import Any, Union

import jax
import numpy as np

# Float / bool ndarrays (host-side numpy)
NDArrayf = np.ndarray
NDArrayb = np.ndarray

# Device or host array
ArrayLike = Union[np.ndarray, jax.Array]

DTypeLike = Any
