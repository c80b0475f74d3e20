"""3-D coregistration: affine methods, bias corrections, pipelines, and blockwise tiling."""

from xdem_tpu.coreg.base import (
    Coreg,
    CoregPipeline,
    apply_matrix,
    invert_matrix,
    matrix_from_translations_rotations,
    translations_rotations_from_matrix,
)
from xdem_tpu.coreg.affine import (
    CPD,
    ICP,
    LZD,
    AffineCoreg,
    DhMinimize,
    NuthKaab,
    VerticalShift,
)
from xdem_tpu.coreg.biascorr import BiasCorr, Deramp, DirectionalBias, TerrainBias
from xdem_tpu.coreg.blockwise import BlockwiseCoreg, BlockwiseNuthKaab, MultiprocConfig

__all__ = [
    "Coreg",
    "CoregPipeline",
    "AffineCoreg",
    "VerticalShift",
    "NuthKaab",
    "DhMinimize",
    "ICP",
    "CPD",
    "LZD",
    "BiasCorr",
    "Deramp",
    "DirectionalBias",
    "TerrainBias",
    "BlockwiseCoreg",
    "BlockwiseNuthKaab",
    "MultiprocConfig",
    "apply_matrix",
    "invert_matrix",
    "matrix_from_translations_rotations",
    "translations_rotations_from_matrix",
]
