from pfemfort_tpu.assembly.pattern import AssemblyPattern, build_pattern
from pfemfort_tpu.assembly.assemble import (
    assemble_ell_values,
    assemble_rhs,
    dirichlet_rhs_correction,
)

__all__ = [
    "AssemblyPattern",
    "build_pattern",
    "assemble_ell_values",
    "assemble_rhs",
    "dirichlet_rhs_correction",
]
