from pfemfort_tpu.elements.quadrature import gauss_rule
from pfemfort_tpu.elements.basis import tabulate_basis

__all__ = ["gauss_rule", "tabulate_basis"]
