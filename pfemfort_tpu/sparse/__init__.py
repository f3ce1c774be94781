from pfemfort_tpu.sparse.formats import ELLMatrix
from pfemfort_tpu.sparse.spmv import spmv_ell

__all__ = ["ELLMatrix", "spmv_ell"]
