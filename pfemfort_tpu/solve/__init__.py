from pfemfort_tpu.solve.cg import cg_solve, bicgstab_solve, SolveStats

__all__ = ["cg_solve", "bicgstab_solve", "SolveStats"]
