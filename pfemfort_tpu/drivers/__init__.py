from pfemfort_tpu.drivers.poisson import solve_poisson
from pfemfort_tpu.drivers.elasticity import solve_elasticity

__all__ = ["solve_poisson", "solve_elasticity"]
