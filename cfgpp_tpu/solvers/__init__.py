from cfgpp_tpu.solvers.plans import SolverPlan
from cfgpp_tpu.solvers.registry import SolverSpec, get_solver_spec, list_solvers
from cfgpp_tpu.solvers.sampler import init_latent, run_inversion, run_solver

__all__ = [
    "SolverPlan",
    "SolverSpec",
    "get_solver_spec",
    "list_solvers",
    "init_latent",
    "run_inversion",
    "run_solver",
]
