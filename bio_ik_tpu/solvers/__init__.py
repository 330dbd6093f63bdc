from .base import SolverContext, make_solver, register_solver, solver_names  # noqa: F401
