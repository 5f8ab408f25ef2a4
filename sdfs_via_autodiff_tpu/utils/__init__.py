from .checkpoint import save_solution, load_solution, SolutionCheckpoint

__all__ = ["save_solution", "load_solution", "SolutionCheckpoint"]
