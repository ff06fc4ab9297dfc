from .pcg import PCGSolver
from .dense_cholesky import DenseCholeskySolver

__all__ = ["PCGSolver", "DenseCholeskySolver"]


def __getattr__(name):
    # Lazy imports for solvers with heavier deps.
    if name == "PCGSchurSolver":
        from .pcg_schur import PCGSchurSolver
        return PCGSchurSolver
    if name == "SparseDirectSolver":
        from .sparse_direct import SparseDirectSolver
        return SparseDirectSolver
    if name == "SparseDirectSchurSolver":
        from .sparse_direct_schur import SparseDirectSchurSolver
        return SparseDirectSchurSolver
    if name == "DenseCholeskySchurSolver":
        from .dense_cholesky_schur import DenseCholeskySchurSolver
        return DenseCholeskySchurSolver
    raise AttributeError(name)
