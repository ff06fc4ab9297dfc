from .identity import IdentityPreconditioner
from .block_jacobi import BlockJacobiPreconditioner

__all__ = ["IdentityPreconditioner", "BlockJacobiPreconditioner"]
