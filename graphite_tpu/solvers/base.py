"""Linear-solver protocol.

Functional analog of the reference 4-method solver ABC
(reference: solver/solver.hpp:12-25):

- ``prepare(problem, lin, params)``   — update_structure + update_values
  (structure is static after ``Graph.freeze``, so only values remain);
- ``solve(problem, lin, state, damping, use_identity, params)`` —
  set_damping_factor + solve, returning ``(delta_x, ok)`` where ``ok=False``
  signals a factorization failure that LM treats as a rejected step
  (levenberg_marquardt.hpp:181-183).

All methods must be jit-traceable; ``state`` is a pytree refreshed by the
optimizer whenever the linearization changes (i.e. on accepted LM steps).
"""

from __future__ import annotations

from typing import Protocol, Tuple

import jax


class Solver(Protocol):
    def prepare(self, problem, lin, params=None): ...

    def solve(self, problem, lin, state, damping, use_identity,
              params=None) -> Tuple[jax.Array, jax.Array]: ...
