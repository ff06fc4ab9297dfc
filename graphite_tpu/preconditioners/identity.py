"""Identity preconditioner (reference: preconditioner/identity.hpp:28-31)."""

from __future__ import annotations

import dataclasses

import jax


@dataclasses.dataclass(frozen=True)
class IdentityPreconditioner:
    def prepare(self, problem, lin, params=None):
        return ()

    def set_damping(self, problem, lin, state, damping, use_identity):
        return state

    def apply(self, problem, lin, state, r: jax.Array) -> jax.Array:
        return r
