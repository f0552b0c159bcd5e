"""Training state pytree (params + batch stats + optimizer state)."""

from __future__ import annotations

from typing import Any, Dict

import flax.struct
import jax
import optax


@flax.struct.dataclass
class TrainState:
    step: jax.Array
    params: Dict[str, Any]
    batch_stats: Dict[str, Any]
    opt_state: Any

    @property
    def variables(self) -> Dict[str, Any]:
        return {"params": self.params, "batch_stats": self.batch_stats}

    @staticmethod
    def create(variables: Dict[str, Any], tx: optax.GradientTransformation) -> "TrainState":
        import jax.numpy as jnp

        return TrainState(
            step=jnp.zeros((), jnp.int32),
            params=variables["params"],
            batch_stats=variables["batch_stats"],
            opt_state=tx.init(variables["params"]),
        )
