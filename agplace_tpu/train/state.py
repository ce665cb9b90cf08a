"""Train state: both towers' params + batch stats + optimizer state in one
pytree, so the whole training step is a single donated-buffer jit (the
reference keeps two separate torch models + two Adam optimizers,
``/root/reference/train.py:120-214``)."""

from __future__ import annotations

from typing import Any, Dict, Optional

import flax.struct
import jax
import optax


@flax.struct.dataclass
class TrainState:
    step: jax.Array
    params: Dict[str, Any]  # {"mm": ..., "db": ...}
    batch_stats: Dict[str, Any]
    opt_state: optax.OptState

    @classmethod
    def create(cls, params, batch_stats, tx: optax.GradientTransformation):
        import jax.numpy as jnp

        return cls(
            step=jnp.zeros((), jnp.int32),
            params=params,
            batch_stats=batch_stats,
            opt_state=tx.init(params),
        )
