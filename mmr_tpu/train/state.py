"""Training state pytree."""

from __future__ import annotations

from typing import Any

import flax.struct


@flax.struct.dataclass
class TrainState:
    params: Any
    batch_stats: Any
    opt_state: Any
    step: int = flax.struct.field(pytree_node=True, default=0)

    @classmethod
    def create(cls, variables: dict, optimizer) -> "TrainState":
        return cls(
            params=variables["params"],
            batch_stats=variables.get("batch_stats", {}),
            opt_state=optimizer.init(variables["params"]),
            step=0,
        )

    @property
    def variables(self) -> dict:
        v = {"params": self.params}
        if self.batch_stats:
            v["batch_stats"] = self.batch_stats
        return v
