"""Reference trajectories.

Parity: cbr:core ``reference_trajectory.h`` (StaticReference, ZeroReference).
A reference maps stage times to reference state/control values; quadratic
costs difference against it. All references are pytrees evaluated with pure
functions, so a batch of scenarios can carry a batch of references.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from mpc_local_planner_tpu.core.time_series import TimeSeries


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class StaticReference:
    """Constant reference value (parity: corbo::StaticReference)."""

    value: jax.Array  # (..., D)

    def at_time(self, t):
        t = jnp.asarray(t)
        return jnp.broadcast_to(self.value, t.shape + self.value.shape)

    def at_stages(self, times):
        return self.at_time(times)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class ZeroReference:
    """All-zeros reference (parity: corbo::ZeroReference)."""

    dim: int = dataclasses.field(metadata=dict(static=True))

    def at_time(self, t):
        t = jnp.asarray(t)
        return jnp.zeros(t.shape + (self.dim,))

    def at_stages(self, times):
        return self.at_time(times)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class TrajectoryReference:
    """Time-varying reference backed by a TimeSeries (linear interpolation)."""

    series: TimeSeries

    def at_time(self, t):
        return self.series.interpolate(t)

    def at_stages(self, times):
        return jax.vmap(self.series.interpolate)(times)
