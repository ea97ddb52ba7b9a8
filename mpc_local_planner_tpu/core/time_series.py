"""Time series containers.

Parity: cbr:core ``time_series.h`` (corbo::TimeSeries — time+value matrix with
ZOH/linear interpolation) and mpc_local_planner ``utils/time_series_se2.h``
(TimeSeriesSE2 — angle-aware interpolation of the theta component).

TPU-first design: a TimeSeries is an immutable pytree of fixed-shape arrays
(times (T,), values (T, D)), so it can live on device, cross jit boundaries,
and be vmapped over a batch of solves. Every controller solve returns the
state/control sequences in this form (the reference returns corbo TimeSeries
from ``PredictiveController::step``).
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp

from mpc_local_planner_tpu.core.so2 import angle_diff, normalize_angle


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class TimeSeries:
    """times: (..., T); values: (..., T, D). ZOH or linear interpolation."""

    times: jax.Array
    values: jax.Array

    @property
    def num_samples(self) -> int:
        return self.times.shape[-1]

    @property
    def value_dim(self) -> int:
        return self.values.shape[-1]

    def interpolate(self, t, mode: str = "linear"):
        """Sample values at time(s) t (scalar or (...,)).

        Clamps outside the support (matches corbo TimeSeries' extrapolation
        default of holding endpoint values).
        """
        times, values = self.times, self.values
        t = jnp.asarray(t, dtype=times.dtype)
        idx = jnp.clip(jnp.searchsorted(times, t, side="right") - 1, 0, times.shape[-1] - 2)
        t0 = jnp.take(times, idx, axis=-1)
        t1 = jnp.take(times, idx + 1, axis=-1)
        v0 = jnp.take(values, idx, axis=-2)
        v1 = jnp.take(values, idx + 1, axis=-2)
        if mode == "zoh":
            return jnp.where((t >= times[-1])[..., None], values[..., -1, :], v0)
        denom = jnp.where(t1 - t0 > 0, t1 - t0, 1.0)
        alpha = jnp.clip((t - t0) / denom, 0.0, 1.0)[..., None]
        return self._blend(v0, v1, alpha)

    def _blend(self, v0, v1, alpha):
        return v0 + alpha * (v1 - v0)

    def first(self) -> jax.Array:
        return self.values[..., 0, :]

    def last(self) -> jax.Array:
        return self.values[..., -1, :]

    def shifted(self, dt) -> "TimeSeries":
        """Time-shift the series by -dt (used for warm starting)."""
        return dataclasses.replace(self, times=self.times - dt)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class TimeSeriesSE2(TimeSeries):
    """TimeSeries whose component 2 is an angle interpolated on the short arc.

    Parity: utils/time_series_se2.h::TimeSeriesSE2.
    """

    def _blend(self, v0, v1, alpha):
        out = v0 + alpha * (v1 - v0)
        th = normalize_angle(v0[..., 2] + alpha[..., 0] * angle_diff(v1[..., 2], v0[..., 2]))
        return out.at[..., 2].set(th)


def stack_time_series(ts_list: Tuple[TimeSeries, ...]) -> TimeSeries:
    """Stack same-shape series along a new leading batch axis."""
    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs, axis=0), *ts_list)
