"""Signal recording.

Parity: cbr:core/signal_target_interface.h + signals.h
(SignalTargetInterface — named TimeSeries/measurement streams the corbo GUI
plots; the planner exports solver signals through it). Here: a lightweight
host-side recorder of named scalar/vector streams with TimeSeries export —
the observability backbone for tasks/benchmarks (SURVEY.md §6).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List

import numpy as np

from mpc_local_planner_tpu.core.time_series import TimeSeries


@dataclasses.dataclass
class SignalRecorder:
    """Append-only named measurement streams."""

    _times: Dict[str, List[float]] = dataclasses.field(default_factory=dict)
    _values: Dict[str, List[np.ndarray]] = dataclasses.field(default_factory=dict)

    def send_measurement(self, name: str, t: float, value) -> None:
        """Parity: SignalTargetInterface::sendMeasurement."""
        v = np.atleast_1d(np.asarray(value, dtype=np.float64))
        self._times.setdefault(name, []).append(float(t))
        self._values.setdefault(name, []).append(v)

    def names(self):
        return sorted(self._times)

    def series(self, name: str) -> TimeSeries:
        """Export one stream as a TimeSeries (parity: getTimeSeries)."""
        import jax.numpy as jnp

        return TimeSeries(
            times=jnp.asarray(np.asarray(self._times[name])),
            values=jnp.asarray(np.stack(self._values[name])),
        )

    def clear(self) -> None:
        self._times.clear()
        self._values.clear()
