"""Mixed-model scenario ensembles (BASELINE config #5: "mixed models").

Different robot models have different dynamics pytrees, so one vmap cannot
span them: a mixed fleet is grouped by OcpSpec and solved as one compiled
batch per group (each group jit-compiles once and runs its scenarios
together — the standard bucketing strategy for heterogeneous batches).
"""

from __future__ import annotations

from typing import Dict, List, Sequence, Tuple

import jax
import jax.numpy as jnp

from mpc_local_planner_tpu.ocp.grid import initial_primal
from mpc_local_planner_tpu.solvers.al_sqp import (
    SolverSettings,
    init_duals,
    solve_single,
)


class MixedEnsembleSolver:
    """Solve scenario groups that differ in OcpSpec (model family, horizon…).

    groups: list of (spec, settings) — one compiled solver per entry.
    """

    def __init__(self, groups: Sequence[Tuple[object, SolverSettings]]):
        self._groups = list(groups)
        self._solvers = [
            jax.jit(
                jax.vmap(
                    lambda s, i, d, spec=spec, st=st: solve_single(spec, st, s, i, d)
                )
            )
            for spec, st in self._groups
        ]

    @property
    def n_groups(self) -> int:
        return len(self._groups)

    def init_state(self, group: int, scenario, dtype=jnp.float32):
        spec, st = self._groups[group]
        init = initial_primal(spec, scenario)
        batch = scenario.x0.shape[:-1]
        duals = jax.tree_util.tree_map(
            lambda a: jnp.broadcast_to(a, batch + a.shape),
            init_duals(spec, st, dtype=dtype),
        )
        return init, duals

    def solve_group(self, group: int, scenario, init, duals):
        return self._solvers[group](scenario, init, duals)

    def solve_all(self, scenarios: Sequence, inits: Sequence, duals: Sequence) -> List:
        """Dispatch all groups (async on device), then gather results."""
        results = [
            self._solvers[g](scenarios[g], inits[g], duals[g])
            for g in range(self.n_groups)
        ]
        return results

    def summary(self, results) -> Dict[str, float]:
        import numpy as np

        conv = np.concatenate([np.asarray(r.converged).ravel() for r in results])
        return {
            "n_scenarios": int(conv.size),
            "converged_frac": float(conv.mean()) if conv.size else 0.0,
        }
