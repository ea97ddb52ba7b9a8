"""Solver-state checkpoint/resume.

Parity: SURVEY.md §6 — the reference's only "resume" mechanism is the warm
start; for a deployed batched service, warm-start buffers (primal + duals +
policy masks) are device state worth snapshotting (debugging, migration,
fault recovery). Plain .npz serialization of the Controller's warm-start
pytrees — dependency-free and exact (bitwise for f32 leaves).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from mpc_local_planner_tpu.ocp.grid import Primal
from mpc_local_planner_tpu.solvers.al_sqp import DualState


def _flatten(prefix: str, tree) -> dict:
    leaves, treedef = jax.tree_util.tree_flatten(tree)
    return {f"{prefix}{i}": np.asarray(v) for i, v in enumerate(leaves)}


def save_controller_state(path: str, controller) -> None:
    """Snapshot a Controller's warm-start state to an .npz file."""
    arrays = {}
    if controller._primal is not None:
        arrays.update(_flatten("primal_", controller._primal))
        arrays.update(_flatten("duals_", controller._duals))
        arrays["last_goal"] = np.asarray(controller._last_goal)
        if controller._last_ok is not None:
            arrays["last_ok"] = np.asarray(controller._last_ok)
            arrays["last_diverged"] = np.asarray(controller._last_diverged)
    np.savez_compressed(path, **arrays)


def load_controller_state(path: str, controller) -> bool:
    """Restore warm-start state saved by save_controller_state.

    Returns False (and leaves the controller reset) for an empty snapshot.
    The spec/batch must match the one the snapshot was taken with.
    """
    data = np.load(path)
    if "primal_0" not in data:
        controller.reset()
        return False
    p_leaves = [jnp.asarray(data[f"primal_{i}"]) for i in range(3)]
    controller._primal = Primal(xs=p_leaves[0], us=p_leaves[1], dt=p_leaves[2])
    d_template = jax.tree_util.tree_structure(
        controller._fresh_duals()
    )
    n_dual = d_template.num_leaves
    d_leaves = [jnp.asarray(data[f"duals_{i}"]) for i in range(n_dual)]
    controller._duals = jax.tree_util.tree_unflatten(d_template, d_leaves)
    controller._last_goal = jnp.asarray(data["last_goal"])
    if "last_ok" in data:
        controller._last_ok = jnp.asarray(data["last_ok"])
        controller._last_diverged = jnp.asarray(data["last_diverged"])
    return True


def save_solve_state(path: str, primal: Primal, duals: Optional[DualState] = None) -> None:
    """Standalone primal/dual snapshot (batched solver workflows)."""
    arrays = _flatten("primal_", primal)
    if duals is not None:
        arrays.update(_flatten("duals_", duals))
    np.savez_compressed(path, **arrays)


def load_solve_state(path: str, duals_template: Optional[DualState] = None):
    data = np.load(path)
    primal = Primal(
        xs=jnp.asarray(data["primal_0"]),
        us=jnp.asarray(data["primal_1"]),
        dt=jnp.asarray(data["primal_2"]),
    )
    duals = None
    if duals_template is not None and "duals_0" in data:
        treedef = jax.tree_util.tree_structure(duals_template)
        leaves = [jnp.asarray(data[f"duals_{i}"]) for i in range(treedef.num_leaves)]
        duals = jax.tree_util.tree_unflatten(treedef, leaves)
    return primal, duals
