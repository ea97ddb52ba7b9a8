"""Mesh construction and sharded batched solves.

TPU-first design (SURVEY.md §8 step 6): the scenario ensemble is the data-
parallel axis. A 2-D mesh ('dcn', 'ici') maps multi-host slices: the batch
is sharded over both axes (pure data parallelism rides ICI within a slice
and DCN across slices); per-scenario Riccati solves never communicate, so
the only collectives are ensemble reductions (`psum` over convergence masks
and solve statistics) — laid out so they ride ICI first.

The same code runs on a virtual CPU mesh (tests/CI via
--xla_force_host_platform_device_count) and on real TPU slices.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from mpc_local_planner_tpu.solvers.al_sqp import SolverSettings, solve_single


def make_mesh(
    n_dcn: int = 1, n_ici: Optional[int] = None, devices=None
) -> Mesh:
    """Build a ('dcn', 'ici') mesh. Defaults to all devices on one DCN group."""
    devices = list(devices if devices is not None else jax.devices())
    if n_ici is None:
        n_ici = len(devices) // n_dcn
    if n_dcn * n_ici != len(devices):
        raise ValueError(
            f"mesh {n_dcn}x{n_ici} != {len(devices)} devices"
        )
    arr = np.asarray(devices).reshape(n_dcn, n_ici)
    return Mesh(arr, axis_names=("dcn", "ici"))


def batch_spec() -> P:
    """PartitionSpec sharding a leading scenario-batch axis over the mesh."""
    return P(("dcn", "ici"))


def shard_batch(tree, mesh: Mesh):
    """Device-put a pytree whose leaves have a leading scenario-batch axis."""
    spec = batch_spec()

    def put(a):
        pspec = P(spec[0], *([None] * (a.ndim - 1)))
        return jax.device_put(a, NamedSharding(mesh, pspec))

    return jax.tree_util.tree_map(put, tree)


def make_sharded_solver(
    spec,
    settings: Optional[SolverSettings] = None,
    mesh: Optional[Mesh] = None,
    rescue_slots: int = 0,
    rescue_settings: Optional[SolverSettings] = None,
):
    """Jitted batched solver with scenario sharding constrained to the mesh.

    The solve itself is vmapped (scenarios → lanes); XLA partitions the batch
    across devices from the input shardings — no collectives in the solve.

    rescue_slots > 0 adds the straggler rescue (solvers/rescue.py) PER
    SHARD: each device compacts and re-solves its own unconverged lanes
    locally (slots is the per-device sub-batch), so the rescue stays
    collective-free — compaction indices never cross device boundaries.
    The sharded path then runs through shard_map (the per-shard batch
    shape must be concrete for the compaction), the unsharded path through
    plain jit.
    """
    settings = settings or SolverSettings.for_spec(spec)
    # auto wrapper: each device's shard runs the fused whole-solve Pallas
    # kernel when in scope (TPU, f32, flagship spec family); XLA elsewhere
    from mpc_local_planner_tpu.solvers.al_sqp import solve_single_auto

    _solve_one = solve_single_auto(spec, settings)
    rescue = None
    if rescue_slots > 0:
        from mpc_local_planner_tpu.solvers.rescue import make_rescue

        rescue = make_rescue(
            spec, settings, rescue_slots, rescue_settings=rescue_settings
        )

    def solve(scenario, init, duals):
        out = jax.vmap(_solve_one)(scenario, init, duals)
        if rescue is not None:
            out = rescue(scenario, out)
        return out

    if mesh is None:
        return jax.jit(solve)

    if rescue is not None:
        # per-shard rescue: shard_map gives the local block, inside which
        # the compaction is ordinary local indexing
        pspec = batch_spec()
        # INVARIANT (load-bearing for check_vma=False below): `solve` — the
        # vmapped per-lane solve + per-shard rescue — must stay COLLECTIVE-
        # FREE. Compaction indices are local, every lane is independent, and
        # dryrun_multichip cross-checks per-lane results against the
        # unsharded path, which would catch any cross-shard dataflow. If you
        # add a collective inside this solve (e.g. a global merit reduction),
        # re-enable the VMA checker first — with it off, shard_map will NOT
        # validate the new collective's mesh-axis usage (ADVICE r4).
        sharded = jax.shard_map(
            solve, mesh=mesh, in_specs=(pspec, pspec, pspec), out_specs=pspec,
            # the solver's scan mixes shard-derived values with replicated
            # constants (reg0, inf sentinels); the VMA checker rejects that
            # mix even though the computation is purely data-parallel —
            # disabled under the collective-free invariant documented above
            check_vma=False,
        )
        return jax.jit(sharded)

    def constrained(scenario, init, duals):
        out = solve(scenario, init, duals)
        return jax.tree_util.tree_map(
            lambda a: jax.lax.with_sharding_constraint(
                a, NamedSharding(mesh, P(batch_spec()[0], *([None] * (a.ndim - 1))))
            ),
            out,
        )

    return jax.jit(constrained)


def ensemble_summary(result):
    """Global ensemble statistics — the cross-device reduction of a solve.

    Returns (n_converged, mean_cost, max_eq_norm, max_ineq_viol) as scalars;
    under a sharded batch XLA lowers these to psum/all-reduce over ICI/DCN.
    """
    return (
        jnp.sum(result.converged.astype(jnp.int32)),
        jnp.mean(result.cost),
        jnp.max(result.eq_norm),
        jnp.max(result.ineq_viol),
    )
