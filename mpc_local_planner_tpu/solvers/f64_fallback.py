"""Host-side float64 fallback pass for persistent stragglers (opt-in).

Parity: IPOPT runs every solve in double precision on the host CPU
(cbr:optimization/solver/nlp_solver_ipopt.h :: SolverIpopt::solve via
Ipopt/MUMPS — f64 throughout), which is why it certifies essentially every
feasible instance given budget. The TPU pipeline runs f32 (the chip has no
native f64), and the residual per-family reliability gap (1-7 lanes per 128
after the compaction rescue — BENCH_NOTES r5 families table) is
f32-precision-bound: those lanes are certified feasible only by the f64
pipeline at equal budgets. This pass closes the gap the reference-faithful
way — lanes still unconverged after the f32 solve (+ rescue) are shipped to
the host CPU backend, re-solved in double precision at the cold budget, and
merged back where the f64 solve converged.

Cost model: a host round trip plus a CPU f64 AL-SQP cold solve per
straggler chunk — milliseconds-to-tens-of-ms per chunk, i.e. ~10³× the
per-lane TPU cycle cost. This is an accuracy/reliability knob for offline
or single-robot serving (where IPOPT-grade "solves every feasible instance"
matters), NOT a fleet-throughput default; it is also host-side by nature
and therefore only available on the Controller path, not inside the
in-graph serving scan (`planner/serving.py`).

Design notes:
  * Everything f64 happens inside ``jax.enable_x64()`` so the pass works in
    production processes where global x64 is off (the jit cache keys on the
    x64 trace context, so the compiled CPU program is reused across calls).
  * ``solve_single`` always lowers to the XLA path, and the KKT "auto"
    dispatch refuses Pallas for f64 operands, so the CPU program never
    touches a TPU-only kernel even though the process default backend is
    the TPU.
  * Chunks are padded to the static ``slots`` shape by REPEATING the first
    straggler's lane. Pad lanes are exact copies, so every duplicate
    scatter write carries an identical value — the merge is deterministic
    without a separate liveness mask.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from mpc_local_planner_tpu.core.tree import where_tree
from mpc_local_planner_tpu.ocp.grid import initial_primal
from mpc_local_planner_tpu.ocp.spec import OcpSpec
from mpc_local_planner_tpu.solvers.al_sqp import (
    SolveResult,
    SolverSettings,
    init_duals,
    solve_single,
)


def _cast_floating(tree, dtype):
    return jax.tree_util.tree_map(
        lambda a: jnp.asarray(a, dtype)
        if jnp.issubdtype(jnp.asarray(a).dtype, jnp.floating)
        else jnp.asarray(a),
        tree,
    )


def make_f64_fallback(
    spec: OcpSpec,
    settings: SolverSettings,
    slots: int,
    divergence_threshold: float = 0.5,
):
    """Build fallback(scenario, result) -> SolveResult (host-side, NOT jittable).

    slots: straggler chunk size (static CPU program shape; all stragglers
    are processed in ceil(n/slots) chunks, so unlike the TPU rescue this
    pass never truncates). settings: the f64 budget — typically the cold
    schedule with ``early_exit=True`` (converge-or-exhausted; the batched
    while_loop runs until every chunk lane converges or the cap is hit) and
    the pipeline's shipping tolerance, so the merged ``converged`` flag
    means the same thing as the flags it replaces.

    Two attempts per chunk: lanes whose f32 iterate is finite and not
    blown up (eq/ineq ≤ divergence_threshold) first CONTINUE from it in
    f64 (diverged lanes restart immediately); whatever the continuation
    leaves unconverged is re-solved from the fresh seed — ``fallback``'s
    optional full-batch ``fresh_primal`` (the plan-seeded init the
    Controller already computes — the A*-reseed analog of the rescue's
    fresh_init hook) or the straight-line init when none is given. The
    second attempt exists because basin-trapped stragglers stay trapped
    under f64 continuation; a fresh plan-seeded f64 solve is exactly the
    golden classifier's feasibility certificate. Lanes both attempts fail
    keep their original f32 result untouched (nothing is ever overwritten
    with a worse state).
    """
    if slots <= 0:
        raise ValueError(f"slots must be positive, got {slots}")

    solve64 = jax.jit(
        jax.vmap(lambda s, i, d: solve_single(spec, settings, s, i, d))
    )

    def fallback(scenario, result: SolveResult, fresh_primal=None) -> SolveResult:
        conv = np.asarray(result.converged)
        idx_all = np.nonzero(~conv)[0]
        if idx_all.size == 0:
            return result
        cpu = jax.devices("cpu")[0]
        k = int(min(slots, conv.shape[0]))
        # one host fetch; chunks below slice these numpy snapshots
        h_scen, h_primal, h_duals = jax.tree_util.tree_map(
            np.asarray, (scenario, result.primal, result.duals)
        )
        h_fresh = (
            None
            if fresh_primal is None
            else jax.tree_util.tree_map(np.asarray, fresh_primal)
        )
        eq = np.asarray(result.eq_norm)
        iv = np.asarray(result.ineq_viol)
        merged = result
        for start in range(0, idx_all.size, k):
            chunk = idx_all[start : start + k]
            pad = np.full((k,), chunk[0], np.int64)
            pad[: chunk.size] = chunk
            take = lambda t: jax.tree_util.tree_map(lambda a: a[pad], t)  # noqa: E731
            # continue-vs-fresh (numpy, NaN-safe: NaN norms compare False)
            p = take(h_primal)
            finite = (
                np.isfinite(p.xs).all(axis=(-2, -1))
                & np.isfinite(p.us).all(axis=(-2, -1))
                & np.isfinite(p.dt).reshape(k, -1).all(axis=-1)
            )
            thr = divergence_threshold
            sane = finite & (eq[pad] <= thr) & (iv[pad] <= thr)
            with jax.enable_x64():
                scen_k = jax.device_put(
                    _cast_floating(take(h_scen), jnp.float64), cpu
                )
                primal_k = jax.device_put(
                    _cast_floating(p, jnp.float64), cpu
                )
                duals_k = jax.device_put(
                    _cast_floating(take(h_duals), jnp.float64), cpu
                )
                if h_fresh is None:
                    fresh_p = initial_primal(spec, scen_k)
                else:
                    fresh_p = jax.device_put(
                        _cast_floating(take(h_fresh), jnp.float64), cpu
                    )
                fresh_d = jax.tree_util.tree_map(
                    lambda a: jnp.broadcast_to(a, (k,) + a.shape),
                    init_duals(spec, settings, dtype=jnp.float64),
                )
                sane_dev = jax.device_put(jnp.asarray(sane), cpu)
                init_k = where_tree(sane_dev, primal_k, fresh_p)
                din_k = where_tree(sane_dev, duals_k, fresh_d)
                out = solve64(scen_k, init_k, din_k)
                # second attempt — fresh restart for the continuation's
                # leftovers: a sane-but-basin-trapped straggler continues
                # from its trapped f32 iterate in f64 and stays trapped
                # (measured on the wall family: continuation rescued only
                # 2 of 4 f64-certified stragglers; the certificate is a
                # FRESH plan-seeded f64 solve, so replicate it — the same
                # lesson as stuck_restart_cycles)
                retry = np.asarray(out.converged) == False  # noqa: E712
                if (retry & sane).any():
                    out2 = solve64(scen_k, fresh_p, fresh_d)
                    take2 = jnp.logical_and(
                        jnp.logical_not(out.converged), out2.converged
                    )
                    out = where_tree(take2, out2, out)
                keep = np.asarray(out.converged)
                out_host = jax.tree_util.tree_map(np.asarray, out)
            if not keep.any():
                continue
            idx_dev = jnp.asarray(pad)
            keep_dev = jnp.asarray(keep)

            def scat(dst, src):
                src = jnp.asarray(np.asarray(src), dst.dtype)
                m = keep_dev.reshape(keep_dev.shape + (1,) * (src.ndim - 1))
                cur = jnp.take(dst, idx_dev, axis=0)
                return dst.at[idx_dev].set(jnp.where(m, src, cur))

            merged = SolveResult(
                primal=jax.tree_util.tree_map(
                    scat, merged.primal, out_host.primal
                ),
                duals=jax.tree_util.tree_map(
                    scat, merged.duals, out_host.duals
                ),
                cost=scat(merged.cost, out_host.cost),
                eq_norm=scat(merged.eq_norm, out_host.eq_norm),
                ineq_viol=scat(merged.ineq_viol, out_host.ineq_viol),
                converged=scat(merged.converged, out_host.converged),
            )
        return merged

    return fallback
