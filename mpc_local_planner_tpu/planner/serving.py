"""Rolling-journey serving runtime — the production control-loop component.

Parity role: the reference gets its production loop from move_base —
`src/mpc_local_planner_ros.cpp :: computeVelocityCommands` is called at
`controller_frequency`, and on failure returns an error code that triggers
move_base recovery behaviors / replanning (SURVEY §4.2). The batched TPU
equivalent is a JOURNEY STREAM: E independent journeys (start→goal under an
obstacle field) advance through vmapped warm MPC cycles inside one jitted
`lax.scan` block; each journey retires on goal-reached (the nav stack picks
a new goal) or after `stuck_limit` consecutive unconverged cycles (the
abandon-and-replan analog of move_base recovery), and retired lanes redraw a
fresh journey in-graph, paying an early-exit cold replant exactly as a live
system pays for a new goal arrival.

Extracted from bench.py::serving_mode (VERDICT r4 missing #2) so the stream
semantics are a tested package API (tests/test_serving.py pins the
invariants: retired lanes redraw, non-retired lanes' iterates survive a
redraw cycle bit-identically, the chained rescue only touches unconverged
lanes, the stuck counter resets on convergence) and the bench is a thin
wrapper. Cycle stats capture each abandoned journey's scenario AT ABANDON
TIME so an offline oracle can classify whether the abandon was justified
(the false-abandon audit — VERDICT r4 weak #1).
"""

from __future__ import annotations

import dataclasses
from typing import Callable, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from mpc_local_planner_tpu.core.tree import where_tree
from mpc_local_planner_tpu.ocp.grid import initial_primal
from mpc_local_planner_tpu.ocp.spec import OcpSpec, Scenario
from mpc_local_planner_tpu.solvers.al_sqp import (
    SolveResult,
    SolverSettings,
    init_duals,
    solve_single,
)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class StreamState:
    """Device-resident stream state (one pytree; feeds the next cycle)."""

    scen: Scenario        # (E, ...) live journeys
    result: SolveResult   # last cycle's solve (warm-start source)
    stuck: jax.Array      # (E,) int32 consecutive-unconverged counter
    key: jax.Array        # PRNG key for in-graph redraws


class CycleStats(NamedTuple):
    """Per-cycle outputs (stacked over the scan axis by run_block)."""

    converged: jax.Array      # (E,) post-rescue convergence this cycle
    reached: jax.Array        # (E,) goal reached → retired
    abandoned: jax.Array      # (E,) stuck-limit hit → retired unconverged
    abandoned_scen: Scenario  # (E, ...) the journey AT ABANDON TIME (x0 =
    #                           the stuck pose) where ``abandoned``; zeros
    #                           elsewhere — offline false-abandon audit data


@dataclasses.dataclass(frozen=True)
class StreamSettings:
    """Stream semantics (static; baked into the compiled block).

    goal tolerances mirror the controller's goal test
    (`MpcLocalPlannerROS::isGoalReached` xy/yaw tolerances); `stuck_limit`
    is the abandon-and-replan threshold (the reference returns failure to
    move_base, whose recovery behaviors replan); `chained_rescue` re-solves
    still-unconverged lanes once from their iterate (re-entering resets
    regularization/line-search state — the r4 probe's decisive straggler
    lever; with early_exit the batched while_loop freezes converged lanes,
    so it costs only the stragglers' extra phases); `cold_replant` runs the
    early-exit cold program on redraw cycles only (lax.cond-gated).
    """

    goal_xy_tol: float = 0.2
    goal_yaw_tol: float = 0.2
    stuck_limit: int = 2
    chained_rescue: bool = True
    cold_replant: bool = True


class JourneyStream:
    """Compiled rolling-journey serving loop over a fixed ensemble width E.

    redraw_fn(key, E) -> Scenario draws fresh journeys (jit-traceable; the
    bench passes benchmarks.random_ensemble). ``warm`` is the per-cycle
    budget (typically an early-exit serving preset); ``cold`` the
    (re)initialization budget — its early-exit variant runs on redraw
    cycles.
    """

    def __init__(
        self,
        spec: OcpSpec,
        warm: SolverSettings,
        cold: Optional[SolverSettings] = None,
        redraw_fn: Optional[Callable[[jax.Array, int], Scenario]] = None,
        settings: StreamSettings = StreamSettings(),
    ):
        if redraw_fn is None:
            raise ValueError("JourneyStream needs a redraw_fn(key, E) -> Scenario")
        self.spec = spec
        self.warm = warm
        self.cold = cold or SolverSettings.for_spec(spec)
        self.settings = settings
        self._redraw = redraw_fn
        self._warm_solve = jax.vmap(
            lambda s, i, d: solve_single(spec, warm, s, i, d)
        )
        cold_ee = dataclasses.replace(self.cold, early_exit=True)
        self._cold_ee_solve = jax.vmap(
            lambda s, i, d: solve_single(spec, cold_ee, s, i, d)
        )
        self._cold_solve = jax.jit(
            jax.vmap(lambda s, i, d: solve_single(spec, self.cold, s, i, d))
        )
        self._fleet_cycles = {}  # per-(E, dtype) composed warm-cycle bodies

    def _fleet_cycle(self, E: int, dtype):
        """The shared advance/continue/reset body (planner/cycle.py) with
        the stream's chained rescue as its rescue hook — review r5: the
        serving loop must COMPOSE the policy the bench fleet runs, not
        carry a third copy of it (every past policy bug lived in the
        duplicated layer)."""
        key = (E, str(dtype))
        fn = self._fleet_cycles.get(key)
        if fn is None:
            from mpc_local_planner_tpu.planner.cycle import make_fleet_cycle

            rescue = None
            if self.settings.chained_rescue:
                def rescue(s, r2):
                    # one chained re-solve on still-unconverged lanes
                    # (re-entering resets regularization/line-search state —
                    # the r4 probe's decisive straggler lever; with
                    # early_exit the batched while_loop freezes converged
                    # lanes, so this costs only the stragglers' phases)
                    r3 = self._warm_solve(s, r2.primal, r2.duals)
                    return where_tree(jnp.logical_not(r2.converged), r3, r2)

            # the cached closure must hold CONCRETE arrays: _fleet_cycle is
            # typically first invoked inside a caller's jit trace, and a
            # duals0 built there would be a tracer that leaks into every
            # later trace reusing the cache (UnexpectedTracerError)
            with jax.ensure_compile_time_eval():
                duals0 = self._duals0(E, dtype=dtype)
            fn = make_fleet_cycle(
                self.spec, self.warm, duals0,
                solve=self._warm_solve, rescue=rescue,
            )
            self._fleet_cycles[key] = fn
        return fn

    # -- state bring-up ---------------------------------------------------- #
    def _duals0(self, E: int, dtype=jnp.float32):
        return jax.tree_util.tree_map(
            lambda a: jnp.broadcast_to(a, (E,) + a.shape),
            init_duals(self.spec, self.cold, dtype=dtype),
        )

    def init(self, E: int, key: jax.Array) -> StreamState:
        """Draw E journeys and cold-solve them (full cold budget)."""
        kd, ks = jax.random.split(key)
        scen = self._redraw(kd, E)
        result = self._cold_solve(
            scen, initial_primal(self.spec, scen), self._duals0(E)
        )
        return StreamState(
            scen=scen, result=result, stuck=jnp.zeros((E,), jnp.int32), key=ks
        )

    # -- one cycle (pure; jit/scan-safe) ------------------------------------ #
    def cycle(self, state: StreamState) -> Tuple[StreamState, CycleStats]:
        spec, st = self.spec, self.settings
        E = state.scen.x0.shape[0]
        duals0 = self._duals0(E, dtype=state.result.primal.xs.dtype)

        # warm-start policy: the SHARED fleet-cycle body (advance on
        # convergence with executed-control feedback, continue on
        # sane-unconverged, NaN-safe fresh reset on divergence) + the
        # stream's chained rescue — see _fleet_cycle
        s, r2 = self._fleet_cycle(E, state.result.primal.xs.dtype)(
            state.scen, state.result
        )

        conv_now = r2.converged
        # retirement decisions (pre-redraw scenario is the audit record)
        dp = jnp.linalg.norm(s.xf[:, :2] - s.x0[:, :2], axis=-1)
        da = jnp.abs(
            jnp.mod(s.xf[:, 2] - s.x0[:, 2] + jnp.pi, 2 * jnp.pi) - jnp.pi
        )
        reached = jnp.logical_and(dp < st.goal_xy_tol, da < st.goal_yaw_tol)
        stuck = jnp.where(conv_now, 0, state.stuck + 1)
        retire = jnp.logical_or(reached, stuck >= st.stuck_limit)
        gave_up = jnp.logical_and(retire, jnp.logical_not(reached))
        # capture the abandoned journeys AT ABANDON TIME (x0 = stuck pose)
        abandoned_scen = where_tree(
            gave_up, s, jax.tree_util.tree_map(jnp.zeros_like, s)
        )

        key, sub = jax.random.split(state.key)
        fresh = self._redraw(sub, E)
        s = where_tree(retire, fresh, s)
        stuck = jnp.where(retire, 0, stuck)

        if st.cold_replant:
            # a REAL serving system plans a fresh goal with the cold preset
            # inside its cycle budget (the reference's IPOPT does the same
            # on goal arrival) — run the early-exit cold program on redraw
            # cycles only. lax.cond skips it entirely on the common
            # no-redraw cycle; when it runs, non-retired lanes are fed their
            # CURRENT iterate so the batched early-exit while_loop freezes
            # them after one cheap phase, and the final select returns their
            # pre-replant result bit-identically (tests pin this).
            def do_cold(args):
                s_, r_ = args
                init_c = where_tree(retire, initial_primal(spec, s_), r_.primal)
                duals_c = where_tree(retire, duals0, r_.duals)
                rc = self._cold_ee_solve(s_, init_c, duals_c)
                return where_tree(retire, rc, r_)

            r2 = jax.lax.cond(
                jnp.any(retire), do_cold, lambda args: args[1], (s, r2)
            )

        new_state = StreamState(scen=s, result=r2, stuck=stuck, key=key)
        return new_state, CycleStats(
            converged=conv_now,
            reached=reached,
            abandoned=gave_up,
            abandoned_scen=abandoned_scen,
        )

    def sample_oracle(self, state: StreamState):
        """Per-cycle (sampled) feasibility oracle (ROADMAP r4: "the serving
        oracle runs on final states only"): re-solve the CURRENT journeys
        cold at the generous budget from a fresh seed and return
        ``(feasible_mask, last_cycle_converged)`` so the caller can
        accumulate a serving-side conv_on_feasible over sampled cycles.
        Call BETWEEN timed blocks — one extra compiled dispatch each time.
        """
        E = state.scen.x0.shape[0]
        r = self._cold_solve(
            state.scen, initial_primal(self.spec, state.scen), self._duals0(E)
        )
        return r.converged, state.result.converged

    # -- offline audit ------------------------------------------------------- #
    @staticmethod
    def collect_abandoned(stats: CycleStats):
        """Host-side: flatten a block's CycleStats to the abandoned journeys'
        scenario rows (a Scenario pytree with leading axis n_abandoned)."""
        import numpy as np

        ab = np.asarray(stats.abandoned).reshape(-1)
        idx = np.nonzero(ab)[0]

        def flat(a):
            a = np.asarray(a)
            # explicit leading dim: reshape(-1, ...) cannot infer when a
            # trailing dim is 0 (empty obstacle-slot leaves)
            return a.reshape((a.shape[0] * a.shape[1],) + a.shape[2:])[idx]

        rows = jax.tree_util.tree_map(flat, stats.abandoned_scen)
        return rows, int(idx.size)

    def audit_abandoned(
        self, rows, golden: bool = False, oracle: bool = True
    ) -> dict:
        """False-abandon audit (VERDICT r4 weak #1): classify every abandoned
        journey FROM ITS ABANDON STATE instead of inferring from fresh-draw
        feasibility rates.

        ``oracle=True`` runs the generous cold-budget oracle on the captured
        scenarios; a journey the oracle solves from the stuck pose was
        abandoned while still solvable — a FALSE abandon (the stream's
        stuck_limit fired on a solver transient, not on infeasibility).
        ``golden=True`` additionally runs the float64 golden classifier
        (benchmarks.classify_feasibility; requires jax_enable_x64, runs on
        CPU) whose feasibility denominator is budget-independent. NOTE the
        f32 oracle pass must run BEFORE the caller enables x64 — the TPU
        Pallas path does not lower under x64 index types — hence the split
        flags (bench runs oracle first, then enables x64 for golden).
        Returns counts; host-side and slow — offline use.
        """
        n = int(rows.x0.shape[0])
        out = {"n_abandoned": n}
        if n == 0:
            out["false_abandon_oracle"] = 0
            return out
        scen = jax.tree_util.tree_map(jnp.asarray, rows)
        if oracle:
            r = self._cold_solve(
                scen, initial_primal(self.spec, scen), self._duals0(n)
            )
            out["false_abandon_oracle"] = int(jnp.sum(r.converged))
        if golden:
            from mpc_local_planner_tpu.benchmarks import classify_feasibility

            with jax.default_device(jax.devices("cpu")[0]):
                labels, details = classify_feasibility(
                    self.spec, scen, max_instances=n
                )
            out["false_abandon_golden"] = labels.count("feasible")
            out["golden_details"] = {
                k: v for k, v in details.items() if k != "per_instance"
            }
        return out

    # -- compiled block ------------------------------------------------------ #
    def block_fn(self, n_cycles: int):
        """jitted (state) -> (state, CycleStats stacked (n_cycles, E, ...)).

        One dispatch per block: the tunnel/host round trip amortizes over
        ``n_cycles`` and the wall time measures the on-chip cycle.
        """

        @jax.jit
        def run(state: StreamState):
            return jax.lax.scan(
                lambda st, _: self.cycle(st), state, None, length=n_cycles
            )

        return run
