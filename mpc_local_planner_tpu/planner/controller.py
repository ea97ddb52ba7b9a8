"""MPC controller: configure / step / warm-start orchestration.

Parity (file :: symbol): src/controller.cpp :: Controller
(corbo::PredictiveController subclass) — configure(), step(),
configureRobotDynamics/Grid/Solver/Ocp, generateInitialStateTrajectory,
force-reinit-on-new-goal policy, state feedback merge — and
cbr:controllers/predictive_controller.h :: PredictiveController::step.

TPU-first: the compiled artifact is one jitted batched solve per
(spec, batch shape); the Controller keeps device-resident warm-start state
(primal + duals per scenario) and re-anchors/shifts it each cycle. Solver
failures invalidate the warm start (SURVEY.md §6 failure detection).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp

from mpc_local_planner_tpu.core.so2 import angle_diff
from mpc_local_planner_tpu.core.time_series import TimeSeries, TimeSeriesSE2
from mpc_local_planner_tpu.core.tree import where_tree
from mpc_local_planner_tpu.ocp.grid import (
    Primal,
    adapt_grid_nonuniform,
    adapt_grid_size,
    initial_primal,
    primal_from_plan,
    resize_duals,
    resize_primal,
    warm_start_resample,
    warm_start_shift,
)
from mpc_local_planner_tpu.ocp.spec import Scenario
from mpc_local_planner_tpu.planner.config import PlannerConfig
from mpc_local_planner_tpu.solvers.al_sqp import (
    SolveResult,
    init_duals,
    shift_duals,
    solve_single,
)


@dataclasses.dataclass
class ControlResult:
    """Per-cycle output (parity: OptimalControlResult msg + cmd_vel twist).

    twist: (..., 3) = (vx, vy, omega) from getTwistFromControl(u0).
    """

    u0: jax.Array
    twist: jax.Array
    x_seq: TimeSeriesSE2
    u_seq: TimeSeries
    solve: SolveResult


def _singleton_vmap(fn):
    """Wrap an unbatched solve as vmap over an injected 1-lane axis.

    The rank-reduced unbatched lowering measures 2.8x SLOWER than the
    identical solve vmapped over a singleton axis on v5e (3.26 vs 1.16 ms
    warm cycle, same scenario — BENCH_NOTES r5): XLA's layout/fusion
    choices on batched shapes win even at batch 1. One helper so the
    dispatch path and the max_cycle_ms calibration probe cannot drift
    apart (they must measure the same program shape).
    """

    def run(*args):
        up = lambda t: jax.tree_util.tree_map(lambda a: a[None], t)  # noqa: E731
        out = jax.vmap(fn)(*(up(a) for a in args))
        return jax.tree_util.tree_map(lambda a: a[0], out)

    return run


class Controller:
    """Host-side orchestration around the compiled batched solve."""

    def __init__(self, config: PlannerConfig, batch: Optional[int] = None, dtype=jnp.float32):
        self.config = config
        self.spec = config.to_ocp_spec()
        # solver backend dispatch (parity: the reference's solver plugin
        # choice — ipopt vs levenberg_marquardt_dense; SURVEY §3.2)
        if config.solver.type == "al_sqp":
            self._solve_single = solve_single
        elif config.solver.type == "lsq_lm":
            from mpc_local_planner_tpu.solvers.lsq_lm import solve_single_lm

            self._solve_single = solve_single_lm
        else:
            raise ValueError(
                f"unknown solver.type {config.solver.type!r}; "
                "options: al_sqp, lsq_lm"
            )
        if config.solver.f64_fallback_slots > 0 and config.solver.type != "al_sqp":
            raise ValueError(
                "solver.f64_fallback_slots requires solver.type: al_sqp "
                "(the f64 escalation re-solves with the AL-SQP pipeline and "
                "continues from its dual structure)"
            )
        self.settings = config.solver_settings(self.spec)
        # warm-started cycles use a small iteration budget (parity: the
        # reference relies on warm starts + IPOPT iteration caps to hit the
        # control cycle; running the cold budget every cycle wastes ~20×)
        self.warm_settings = config.warm_solver_settings(self.spec)
        # max_cycle_ms calibration state (see calibrate_cycle_budget):
        # _warm_nal_cfg remembers the CONFIGURED warm cap so repeated
        # calibrations re-derive from it, not from an already-capped value
        self._phase_ms: Optional[float] = None
        self._warm_nal_cfg = self.warm_settings.n_al
        self.batch = batch          # None = unbatched single-robot mode
        self.dtype = dtype
        self._primal: Optional[Primal] = None
        self._duals = None
        self._last_goal: Optional[jax.Array] = None
        self._last_ok = None
        self._last_diverged = None
        self._stuck = None  # per-lane consecutive-failure counter (r5)
        self._steps_since_reinit = 0
        # grid adaptation (parity: grid.variable_grid.grid_adaptation.*):
        # the live spec tracks the current horizon N; each distinct N gets
        # its own cached compiled solve (host-side N ladder — SURVEY §8).
        self._spec = self.spec
        self._cache = {}
        self._f64_cache = {}  # per-N compiled f64 fallback (host-side)
        g = config.grid
        self._adapt = bool(g.grid_adaptation_enable)
        if self._adapt and batch is not None:
            raise ValueError(
                "grid_adaptation.enable is single-robot only: N is a "
                "compile-time shape shared by the whole batch, but adaptation "
                "is driven by each scenario's optimized dt"
            )
        if self._adapt and self.spec.nonuniform_dt and (
            g.grid_adaptation_mode != "redundant_controls"
        ):
            raise ValueError(
                "time-based grid_adaptation modes require grid.type: fd_grid "
                "— they steer one shared dt toward dt_ref (parity: "
                "FiniteDifferencesVariableGridSE2 is uniform-dt); for "
                "non_uniform_fd_grid use grid_adaptation.mode: "
                "redundant_controls"
            )
        if self._adapt and not self.spec.nonuniform_dt and (
            g.grid_adaptation_mode == "redundant_controls"
        ):
            raise ValueError(
                "grid_adaptation.mode: redundant_controls requires "
                "grid.type: non_uniform_fd_grid (it edits per-stage dt; "
                "parity: cbr NonUniformFiniteDifferencesVariableGrid)"
            )
        if self._adapt and not self.spec.variable_dt:
            raise ValueError(
                "grid_adaptation.enable requires variable_grid.enable: "
                "adaptation steers the optimized dt toward dt_ref by resizing "
                "N, which is meaningless with a fixed dt"
            )
        if self._adapt and not (
            g.grid_adaptation_min_grid_size
            <= self.spec.N
            <= g.grid_adaptation_max_grid_size
        ):
            raise ValueError(
                f"grid_size_ref={self.spec.N} outside grid_adaptation bounds "
                f"[{g.grid_adaptation_min_grid_size}, "
                f"{g.grid_adaptation_max_grid_size}]"
            )

    def _solver_fn(self, warm: bool):
        """Compiled batched solve for the *current* spec (cached per (N, warm))."""
        settings = self.warm_settings if warm else self.settings
        if settings == self.settings:
            warm = False  # share the cache slot when the budgets coincide
        key = (self._spec.N, warm)
        fn = self._cache.get(key)
        if fn is None:
            spec = self._spec
            solve_one = self._solve_single
            # post-solve polish launches (solver.polish_launches): al_sqp
            # warm cycles only — lsq_lm's soft-penalty iterate has no
            # switch-stage sharpening to gain, and the cold 16x15 schedule
            # already sits past the warm budget's accuracy floor (review
            # r5: polishing cold solves paid k extra launches for nothing
            # and made the cold program differ from the unpolished one)
            pol = (
                self.config.solver.polish_launches
                if solve_one is solve_single and warm
                else 0
            )
            pol_settings = self.warm_settings

            if self.batch is not None and solve_one is solve_single:
                # batched al_sqp: route through the auto wrapper so the
                # fused whole-solve Pallas kernel engages when in scope
                from mpc_local_planner_tpu.solvers.al_sqp import solve_single_auto

                base = jax.vmap(solve_single_auto(spec, settings))
                slots = min(self.config.solver.rescue_slots, self.batch)
                rescue = None
                # rescue only on warm-budget cycles (ADVICE r4): its 4x4
                # continue budget is sized for warm stragglers; chained
                # after the 16x15 cold schedule it adds little beyond a
                # compaction pass
                if slots > 0 and warm:
                    # straggler rescue (solver.rescue_slots): compact the
                    # unconverged lanes and re-solve only those with the
                    # deeper continue budget (solvers/rescue.py)
                    from mpc_local_planner_tpu.solvers.rescue import make_rescue

                    rescue = make_rescue(
                        spec, settings, slots,
                        rescue_settings=self.config.solver.rescue_settings(
                            settings
                        ),
                    )
                pol_solve = (
                    base
                    if pol == 0 or settings == pol_settings
                    else jax.vmap(solve_single_auto(spec, pol_settings))
                )

                def _solve_r(scenario, init, duals):
                    r = base(scenario, init, duals)
                    if rescue is not None:
                        r = rescue(scenario, r)
                    for _k in range(pol):
                        r2 = pol_solve(scenario, r.primal, r.duals)
                        # keep the polish only on lanes it left converged
                        # (monotone: a polish pass can never un-converge)
                        r = where_tree(r2.converged, r2, r)
                    return r

                fn = jax.jit(_solve_r)
            else:
                def _solve(scenario, init, duals):
                    r = solve_one(spec, settings, scenario, init, duals)
                    for _k in range(pol):
                        r2 = solve_one(
                            spec, pol_settings, scenario, r.primal, r.duals
                        )
                        r = where_tree(r2.converged, r2, r)
                    return r

                if self.batch is not None:
                    fn = jax.jit(jax.vmap(_solve))
                else:
                    # singleton-vmap dispatch (r5, measured 2.8x — see
                    # _singleton_vmap)
                    fn = jax.jit(_singleton_vmap(_solve))
            self._cache[key] = fn
        return fn

    def _f64_pass(self, scenario, result, fresh_seed=None):
        """Double-precision host fallback (solver.f64_fallback_slots).

        Judges convergence at the WARM tolerance (the pipeline's shipping
        tol and the headline metric's) with the cold depth as a converge-
        or-exhausted cap — so a merged ``converged`` flag means exactly
        what the flags it replaces mean.
        """
        from mpc_local_planner_tpu.solvers.f64_fallback import make_f64_fallback

        fb = self._f64_cache.get(self._spec.N)
        if fb is None:
            # depth = at least the family cold preset, regardless of how
            # shallow the configured cycle budget is (IPOPT semantics: the
            # escalation runs to convergence, not to the cycle cap; the
            # early_exit while_loop makes the depth a cap, not a cost)
            from mpc_local_planner_tpu.solvers.al_sqp import SolverSettings

            preset = SolverSettings.for_spec(self._spec)
            s = dataclasses.replace(
                preset,
                n_al=max(self.settings.n_al, preset.n_al),
                n_sqp=max(self.settings.n_sqp, preset.n_sqp),
                early_exit=True,
                tol_eq=self.warm_settings.tol_eq,
                tol_ineq=self.warm_settings.tol_ineq,
            )
            fb = make_f64_fallback(
                self._spec, s, self.config.solver.f64_fallback_slots
            )
            self._f64_cache[self._spec.N] = fb
        if self.batch is None:
            up = lambda t: jax.tree_util.tree_map(  # noqa: E731
                lambda a: a[None], t
            )
            out = fb(
                up(scenario), up(result),
                None if fresh_seed is None else up(fresh_seed),
            )
            return jax.tree_util.tree_map(lambda a: a[0], out)
        return fb(scenario, result, fresh_seed)

    def calibrate_cycle_budget(self, scenario, phase_ms: Optional[float] = None) -> float:
        """Calibrate the wall-clock cycle budget (solver.max_cycle_ms).

        Parity: `solver.ipopt.max_cpu_time` (SURVEY Appendix A). IPOPT
        checks the clock mid-solve; here the whole schedule is one compiled
        program, so the budget is enforced at AL-PHASE granularity: this
        measures the wall time of one warm AL phase (an n_al=1 warm-budget
        solve on the prototype scenario — min of 3 timed runs after a
        compile warmup) unless ``phase_ms`` is given, then caps the warm
        budget at n_al = floor(max_cycle_ms / phase_ms), at least 1 (a
        budget below one phase still runs one phase — some answer must be
        produced), combined with early_exit (converge-or-budget). Returns
        the phase_ms used. step() auto-calibrates on its first warm cycle;
        re-run when migrating hardware. Compiled warm programs are dropped
        (they bake the old schedule).
        """
        budget = self.config.solver.max_cycle_ms
        if budget <= 0:
            raise ValueError(
                "solver.max_cycle_ms is not set; nothing to calibrate"
            )
        if phase_ms is None:
            import time as _time

            one = dataclasses.replace(
                self.warm_settings, n_al=1, early_exit=False
            )
            if self.batch is not None and self._solve_single is solve_single:
                from mpc_local_planner_tpu.solvers.al_sqp import solve_single_auto

                probe = jax.jit(jax.vmap(solve_single_auto(self._spec, one)))
            else:
                solve_one = self._solve_single
                spec = self._spec
                one_solve = lambda s, i, d: solve_one(spec, one, s, i, d)  # noqa: E731
                if self.batch is not None:
                    probe = jax.jit(jax.vmap(one_solve))
                else:
                    # match the shipped singleton-vmap dispatch (the budget
                    # must be calibrated on the path the cycles actually run)
                    probe = jax.jit(_singleton_vmap(one_solve))
            init = initial_primal(self._spec, scenario)
            duals = self._fresh_duals()
            float(jnp.sum(probe(scenario, init, duals).cost))  # compile
            times = []
            for _k in range(3):
                t0 = _time.perf_counter()
                float(jnp.sum(probe(scenario, init, duals).cost))
                times.append((_time.perf_counter() - t0) * 1e3)
            phase_ms = min(times)
        self._phase_ms = float(phase_ms)
        allowed = max(1, int(budget / max(self._phase_ms, 1e-9)))
        new_nal = min(self._warm_nal_cfg, allowed)
        if new_nal != self.warm_settings.n_al:
            self.warm_settings = dataclasses.replace(
                self.warm_settings, n_al=new_nal
            )
            self._cache = {k: v for k, v in self._cache.items() if not k[1]}
        return self._phase_ms

    def _adapt_grid(self):
        """Horizon adaptation between cycles (host-side: each N dispatches
        to its own cached compiled solve, _solver_fn).

        Parity: ``mpc_local_planner/optimal_control/
        finite_differences_variable_grid_se2.h ::
        FiniteDifferencesVariableGridSE2`` time-based modes (grow/shrink N
        when the optimized dt drifts out of the hysteresis band around
        dt_ref), and ``cbr:.../non_uniform_finite_differences_variable_grid
        .h`` redundant-controls adaptation for the per-stage-dt grid; the
        warm start (primal + stage duals) is carried onto the edited grid.
        """
        g = self.config.grid
        if g.grid_adaptation_mode == "redundant_controls":
            self._primal, self._duals, new_N = adapt_grid_nonuniform(
                self._primal, self._duals,
                control_box=self._spec.control_box(),
                epsilon=g.grid_adaptation_redundant_controls_epsilon,
                dt_max=self._spec.dt_max,
                min_grid_size=g.grid_adaptation_min_grid_size,
                max_grid_size=g.grid_adaptation_max_grid_size,
            )
            if new_N != self._spec.N:
                self._spec = dataclasses.replace(self.spec, N=new_N)
            return
        new_N = adapt_grid_size(
            float(self._primal.dt),
            self._spec.N,
            dt_ref=self._spec.dt_ref,
            dt_hyst_ratio=g.grid_adaptation_dt_hyst_ratio,
            min_grid_size=g.grid_adaptation_min_grid_size,
            max_grid_size=g.grid_adaptation_max_grid_size,
            mode=g.grid_adaptation_mode,
        )
        if new_N != self._spec.N:
            self._primal = resize_primal(self._primal, new_N, spec=self._spec)
            self._duals = resize_duals(self._duals, new_N)
            self._spec = dataclasses.replace(self.spec, N=new_N)

    def reconfigure(self, updates) -> bool:
        """Retune parameters on a live controller (parity: the reference's
        dynamic_reconfigure surface on ``cfg/Controller.cfg``).

        ``updates`` is a nested YAML-style mapping merged over the current
        config (see config.reconfigure_config), or a full PlannerConfig.
        Returns True when the warm-start state survived the change: it is
        kept iff the static problem shapes (horizon, model dims, obstacle /
        via capacities, dt-variable structure) are unchanged — weight or
        tolerance tuning keeps the fleet warm; structural changes reset it.

        TPU note: every parameter is a compile-time constant of the solve
        program, so ANY update recompiles (the program cache is dropped).
        Retuning is expected at human cadence, not per control cycle.
        """
        from mpc_local_planner_tpu.planner.config import reconfigure_config

        new_cfg = (
            updates
            if isinstance(updates, PlannerConfig)
            else reconfigure_config(self.config, updates)
        )
        # snapshot warm state + the live (possibly adapted) horizon
        state = (
            self._primal, self._duals, self._last_goal,
            self._last_ok, self._last_diverged, self._steps_since_reinit,
            self._stuck,
        )
        phase_ms = self._phase_ms
        live_N, old_live = self._spec.N, self._spec

        # validate the new config on a THROWAWAY instance first: __init__
        # raises on bad combinations, and mutating self before that check
        # would leave a half-reconfigured live controller (rejected config
        # visible in self.config/spec while the solver dispatch and program
        # cache still serve the old problem)
        fresh = Controller(new_cfg, batch=self.batch, dtype=self.dtype)
        self.__dict__.update(fresh.__dict__)

        # the phase-time calibration is a HARDWARE property — it survives
        # any retune; re-derive the warm cap from the stored measurement so
        # a mid-run reconfigure doesn't silently re-run the 4-solve
        # calibration probe inside the control loop (review r5)
        if phase_ms is not None and self.config.solver.max_cycle_ms > 0:
            self.calibrate_cycle_budget(None, phase_ms=phase_ms)

        if state[0] is None:
            return False
        candidate = dataclasses.replace(self.spec, N=live_N)
        shape_keys = (
            "N", "nx", "nu", "obstacle_cap", "via_cap",
            "variable_dt", "nonuniform_dt",
        )
        same = all(
            getattr(candidate, k) == getattr(old_live, k) for k in shape_keys
        )
        ladder_ok = (not self._adapt) or (
            self.config.grid.grid_adaptation_min_grid_size
            <= live_N
            <= self.config.grid.grid_adaptation_max_grid_size
        )
        if not (same and ladder_ok and (self._adapt or live_N == self.spec.N)):
            return False
        (
            self._primal, self._duals, self._last_goal,
            self._last_ok, self._last_diverged, self._steps_since_reinit,
            stuck,
        ) = state
        # the stuck counter survives only if the feature is still enabled
        # (shapes match whenever the warm state does)
        self._stuck = (
            stuck if self.config.solver.stuck_restart_cycles > 0 else None
        )
        self._spec = candidate
        return True

    def precompile(self, scenario: Scenario, n_values=None) -> int:
        """Compile the solve programs for every horizon the grid adaptation
        can reach, ahead of the first control cycle.

        Real-time bring-up: each distinct N is its own fixed-shape XLA
        program, and a mid-run compile costs ~10²× the control-cycle budget
        — a deployment should pay all of them before the loop starts (the
        persistent compilation cache then amortizes across restarts).
        ``scenario`` is a prototype with the same pytree shapes (obstacle /
        via-point capacities, batch, dtype) the cycles will pass — shapes,
        not values, select the compiled program. Returns the number of
        cached programs afterwards.

        Parity note: the reference has no analog (IPOPT interprets the
        problem each solve); this is the TPU-native cost being paid up
        front instead of per-structure-change.
        """
        g = self.config.grid
        if n_values is None:
            if self._adapt:
                n_values = range(
                    g.grid_adaptation_min_grid_size,
                    g.grid_adaptation_max_grid_size + 1,
                )
            else:
                n_values = [self.spec.N]
        spec0, primal0, duals0 = self._spec, self._primal, self._duals
        try:
            for n in n_values:
                self._spec = dataclasses.replace(self.spec, N=int(n))
                init = initial_primal(self._spec, scenario)
                duals = self._fresh_duals()
                for warm in (False, True):
                    r = self._solver_fn(warm=warm)(scenario, init, duals)
                float(jnp.sum(r.cost))  # force through the async bridge
        finally:
            self._spec, self._primal, self._duals = spec0, primal0, duals0
        return len(self._cache)

    # -- warm-start policy ------------------------------------------------ #
    def reset(self):
        """Drop warm-start state (parity: Controller::reset on failure)."""
        self._primal = None
        self._duals = None
        self._last_goal = None
        self._last_ok = None
        self._last_diverged = None
        self._stuck = None
        self._steps_since_reinit = 0
        self._spec = self.spec

    def _fresh_duals(self):
        d = init_duals(self._spec, self.settings, dtype=self.dtype)
        if self.batch is not None:
            d = jax.tree_util.tree_map(
                lambda a: jnp.broadcast_to(a, (self.batch,) + a.shape), d
            )
        return d

    def _needs_reinit(self, goal) -> bool:
        """True when no warm state exists yet (full cold solve), or the
        periodic forced reinitialization is due (parity:
        force_reinit_num_steps — drop the warm start every K cycles to shed
        accumulated warm-start drift; 0 disables)."""
        if self._primal is None or self._last_goal is None:
            return True
        k = self.config.controller.force_reinit_num_steps
        return bool(k > 0 and self._steps_since_reinit >= k)

    def _goal_changed_mask(self, goal):
        """Per-scenario goal-change mask (parity: force_reinit_new_goal_dist /
        force_reinit_new_goal_angular). Scalar bool array when unbatched."""
        c = self.config.controller
        dp = jnp.linalg.norm(goal[..., :2] - self._last_goal[..., :2], axis=-1)
        da = jnp.abs(angle_diff(goal[..., 2], self._last_goal[..., 2]))
        return jnp.logical_or(
            dp > c.force_reinit_new_goal_dist, da > c.force_reinit_new_goal_angular
        )

    # -- the control cycle ------------------------------------------------ #
    def step(
        self,
        scenario: Scenario,
        plan: Optional[jax.Array] = None,
        shift_steps=1,  # int, or per-lane int array in batched mode
        elapsed: Optional[float] = None,
    ) -> ControlResult:
        """One MPC cycle: warm start → solve → extract first control.

        scenario: current x0/goal/obstacles/via points (batched iff
        ``batch`` was given). plan: optional (..., P, 3) transformed global
        plan used to seed the grid on (re)initialization (parity:
        generateInitialStateTrajectory). elapsed: wall time since the last
        cycle — the warm-start shift becomes round(elapsed / dt) stages
        (parity: the reference shifts its grid by the elapsed interval; with
        variable-dt min-time grids dt* can be much smaller than the control
        period, so a fixed 1-stage shift would lag). In batched mode the
        shift count is computed PER LANE from that lane's own optimized dt
        (the same wall-clock interval covers a different number of stages on
        a lane racing at dt_min than on one cruising at dt_ref) and applied
        with the dynamic take_along_axis warm-start/dual-shift paths.
        """
        if elapsed is not None and self._primal is not None:
            if self.batch is None:
                dt_prev = float(jnp.mean(self._primal.dt))  # mean over per-stage dt
                shift_steps = int(
                    min(max(round(elapsed / max(dt_prev, 1e-6)), 1), self._spec.N // 2)
                )
            else:
                dt_prev = self._primal.dt
                if self._spec.nonuniform_dt:
                    dt_prev = jnp.mean(dt_prev, axis=-1)
                shift_steps = jnp.clip(
                    jnp.round(elapsed / jnp.maximum(dt_prev, 1e-6)).astype(jnp.int32),
                    1,
                    self._spec.N // 2,
                )
        # pad under-provisioned obstacle/via slots up to the spec's static
        # capacities (reference parity: containers hold up to capacity —
        # e.g. Scenario.goal_only under an obstacle-enabled config would
        # otherwise shape-mismatch the compiled solve); over-capacity raises
        if scenario.obstacles.total_slots() != self._spec.obstacle_cap:
            scenario = dataclasses.replace(
                scenario,
                obstacles=scenario.obstacles.padded_to(self._spec.obstacle_cap),
            )
        if scenario.via_points.shape[-2] != self._spec.via_cap:
            have = scenario.via_points.shape[-2]
            if have > self._spec.via_cap:
                raise ValueError(
                    f"scenario has {have} via slots but the spec's via_cap "
                    f"is {self._spec.via_cap}"
                )
            batch = scenario.via_points.shape[:-2]
            extra = self._spec.via_cap - have
            scenario = dataclasses.replace(
                scenario,
                via_points=jnp.concatenate(
                    [
                        scenario.via_points,
                        jnp.zeros(
                            batch + (extra, 3), scenario.via_points.dtype
                        ),
                    ],
                    axis=-2,
                ),
                via_mask=jnp.concatenate(
                    [scenario.via_mask, jnp.zeros(batch + (extra,), bool)],
                    axis=-1,
                ),
            )
        goal = scenario.xf
        cold = self._needs_reinit(goal)
        if cold:
            self._spec = self.spec  # grid re-initializes at grid_size_ref
            if plan is not None and self.config.grid.warm_start:
                init = primal_from_plan(self._spec, plan, scenario.x0)
            else:
                init = initial_primal(self._spec, scenario)
            fresh_seed = init  # the f64 tier's diverged-lane restart seed
            duals = self._fresh_duals()
        else:
            if self._adapt:
                self._adapt_grid()
            # warm-start policy (validated in benchmarks): converged
            # scenarios advance (resample for shrinking-horizon min-time,
            # shift otherwise) with stage-shifted duals; unconverged-but-sane
            # ones CONTINUE from their current iterate (iterations accumulate
            # across cycles); diverged ones — and scenarios whose goal moved
            # beyond the force-reinit thresholds — reset fresh (per scenario).
            changed = self._goal_changed_mask(goal)
            ok = jnp.logical_and(self._last_ok, ~changed)
            diverged = jnp.logical_or(self._last_diverged, changed)
            # per-lane recovery replan (solver.stuck_restart_cycles, r5):
            # lanes unconverged S consecutive cycles drop their warm state
            # and restart from the fresh (plan-seeded when available) init
            # — the move_base recovery-behavior analog; basin-trapped
            # stragglers in cluttered worlds never escape by continuing
            S = self.config.solver.stuck_restart_cycles
            if S > 0 and self._stuck is not None:
                diverged = jnp.logical_or(diverged, self._stuck >= S)
            if self._spec.min_time and self._spec.variable_dt:
                advanced = warm_start_resample(
                    self._primal, scenario.x0, steps=shift_steps, spec=self._spec
                )
            else:
                advanced = warm_start_shift(
                    self._primal, scenario.x0, steps=shift_steps, spec=self._spec
                )
            adv_duals = shift_duals(self._duals, self.settings, steps=shift_steps)
            init = where_tree(ok, advanced, self._primal)
            duals = where_tree(ok, adv_duals, self._duals)
            # per-lane resets seed from the plan when one is given (the
            # restart IS the recovery replan; a straight line through the
            # obstacle field would re-trap the lane)
            if plan is not None and self.config.grid.warm_start:
                fresh_p = primal_from_plan(self._spec, plan, scenario.x0)
            else:
                fresh_p = initial_primal(self._spec, scenario)
            init = where_tree(diverged, fresh_p, init)
            fresh_seed = fresh_p  # plan-seeded when a plan was given
            duals = where_tree(diverged, self._fresh_duals(), duals)
            # re-anchor stage 0 to the measured state on EVERY lane: the
            # solver treats x_0 as fixed data, and the continue branch would
            # otherwise keep iterating (and command controls) from last
            # cycle's start state while the robot has moved on (parity: the
            # reference grid re-pins its first vertex to x0 each cycle)
            init = dataclasses.replace(
                init, xs=init.xs.at[..., 0, :].set(scenario.x0)
            )

        if (
            not cold
            and self.config.solver.max_cycle_ms > 0
            and self._phase_ms is None
        ):
            # first warm cycle under a wall-clock budget: measure one AL
            # phase and cap the warm schedule (bring-up cost, paid once —
            # deployments that precompile should call calibrate_cycle_budget
            # explicitly there instead)
            self.calibrate_cycle_budget(scenario)

        result = self._solver_fn(warm=not cold)(scenario, init, duals)
        if self.config.solver.f64_fallback_slots > 0:
            # IPOPT-parity escalation tier (solvers/f64_fallback.py): lanes
            # the f32 pipeline (+ rescue) left unconverged re-solve in f64
            # on the host CPU; applied BEFORE the warm-state update so the
            # rescued iterates seed the next cycle
            result = self._f64_pass(scenario, result, fresh_seed)

        self._steps_since_reinit = 0 if cold else self._steps_since_reinit + 1
        if self.config.solver.stuck_restart_cycles > 0:
            if cold or self._stuck is None:
                self._stuck = jnp.zeros(result.converged.shape, jnp.int32)
            else:
                # restarted lanes get a fresh patience window regardless of
                # this cycle's outcome (their iterate was rebased)
                self._stuck = jnp.where(
                    jnp.logical_or(result.converged, diverged),
                    0,
                    self._stuck + 1,
                )
        self._primal, self._duals = result.primal, result.duals
        self._last_ok = result.converged
        # NaN-safe: eq_norm can be NaN on a blown-up lane, and `NaN > 0.5`
        # is False — written as NOT(both-small) so non-finite lanes reset
        # next cycle instead of continuing from garbage (r4 fix)
        self._last_diverged = jnp.logical_not(
            jnp.logical_and(result.eq_norm <= 0.5, result.ineq_viol <= 0.5)
        )
        self._last_goal = goal

        u0 = result.primal.us[..., 0, :]
        # saturate the commanded control to the box (post-solve safety clamp;
        # AL leaves O(tol) violations)
        lo, hi = self.spec.control_box()
        u0 = jnp.clip(u0, jnp.asarray(lo, u0.dtype), jnp.asarray(hi, u0.dtype))
        twist = self.spec.model.twist_from_control(result.primal.xs[..., 0, :], u0)

        dt = result.primal.dt
        if self._spec.nonuniform_dt:
            # per-stage dt: stage times are the cumulative sum t_0 = 0, Σ dt_k
            zero = jnp.zeros_like(dt[..., :1])
            times = jnp.concatenate([zero, jnp.cumsum(dt, axis=-1)], axis=-1)
        else:
            times = jnp.arange(self._spec.N + 1, dtype=u0.dtype) * dt[..., None]
        x_seq = TimeSeriesSE2(times=times, values=result.primal.xs)
        u_seq = TimeSeries(times=times[..., :-1], values=result.primal.us)
        return ControlResult(u0=u0, twist=twist, x_seq=x_seq, u_seq=u_seq, solve=result)

    # -- goal test -------------------------------------------------------- #
    def is_goal_reached(self, x, goal) -> bool:
        """Parity: MpcLocalPlannerROS::isGoalReached (xy + yaw tolerances)."""
        c = self.config.controller
        dp = jnp.linalg.norm(goal[..., :2] - x[..., :2], axis=-1)
        da = jnp.abs(angle_diff(goal[..., 2], x[..., 2]))
        return bool(jnp.all(dp < c.xy_goal_tolerance) and jnp.all(da < c.yaw_goal_tolerance))
