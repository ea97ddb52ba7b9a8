"""Pallas TPU mega-kernel: one ENTIRE warm AL-SQP solve per kernel launch.

Why. The XLA warm cycle (solvers/al_sqp.solve_single, 2x3 budget, batch
4096) measures ~43 ms while its intrinsic data is tiny: XLA's own cost
model reports 8.1 GB touched per cycle for 0.8 GFLOP (flops/byte = 0.1),
i.e. every one of the hundreds of small elementwise/assembly ops
round-trips (B, N, ~8)-shaped tensors through HBM with (8,128)-tile
padding on their tiny minor dims. The per-solve state, however, is ~4 KB
(trajectory + duals + obstacle field) — it fits in VMEM many times over.
This kernel keeps the WHOLE solve on-chip: HBM traffic is one read of the
scenario/warm state and one write of the result per solve; everything else
(defect linearization, AL gradients/Hessians, the Riccati sweeps, the
9-candidate line search, dual updates, the best-feasible snapshot) happens
in VMEM. Structural zeros of the augmented-state blocks are elided at
trace time (Python-constant folding in the tiny-matrix helpers), which is
the "structured-sparsity KKT" design point for free.

Layout (same as ops/riccati_pallas.py): scenario batch in the minor
(sublane x lane) dims — every per-scenario scalar is an (S, 128) tile and
all small-matrix algebra is fully unrolled elementwise VPU code over the
batch. The MXU is useless for 3x3/6x6 blocks; the VPU at 8x128/cycle is
exactly the right unit (SURVEY.md §8 hard part #2).

Semantics: bit-for-bit the math of solvers/al_sqp._solve_single_impl
(same merit, same hybrid exact/Gauss-Newton stage Hessians, same
line-search ladder + alpha=0 candidate, same NaN quarantine, dt trust
region, regularization policy, dual update with conditional rho growth,
and the best-feasible-snapshot carry), specialized to the guard-checked
scope below and with closed-form derivatives replacing AD (they are
hand-derived for this scope and tested against the AD path in
tests/test_fused_solver.py).

Scope (``fused_supported(spec)``): every grid the solver supports —
fixed dt, shared variable dt, and the NON-UNIFORM per-stage-dt grid
(each δdt_k an extra control column; 3x3 Quu closed-form inverse,
per-interval dt boxes as stage inequalities, cumulative prediction
times); all three FD collocation rules (forward/midpoint/Crank-Nicolson)
plus multiple-shooting grids (every explicit integrator euler..rk5, ≤4
substeps, via a generic tableau-walking hand forward-mode); minimum_time,
quadratic_form, or minimum_time_via_points
objective (incl. integral form, left-sum/trapezoidal integration, hybrid
min-time weight, optional terminal quadratic cost, optional terminal
ball, via-point attraction with ordered/unordered stage assignment), all
four robot models (unicycle, simple_car rear/front-wheel drive, kinematic
bicycle), ALL five footprints (point/circular/two_circles/line/polygon —
polygon bounded at 8 vertices), point/circle/line/polygon obstacle slots
(static or dynamic — constant-velocity prediction at the solve's initial
dt, hoisted per-cycle exactly like al_sqp._stage_obstacles). The XLA
path remains only as the exact-match fallback beyond the bounded guards
(polygon footprints >8 vertices, obstacle polygons >16 padded vertices,
shooting >4 substeps, budgets >16 iterations) and for non-TPU backends. Parity anchor: BASELINE configs #1-#4 plus the canonical
carlike two_circles config (examples/cfg/carlike_minimum_time.yaml).

The obstacle geometry hand-transcribes the AD chain of
geometry/{distances,footprints}.py including JAX's subgradient
conventions: jnp.minimum/clip ties give 0.5 weights, jnp.min reductions
split equally among ties, and where()-selected constant branches
(segment intersection, inside-polygon zeroing) carry zero gradient.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mpc_local_planner_tpu.geometry.footprints import (
    CircularFootprint,
    LineFootprint,
    PointFootprint,
    PolygonFootprint,
    TwoCirclesFootprint,
)
from mpc_local_planner_tpu.systems.models import (
    KinematicBicycleModelVelocityInput,
    SimpleCarFrontWheelDrivingModel,
    SimpleCarModel,
    UnicycleModel,
)

import os as _os

# Batch-tile geometry: each kernel program solves SUBLANES*LANES scenarios,
# every per-scenario scalar an (SUBLANES, 128) vreg tile. Native vregs are
# (8, 128): the round-3 occupancy sweep measured the warm flagship cycle at
# 8.73 ms (SUBLANES=2) -> 6.10 ms (4) -> 5.87 ms (8) on v5e — the kernel was
# sublane-occupancy-bound, so 8 is the default. The env knob remains for
# sweeps; tests/conftest pins 2 because interpret mode pays the full padded
# (SUBLANES*128) batch on CPU.
SUBLANES = int(_os.environ.get("MPC_FUSED_SUBLANES", "8"))
# MECHANISM PROBE, not a solver mode (r5, VERDICT r4 missing #4): with
# MPC_FUSED_CHAINBREAK=1 the backward Riccati sweep reads the TERMINAL
# (P_N, p_N) at every stage instead of the loop-carried value — the same
# instruction mix minus the cross-stage dependency chain (results are WRONG;
# never set outside timing probes). Decides the in-kernel horizon-parallel
# (associative-scan) sweep question: if breaking the dependency does not
# speed the kernel up, the sweep is ISSUE-bound, the chain latency is
# already hidden behind the streamed derivative assembly, and a pscan
# variant (~4x the backward-sweep op count for its 6x6 composition algebra:
# per-compose one 6x6 solve + ~6 6x6 matmuls vs the sequential step's ~5
# matmuls + 2x2 inverse, times N·ceil(log2 N)/2 compositions vs N steps)
# strictly loses. See BENCH_NOTES r5.
CHAINBREAK = int(_os.environ.get("MPC_FUSED_CHAINBREAK", "0"))
LANES = 128
BT = SUBLANES * LANES
_BIG = 1.0e6          # geometry.obstacles.BIG_DISTANCE
_EPS = 1e-12          # geometry.distances._EPS (safe norm)
_TWO_PI = 2.0 * math.pi
_F32_MAX = float(jnp.finfo(jnp.float32).max)


def fused_supported(spec) -> bool:
    """True when the fused kernel implements this spec's exact semantics."""
    colloc_ok = spec.collocation in (
        "forward_differences",
        "midpoint_differences",
        "crank_nicolson_differences",
    )
    if spec.collocation.startswith("shooting_"):
        from mpc_local_planner_tpu.ocp.collocation import _parse_shooting

        integ, substeps = _parse_shooting(spec.collocation)
        # every explicit integrator has a kernel tableau; bound the unrolled
        # per-stage chain BOTH by substeps (<=4, the r3 envelope the
        # equivalence tests cover) AND by total dynamics-eval count
        # (stages x substeps <= 28: rk5 6x4=24, rk6 7x4=28, rk7 11x2=22 —
        # review r4: the eval bound alone silently admitted untested
        # high-substep/low-stage configs like shooting_euler_20)
        colloc_ok = (
            integ in _RK_TABLEAUS
            and substeps <= 4
            and len(_RK_TABLEAUS[integ][1]) * substeps <= 28
        )
    return (
        colloc_ok
        and spec.objective
        in ("minimum_time", "quadratic_form", "minimum_time_via_points")
        # via_sweep unrolls one (N+1)-stage pass per slot per candidate —
        # bound it like the other program-size guards
        and spec.via_cap <= 8
        and spec.nu == 2
        and type(spec.model)
        in (
            UnicycleModel,
            SimpleCarModel,
            SimpleCarFrontWheelDrivingModel,
            KinematicBicycleModelVelocityInput,
        )
        and (
            isinstance(
                spec.footprint,
                (PointFootprint, CircularFootprint, TwoCirclesFootprint,
                 LineFootprint),
            )
            or (
                isinstance(spec.footprint, PolygonFootprint)
                # bounded: the kernel unrolls one moving-edge distance per
                # footprint vertex per obstacle slot
                and len(tuple(spec.footprint.vertices)) <= 8
            )
        )
    )


def _footprint_static(footprint):
    """Static kernel descriptor of a footprint model.

    Circle-family footprints (point/circular/two_circles) become a tuple of
    (body-x offset, radius) discs; the line footprint becomes its body-frame
    segment endpoints. Mirrors geometry/footprints.py's distance semantics.
    """
    import numpy as np

    if isinstance(footprint, PointFootprint):
        return ((0.0, 0.0),), None, None
    if isinstance(footprint, CircularFootprint):
        return ((0.0, float(footprint.radius)),), None, None
    if isinstance(footprint, TwoCirclesFootprint):
        return (
            (float(footprint.front_offset), float(footprint.front_radius)),
            (float(footprint.rear_offset), float(footprint.rear_radius)),
        ), None, None
    if isinstance(footprint, LineFootprint):
        ls = np.asarray(footprint.line_start, dtype=np.float64)
        le = np.asarray(footprint.line_end, dtype=np.float64)
        return None, (
            (float(ls[0]), float(ls[1])),
            (float(le[0]), float(le[1])),
        ), None
    if isinstance(footprint, PolygonFootprint):
        verts = np.asarray(footprint.vertices, dtype=np.float64)
        return None, None, tuple(
            (float(v[0]), float(v[1])) for v in verts
        )
    raise ValueError(f"footprint not kernel-supported: {footprint!r}")


# --------------------------------------------------------------------------- #
# tiny-matrix helpers over lists of (S, L) tiles with Python-constant folding
# --------------------------------------------------------------------------- #
def _isc(x):
    return isinstance(x, (int, float))


def _mul(a, b):
    if _isc(a) and a == 0.0:
        return 0.0
    if _isc(b) and b == 0.0:
        return 0.0
    if _isc(a) and a == 1.0:
        return b
    if _isc(b) and b == 1.0:
        return a
    return a * b


def _add(a, b):
    if _isc(a) and a == 0.0:
        return b
    if _isc(b) and b == 0.0:
        return a
    return a + b


def _dotl(xs, ys):
    acc = 0.0
    for x, y in zip(xs, ys):
        acc = _add(acc, _mul(x, y))
    return acc


def _mat_mul(A, B):
    n, k, m = len(A), len(B), len(B[0])
    return [
        [_dotl(A[i], [B[l][j] for l in range(k)]) for j in range(m)]
        for i in range(n)
    ]


def _mat_T(A):
    return [[A[i][j] for i in range(len(A))] for j in range(len(A[0]))]


def _wrap(th):
    return jnp.mod(th + math.pi, _TWO_PI) - math.pi


# Butcher tableaus of numerics/integrators.py's explicit integrators
# (a-matrix rows for stages 2..S, b weights). The kernel walks these with a
# hand forward-mode (value + 3x6 tangent) — one mechanism for every
# shooting integrator instead of per-integrator derivative algebra. Single
# source of truth lives in numerics/integrators.py (RK_TABLEAUS) so rk6/rk7
# added there are automatically in kernel scope.
from mpc_local_planner_tpu.numerics.integrators import RK_TABLEAUS as _RK_TABLEAUS


# --------------------------------------------------------------------------- #
# the kernel
# --------------------------------------------------------------------------- #
def _fused_kernel(
    *refs,
    N: int, M: int, mpc: int, ml: int, mg: int, V: int, mv: int,
    model: str, colloc: str, wheelbase: float, bike_lf: float,
    bike_lr: float, dynamic: bool, nonu: bool, dt_prox: float,
    via_pw: float, via_ow: float, via_ordered: bool,
    fp_circles, fp_seg, fp_poly,
    lo_u, hi_u, lo_r, hi_r, min_dist: float,
    xf_fixed, variable_dt: bool, dt_min: float, dt_max: float, dt_ref: float,
    qf, objective: str, q_diag, r_diag, integral_form: bool,
    trapezoidal: bool, hybrid_w: float, ball_w, ball_r: float,
    n_al: int, n_sqp: int, alphas, dt_trust_frac: float,
    rho0: float, rho_growth: float, rho_max: float,
    reg0: float, reg_shrink: float, reg_grow: float, reg_min: float, reg_max: float,
    viol_decrease_req: float, tol_eq: float, tol_ineq: float,
    debug_step: bool = False,
):
    """One whole warm solve per (S*L)-scenario batch group.

    ``refs`` is the pallas_call positional layout: the 5 base inputs, the
    obstacle-family inputs present for this spec (point+circle slots ``mpc``:
    centers/radii/mask/vels; line slots ``ml``: endpoints/mask/vels; polygon
    slots ``mg``: padded verts (V per slot)/nv/mask/vels — mu-row order is
    [pc, lines, polygons], matching footprints.distances' concat), the 8
    warm-dual inputs, the 15 outputs, then the 9 scratch buffers.

    scal layout (per-lane scalar registers, shape (SC, S, L)):
      0 dt, 1 rho, 2 best_dt, 3 best_eq, 4 best_in, 5 best_found,
      6 viol_prev, 7 dtau, 8 eq_last, 9 in_last
    """
    f32 = jnp.float32
    zero = jnp.zeros((SUBLANES, LANES), f32)
    one = zero + 1.0

    shoot_integ, shoot_substeps = None, 1
    if colloc.startswith("shooting_"):
        from mpc_local_planner_tpu.ocp.collocation import _parse_shooting

        shoot_integ, shoot_substeps = _parse_shooting(colloc)

    # ---- unpack the positional ref layout --------------------------------- #
    it = iter(refs)
    xs_i, us_i, dt_i, xf, u_prev = (next(it) for _ in range(5))
    oc = orr = om = ov = None
    ln = lm = lvl = None
    pg = pnv = pgm = pgv = None
    if mpc:
        oc, orr, om, ov = (next(it) for _ in range(4))
    if ml:
        ln, lm, lvl = (next(it) for _ in range(3))
    if mg:
        pg, pnv, pgm, pgv = (next(it) for _ in range(4))
    vp = vm = None
    if mv:
        vp, vm = (next(it) for _ in range(2))
    (ld_i, lt_i, mo_i, mr_i, mb_i, md_i, mball_i, rho_i,
     xs_o, us_o, dt_o, ld_o, lt_o, mo_o, mr_o, mb_o, md_o, mball_o, rho_o,
     cost_o, eq_o, in_o, cv_o,
     P, pv, Ks, kffs, dxs, dus, bxs, bus, scal) = (next(it) for _ in range(32))
    vks = next(it) if mv else None
    dts = bdts = dtaus = tv = None
    if nonu:
        dts, bdts, dtaus, tv = (next(it) for _ in range(4))

    # ---- state init: copy inputs into the output refs (working state) ---- #
    def _cp(t, _):
        for i in range(3):
            xs_o[t, i, 0] = xs_i[t, i, 0]
            ld_o[t % N, i, 0] = ld_i[t % N, i, 0]
        for i in range(2):
            us_o[t % N, i, 0] = us_i[t % N, i, 0]
        for i in range(M):
            mo_o[t % N, i, 0] = mo_i[t % N, i, 0]
        for i in range(4):
            mr_o[t % N, i, 0] = mr_i[t % N, i, 0]
            mb_o[t % N, i, 0] = mb_i[t % N, i, 0]
        return ()

    jax.lax.fori_loop(0, N + 1, _cp, ())
    for i in range(3):
        lt_o[i, 0] = lt_i[i, 0]
    if nonu:
        def _cpmd(k, _):
            md_o[k, 0, 0] = md_i[k, 0, 0]
            md_o[k, 1, 0] = md_i[k, 1, 0]
            return ()

        jax.lax.fori_loop(0, N, _cpmd, ())
    else:
        for i in range(2):
            md_o[i, 0] = md_i[i, 0]
    mball_o[0, 0] = mball_i[0, 0]
    if nonu:
        # per-stage dt working state + hoisted pose prediction times
        # t_i = sum_{j<i} dt_j (al_sqp._stage_obstacles nonuniform cumsum,
        # stop-gradient initial dt)
        def _cpdt(k, t):
            dts[k] = dt_i[k, 0]
            tv[k] = t
            return t + dt_i[k, 0]

        tN = jax.lax.fori_loop(0, N, _cpdt, zero)
        tv[N] = tN
        scal[0] = dt_i[0, 0]  # unused on the non-uniform path
    else:
        scal[0] = dt_i[0, 0]
    scal[1] = rho_i[0, 0]
    scal[2] = dt_i[0, 0]
    scal[3] = zero + _F32_MAX
    scal[4] = zero + _F32_MAX
    scal[5] = zero
    scal[6] = zero + _F32_MAX

    dt_lo = max(dt_min, 1.0e-3) if variable_dt else dt_ref
    dt_hi = dt_max if variable_dt else dt_ref

    # ---- closed-form model pieces ---------------------------------------- #
    def dyn(x, u):
        """f(x, u) and the Jacobians Jx (3x3, structured), Ju (3x2)."""
        v = u[0]
        if model == "unicycle":
            c, s = jnp.cos(x[2]), jnp.sin(x[2])
            f = [v * c, v * s, u[1]]
            Jx = [[0.0, 0.0, -v * s], [0.0, 0.0, v * c], [0.0, 0.0, 0.0]]
            Ju = [[c, 0.0], [s, 0.0], [0.0, 1.0]]
        elif model == "simple_car":  # rear-wheel drive
            c, s = jnp.cos(x[2]), jnp.sin(x[2])
            t = jnp.tan(u[1])
            f = [v * c, v * s, v * t / wheelbase]
            Jx = [[0.0, 0.0, -v * s], [0.0, 0.0, v * c], [0.0, 0.0, 0.0]]
            Ju = [
                [c, 0.0],
                [s, 0.0],
                [t / wheelbase, v * (1.0 + t * t) / wheelbase],
            ]
        elif model == "front_wheel":
            # systems/models.py :: SimpleCarFrontWheelDrivingModel —
            # longitudinal speed scales by cos(phi)
            c, s = jnp.cos(x[2]), jnp.sin(x[2])
            cp, sp = jnp.cos(u[1]), jnp.sin(u[1])
            vl = v * cp
            f = [vl * c, vl * s, v * sp / wheelbase]
            Jx = [[0.0, 0.0, -vl * s], [0.0, 0.0, vl * c], [0.0, 0.0, 0.0]]
            Ju = [
                [cp * c, -v * sp * c],
                [cp * s, -v * sp * s],
                [sp / wheelbase, v * cp / wheelbase],
            ]
        else:  # kinematic bicycle (velocity input)
            # systems/models.py :: KinematicBicycleModelVelocityInput —
            # beta = atan(lr tan(delta) / (lf + lr));
            # dbeta/ddelta = a(1+t^2)/(1+(a t)^2) with a = lr/(lf+lr)
            a = bike_lr / (bike_lf + bike_lr)
            t = jnp.tan(u[1])
            at = a * t
            beta = jnp.arctan(at)
            dbeta = a * (1.0 + t * t) / (1.0 + at * at)
            cb, sb = jnp.cos(x[2] + beta), jnp.sin(x[2] + beta)
            sbe, cbe = jnp.sin(beta), jnp.cos(beta)
            f = [v * cb, v * sb, v * sbe / bike_lr]
            Jx = [[0.0, 0.0, -v * sb], [0.0, 0.0, v * cb], [0.0, 0.0, 0.0]]
            Ju = [
                [cb, -v * sb * dbeta],
                [sb, v * cb * dbeta],
                [sbe / bike_lr, v * cbe * dbeta / bike_lr],
            ]
        return f, Jx, Ju

    def read_x(k):
        return [xs_o[k, i, 0] for i in range(3)]

    def read_u(k):
        return [us_o[k, i, 0] for i in range(2)]

    def read_uprev(k):
        """u_{k-1} with u_{-1} = scenario.u_prev."""
        km1 = jnp.maximum(k - 1, 0)
        return [
            jnp.where(k == 0, u_prev[i, 0], us_o[km1, i, 0]) for i in range(2)
        ]

    def _dyn_jvp(xv, Xt, uk):
        """f(x, u) value + pushforward of the 3x6 tangent Xt = ∂x/∂w,
        w = [x0 (3), u (2), dtau (1)] — hand forward-mode matching jacfwd.
        The models' Jx has only a θ column, so the Jx·Xt product reduces to
        one row-2 broadcast; Ju adds into the u columns."""
        f, Jx, Ju = dyn(xv, uk)
        Ft = [[0.0] * 6 for _ in range(3)]
        for i in range(2):  # Jx rows 0,1 have only the θ entry; row 2 is 0
            for j in range(6):
                Ft[i][j] = _mul(Jx[i][2], Xt[2][j])
        for i in range(3):
            for j in range(2):
                Ft[i][3 + j] = _add(Ft[i][3 + j], Ju[i][j])
        return f, Ft

    def _axpy_jvp(xv, Xt, c, hv, dh, kv, Kt):
        """(x + c·h·k) with tangents: h carries ∂h/∂dtau = dh in col 5."""
        nv = [_add(xv[i], _mul(c, _mul(hv, kv[i]))) for i in range(3)]
        Nt = [
            [
                _add(
                    Xt[i][j],
                    _mul(
                        c,
                        _add(
                            _mul(hv, Kt[i][j]),
                            _mul(dh, kv[i]) if j == 5 else 0.0,
                        ),
                    ),
                )
                for j in range(6)
            ]
            for i in range(3)
        ]
        return nv, Nt

    def _shoot_phi(xk, uk, dtv):
        """Explicit-RK shooting prediction Φ(x_k, u_k, dt) + full tangent
        (collocation._shooting_pred semantics: ZOH control, dt/substeps
        fixed step, tableau from _RK_TABLEAUS)."""
        a_rows, b = _RK_TABLEAUS[shoot_integ]
        hv = dtv / shoot_substeps if shoot_substeps > 1 else dtv
        dh = 1.0 / shoot_substeps
        xv = list(xk)
        Xt = [[1.0 if i == j else 0.0 for j in range(6)] for i in range(3)]
        for _sub in range(shoot_substeps):
            ks = []
            kv, Kt = _dyn_jvp(xv, Xt, uk)
            ks.append((kv, Kt))
            for row in a_rows:
                yv, Yt = xv, Xt
                for c, (kv_j, Kt_j) in zip(row, ks):
                    if c != 0.0:
                        yv, Yt = _axpy_jvp(yv, Yt, c, hv, dh, kv_j, Kt_j)
                kv, Kt = _dyn_jvp(yv, Yt, uk)
                ks.append((kv, Kt))
            for c, (kv_j, Kt_j) in zip(b, ks):
                if c != 0.0:
                    xv, Xt = _axpy_jvp(xv, Xt, c, hv, dh, kv_j, Kt_j)
        return xv, Xt

    def defect(xk, uk, xk1, dtv):
        """Collocation defect + linearization in transition form
        (deltas: dx1 = F dx + G du + m ddt + r; c is the raw merit/dual
        residual — for non-forward methods r = −E⁻¹c ≠ c).

        forward:  c = wrap(xk + dt f(xk,u) − xk1); E = −I → F = I + dt Jx,
                  G = dt Ju, m = f, r = c.
        midpoint: f at the SE(2) midpoint (collocation._phi_midpoint);
                  A = I + (dt/2)Jx(xm), E = −I + (dt/2)Jx(xm).
        CN:       f = ½(f(xk,u) + f(xk1,u)); A = I + (dt/2)Jx(xk),
                  E = −I + (dt/2)Jx(xk1), B = (dt/2)(Ju(xk)+Ju(xk1)).
        All four models have Jx = [[0,0,a],[0,0,b],[0,0,0]], so
        E = [[-1,0,P],[0,-1,Q],[0,0,-1]] and −E⁻¹ = [[1,0,P],[0,1,Q],[0,0,1]]
        in closed form (the XLA path computes inv3(E) — algebraically the
        same, matched by the equivalence tests).
        """
        if colloc.startswith("shooting_"):
            # multiple shooting: c = Φ(x_k, u_k, dt) ⊖ x_{k+1}; E = −I
            # exactly (Φ is x_{k+1}-independent), so the transition form is
            # the tangent itself: F = ∂Φ/∂x, G = ∂Φ/∂u, m = ∂Φ/∂dt, r = c.
            xv, Xt = _shoot_phi(xk, uk, dtv)
            c = [
                xv[0] - xk1[0],
                xv[1] - xk1[1],
                _wrap(xv[2] - xk1[2]),
            ]
            F = [[Xt[i][j] for j in range(3)] for i in range(3)]
            G = [[Xt[i][3 + j] for j in range(2)] for i in range(3)]
            m = [Xt[i][5] for i in range(3)]
            return c, F, G, m, c
        if colloc == "forward_differences":
            f, Jx, Ju = dyn(xk, uk)
            c = [
                xk[0] + dtv * f[0] - xk1[0],
                xk[1] + dtv * f[1] - xk1[1],
                _wrap(xk[2] + dtv * f[2] - xk1[2]),
            ]
            F = [
                [
                    _add(1.0 if i == j else 0.0, _mul(dtv, Jx[i][j]))
                    for j in range(3)
                ]
                for i in range(3)
            ]
            G = [[_mul(dtv, Ju[i][j]) for j in range(2)] for i in range(3)]
            return c, F, G, f, c
        if colloc == "midpoint_differences":
            xm = [
                0.5 * (xk[0] + xk1[0]),
                0.5 * (xk[1] + xk1[1]),
                _wrap(xk[2] + 0.5 * _wrap(xk1[2] - xk[2])),
            ]
            f, Jx, Ju = dyn(xm, uk)
            a02, a12 = Jx[0][2], Jx[1][2]      # A's θ column (at xm)
            e02, e12 = Jx[0][2], Jx[1][2]      # E's θ column (same point)
            Bu = Ju
        else:  # crank_nicolson_differences
            fa, Jxa, Jua = dyn(xk, uk)
            fb, Jxb, Jub = dyn(xk1, uk)
            f = [0.5 * (fa[i] + fb[i]) for i in range(3)]
            a02, a12 = Jxa[0][2], Jxa[1][2]
            e02, e12 = Jxb[0][2], Jxb[1][2]
            Bu = [
                [_mul(0.5, _add(Jua[i][j], Jub[i][j])) for j in range(2)]
                for i in range(3)
            ]
        c = [
            xk[0] + dtv * f[0] - xk1[0],
            xk[1] + dtv * f[1] - xk1[1],
            _wrap(xk[2] + dtv * f[2] - xk1[2]),
        ]
        hdt = 0.5 * dtv
        P = _mul(hdt, e02)
        Q = _mul(hdt, e12)
        F = [
            [1.0, 0.0, _add(_mul(hdt, a02), P)],
            [0.0, 1.0, _add(_mul(hdt, a12), Q)],
            [0.0, 0.0, 1.0],
        ]
        Bd = [[_mul(dtv, Bu[i][j]) for j in range(2)] for i in range(3)]
        G = [
            [_add(Bd[0][j], _mul(P, Bd[2][j])) for j in range(2)],
            [_add(Bd[1][j], _mul(Q, Bd[2][j])) for j in range(2)],
            [Bd[2][j] for j in range(2)],
        ]
        m = [_add(f[0], _mul(P, f[2])), _add(f[1], _mul(Q, f[2])), f[2]]
        r = [_add(c[0], _mul(P, c[2])), _add(c[1], _mul(Q, c[2])), c[2]]
        return c, F, G, m, r

    # ------------------------------------------------------------------ #
    # obstacle geometry: hand-transcribed AD chains of geometry/distances
    # (tie conventions: jnp.minimum/clip 0.5, jnp.min equal split, where()
    # constant branches zero-gradient) so the closed forms match jax.grad
    # of the XLA path's footprint.distances exactly.
    # ------------------------------------------------------------------ #
    def sel_lt(a, b):
        """AD weight of ``a`` in jnp.minimum(a, b) (0.5 tie subgradient)."""
        return jnp.where(a < b, 1.0, jnp.where(a == b, 0.5, 0.0))

    def clip_gate(t_raw):
        """AD gate of jnp.clip(t_raw, 0, 1) (0.5 at exact boundaries)."""
        g1 = jnp.where(t_raw > 0.0, 1.0, jnp.where(t_raw == 0.0, 0.5, 0.0))
        y = jnp.maximum(t_raw, 0.0)
        g2 = jnp.where(y < 1.0, 1.0, jnp.where(y == 1.0, 0.5, 0.0))
        return g1 * g2

    def fp_points(x):
        """Footprint-disc centers [(px, py, r, dpx_dθ, dpy_dθ)] at pose x
        (footprints.py :: Point/Circular/TwoCircles — center = p + off·h(θ))."""
        out = []
        for off, r in fp_circles:
            if off == 0.0:
                out.append((x[0], x[1], r, 0.0, 0.0))
            else:
                c, s = jnp.cos(x[2]), jnp.sin(x[2])
                out.append((x[0] + off * c, x[1] + off * s, r, -off * s, off * c))
        return out

    def fp_segment(x):
        """World footprint segment (A, B, Aθ, Bθ) (footprints.LineFootprint)."""
        c, s = jnp.cos(x[2]), jnp.sin(x[2])
        (lsx, lsy), (lex, ley) = fp_seg
        A = (x[0] + c * lsx - s * lsy, x[1] + s * lsx + c * lsy)
        B = (x[0] + c * lex - s * ley, x[1] + s * lex + c * ley)
        Ath = (-s * lsx - c * lsy, c * lsx - s * lsy)
        Bth = (-s * lex - c * ley, c * lex - s * ley)
        return A, B, Ath, Bth

    def fp_polygon(x):
        """World footprint polygon (footprints.PolygonFootprint): vertex
        tuples (px, py, 0, dpx_dθ, dpy_dθ) and closed moving edges in
        d_seg_point's (A, B, Aθ, Bθ) layout. The vertex count is static,
        so every edge is active."""
        c, sn = jnp.cos(x[2]), jnp.sin(x[2])
        pts = []
        for vx, vy in fp_poly:
            pts.append((
                x[0] + c * vx - sn * vy,
                x[1] + sn * vx + c * vy,
                0.0,
                -sn * vx - c * vy,
                c * vx - sn * vy,
            ))
        Vf = len(fp_poly)
        edges = []
        for i in range(Vf):
            a, b = pts[i], pts[(i + 1) % Vf]
            edges.append(
                ((a[0], a[1]), (b[0], b[1]), (a[3], a[4]), (b[3], b[4]))
            )
        return pts, edges

    def d_point_point(pc, cx, cy, need_grad):
        """safe_norm(footprint point − c); pc = (px, py, r, dpx_dθ, dpy_dθ).
        Returns (dn, pose gradient of dn)."""
        px, py, _, dpx, dpy = pc
        ex, ey = px - cx, py - cy
        dn = jnp.sqrt(ex * ex + ey * ey + _EPS)
        if not need_grad:
            return dn, None
        inv = 1.0 / dn
        gx, gy = ex * inv, ey * inv
        gth = _add(_mul(gx, dpx), _mul(gy, dpy))
        return dn, (gx, gy, gth)

    def d_point_seg(pc, ax, ay, bx, by, need_grad):
        """point_to_segment with the POINT pose-dependent (footprint point,
        obstacle segment fixed at evaluation time)."""
        px, py, _, dpx, dpy = pc
        abx, aby = bx - ax, by - ay
        denom = jnp.maximum(abx * abx + aby * aby, _EPS)
        sxv, syv = px - ax, py - ay
        t_raw = (sxv * abx + syv * aby) / denom
        t = jnp.clip(t_raw, 0.0, 1.0)
        ex, ey = sxv - t * abx, syv - t * aby
        dn = jnp.sqrt(ex * ex + ey * ey + _EPS)
        if not need_grad:
            return dn, None
        cl = clip_gate(t_raw)
        inv = 1.0 / dn
        # ∂dn/∂p = e/dn · (I − ab (cl·ab/denom)ᵀ), then chain through p(θ)
        eab = (ex * abx + ey * aby) * cl / denom
        gx = (ex - eab * abx) * inv
        gy = (ey - eab * aby) * inv
        gth = _add(_mul(gx, dpx), _mul(gy, dpy))
        return dn, (gx, gy, gth)

    def d_seg_point(fps, cx, cy, need_grad):
        """point_to_segment with the SEGMENT pose-dependent (line footprint
        [A(x), B(x)], obstacle point fixed). Full AD chain incl. the
        numerically-nonzero ∂|ab|²/∂θ term."""
        A, B, Ath, Bth = fps
        abx, aby = B[0] - A[0], B[1] - A[1]
        d2 = abx * abx + aby * aby
        denom = jnp.maximum(d2, _EPS)
        sxv, syv = cx - A[0], cy - A[1]
        s = sxv * abx + syv * aby
        t_raw = s / denom
        t = jnp.clip(t_raw, 0.0, 1.0)
        ex, ey = sxv - t * abx, syv - t * aby
        dn = jnp.sqrt(ex * ex + ey * ey + _EPS)
        if not need_grad:
            return dn, None
        abthx, abthy = Bth[0] - Ath[0], Bth[1] - Ath[1]
        gd = jnp.where(d2 > _EPS, 1.0, jnp.where(d2 == _EPS, 0.5, 0.0))
        ddenom_th = gd * 2.0 * (abx * abthx + aby * abthy)
        ds_th = -(Ath[0] * abx + Ath[1] * aby) + (sxv * abthx + syv * abthy)
        cl = clip_gate(t_raw)
        dt_x = cl * (-abx) / denom
        dt_y = cl * (-aby) / denom
        dt_th = cl * (ds_th / denom - t_raw * ddenom_th / denom)
        # e = (c − A) − t·ab
        dex_x = -1.0 - abx * dt_x
        dey_x = -aby * dt_x
        dex_y = -abx * dt_y
        dey_y = -1.0 - aby * dt_y
        dex_th = -Ath[0] - abx * dt_th - t * abthx
        dey_th = -Ath[1] - aby * dt_th - t * abthy
        inv = 1.0 / dn
        gx = (ex * dex_x + ey * dey_x) * inv
        gy = (ex * dex_y + ey * dey_y) * inv
        gth = (ex * dex_th + ey * dey_th) * inv
        return dn, (gx, gy, gth)

    def _orient(ax, ay, bx, by, cx, cy):
        return (bx - ax) * (cy - ay) - (by - ay) * (cx - ax)

    def min2(c1, c2, need_grad):
        """jnp.minimum of (d, grad) candidates with the 0.5 tie split."""
        d1, g1 = c1
        d2, g2 = c2
        d = jnp.minimum(d1, d2)
        if not need_grad:
            return d, None
        w1, w2 = sel_lt(d1, d2), sel_lt(d2, d1)
        g = tuple(
            _add(_mul(w1, a), _mul(w2, b)) for a, b in zip(g1, g2)
        )
        return d, g

    def d_seg_seg(fps, ax, ay, bx, by, need_grad):
        """segment_to_segment(footprint seg, obstacle seg): nested minimum of
        four point-segment distances, zero on (and zero gradient through)
        proper intersection — distances.segment_to_segment's exact chain."""
        A, B, Ath, Bth = fps
        c1 = d_point_seg((A[0], A[1], 0.0, Ath[0], Ath[1]), ax, ay, bx, by, need_grad)
        c2 = d_point_seg((B[0], B[1], 0.0, Bth[0], Bth[1]), ax, ay, bx, by, need_grad)
        c3 = d_seg_point(fps, ax, ay, need_grad)
        c4 = d_seg_point(fps, bx, by, need_grad)
        d, g = min2(min2(c1, c2, need_grad), min2(c3, c4, need_grad), need_grad)
        o1 = _orient(ax, ay, bx, by, A[0], A[1])
        o2 = _orient(ax, ay, bx, by, B[0], B[1])
        o3 = _orient(A[0], A[1], B[0], B[1], ax, ay)
        o4 = _orient(A[0], A[1], B[0], B[1], bx, by)
        inter = jnp.logical_and(o1 * o2 < 0.0, o3 * o4 < 0.0)
        d = jnp.where(inter, 0.0, d)
        if need_grad:
            keep = jnp.logical_not(inter).astype(f32)
            g = tuple(_mul(keep, gi) for gi in g)
        return d, g

    def _poly_edges(j, t):
        """Active edges of polygon slot j at prediction time t:
        [(ax, ay, bx, by, active)] — b wraps to vertex 0 at the per-lane
        active count nv (padding rows are inactive), centers shifted by the
        slot velocity (obstacles.ObstacleSet.predict)."""
        nv = pnv[j, 0, 0]
        shx = _mul(pgv[j, 0, 0], t)
        shy = _mul(pgv[j, 1, 0], t)
        edges = []
        for v in range(V):
            axv = _add(pg[j, v, 0, 0], shx)
            ayv = _add(pg[j, v, 1, 0], shy)
            vn = min(v + 1, V - 1)
            wrap = jnp.float32(v + 1) == nv
            bxv = _add(jnp.where(wrap, pg[j, 0, 0, 0], pg[j, vn, 0, 0]), shx)
            byv = _add(jnp.where(wrap, pg[j, 0, 1, 0], pg[j, vn, 1, 0]), shy)
            act = jnp.float32(v) < nv
            edges.append((axv, ayv, bxv, byv, act))
        return edges

    def _edges_min(cands, need_grad):
        """jnp.min over active polygon edges with the reduce_min equal tie
        split (inactive edges masked to F32_MAX like the XLA inf mask).
        ``cands``: [((d, grad), active)]."""
        ds = [
            d if act is True else jnp.where(act, d, _F32_MAX)
            for (d, _), act in cands
        ]
        dmin = ds[0]
        for d in ds[1:]:
            dmin = jnp.minimum(dmin, d)
        if not need_grad:
            return dmin, None
        eqs = [
            (d == dmin).astype(f32)
            if act is True
            else jnp.logical_and(d == dmin, act).astype(f32)
            for d, ((_, _g), act) in zip(ds, cands)
        ]
        cnt = eqs[0]
        for e in eqs[1:]:
            cnt = cnt + e
        inv_cnt = 1.0 / jnp.maximum(cnt, 1.0)
        g = (0.0, 0.0, 0.0)
        for e, ((_d, gv), _act) in zip(eqs, cands):
            w = e * inv_cnt
            g = tuple(_add(gi, _mul(w, gvi)) for gi, gvi in zip(g, gv))
        return dmin, g

    def _poly_inside(px, py, edges):
        """Even-odd crossing test (distances.point_to_polygon_signed)."""
        count = zero
        for axv, ayv, bxv, byv, act in edges:
            cond = (ayv > py) != (byv > py)
            dyv = jnp.where(jnp.abs(byv - ayv) < _EPS, _EPS, byv - ayv)
            x_int = axv + (py - ayv) * (bxv - axv) / dyv
            count = count + jnp.logical_and(
                jnp.logical_and(cond, px < x_int), act
            ).astype(f32)
        return jnp.mod(count, 2.0) == 1.0

    def d_point_polygon(pc, edges, need_grad):
        """point_to_polygon_signed(footprint point, polygon): min edge
        distance, negated inside (gradient sign flips with the branch)."""
        cands = [
            (d_point_seg(pc, axv, ayv, bxv, byv, need_grad), act)
            for axv, ayv, bxv, byv, act in edges
        ]
        dmin, g = _edges_min(cands, need_grad)
        inside = _poly_inside(pc[0], pc[1], edges)
        sgn = jnp.where(inside, -1.0, 1.0)
        d = sgn * dmin
        if need_grad:
            g = tuple(_mul(sgn, gi) for gi in g)
        return d, g

    def d_seg_polygon(fps, edges, need_grad):
        """segment_to_polygon(line footprint, polygon): min over edges of
        segment-segment distance, zeroed (value and gradient) when the
        footprint segment start lies inside the polygon."""
        cands = [
            (d_seg_seg(fps, axv, ayv, bxv, byv, need_grad), act)
            for axv, ayv, bxv, byv, act in edges
        ]
        dmin, g = _edges_min(cands, need_grad)
        A = fps[0]
        inside = _poly_inside(A[0], A[1], edges)
        d = jnp.where(inside, 0.0, dmin)
        if need_grad:
            keep = jnp.logical_not(inside).astype(f32)
            g = tuple(_mul(keep, gi) for gi in g)
        return d, g

    def _fp_poly_inside(cx, cy, fpedges):
        """Even-odd test of a fixed point against the MOVING footprint
        polygon (value-only — the inside branch carries no gradient)."""
        count = zero
        for A, B, _Ath, _Bth in fpedges:
            cond = (A[1] > cy) != (B[1] > cy)
            dyv = jnp.where(jnp.abs(B[1] - A[1]) < _EPS, _EPS, B[1] - A[1])
            x_int = A[0] + (cy - A[1]) * (B[0] - A[0]) / dyv
            count = count + jnp.logical_and(cond, cx < x_int).astype(f32)
        return jnp.mod(count, 2.0) == 1.0

    def d_point_fp_polygon(cx, cy, fpedges, need_grad):
        """Signed dist(fixed point, moving footprint polygon) — negative
        when the point penetrates the footprint (footprints.py convention,
        point_to_polygon_signed with the polygon pose-dependent)."""
        cands = [
            (d_seg_point(fps_e, cx, cy, need_grad), True) for fps_e in fpedges
        ]
        dmin, g = _edges_min(cands, need_grad)
        inside = _fp_poly_inside(cx, cy, fpedges)
        sgn = jnp.where(inside, -1.0, 1.0)
        d = sgn * dmin
        if need_grad:
            g = tuple(_mul(sgn, gi) for gi in g)
        return d, g

    def d_seg_seg_rev(fps, ax, ay, bx, by, need_grad):
        """segment_to_segment with the FIXED segment as the first argument
        (segment_to_polygon's call order when the polygon is the footprint:
        obstacle line first, moving footprint edge second). Same value as
        d_seg_seg; only the nested-minimum tie pairing differs."""
        A, B, Ath, Bth = fps
        c1 = d_seg_point(fps, ax, ay, need_grad)
        c2 = d_seg_point(fps, bx, by, need_grad)
        c3 = d_point_seg((A[0], A[1], 0.0, Ath[0], Ath[1]), ax, ay, bx, by, need_grad)
        c4 = d_point_seg((B[0], B[1], 0.0, Bth[0], Bth[1]), ax, ay, bx, by, need_grad)
        d, g = min2(min2(c1, c2, need_grad), min2(c3, c4, need_grad), need_grad)
        o1 = _orient(ax, ay, bx, by, A[0], A[1])
        o2 = _orient(ax, ay, bx, by, B[0], B[1])
        o3 = _orient(A[0], A[1], B[0], B[1], ax, ay)
        o4 = _orient(A[0], A[1], B[0], B[1], bx, by)
        inter = jnp.logical_and(o3 * o4 < 0.0, o1 * o2 < 0.0)
        d = jnp.where(inter, 0.0, d)
        if need_grad:
            keep = jnp.logical_not(inter).astype(f32)
            g = tuple(_mul(keep, gi) for gi in g)
        return d, g

    def d_seg_fp_polygon(ax, ay, bx, by, fpedges, need_grad):
        """dist(fixed segment, moving footprint polygon) — min over
        footprint edges, zeroed when the segment start lies inside."""
        cands = [
            (d_seg_seg_rev(fps_e, ax, ay, bx, by, need_grad), True)
            for fps_e in fpedges
        ]
        dmin, g = _edges_min(cands, need_grad)
        inside = _fp_poly_inside(ax, ay, fpedges)
        d = jnp.where(inside, 0.0, dmin)
        if need_grad:
            keep = jnp.logical_not(inside).astype(f32)
            g = tuple(_mul(keep, gi) for gi in g)
        return d, g

    def d_polygon_fp_polygon(obs_edges, v0x, v0y, fppts, fpedges, need_grad):
        """dist(obstacle polygon, moving footprint polygon) — min over
        (fp edge x active obstacle edge) segment pairs, zero on mutual
        containment (polygon_to_polygon with verts_a = footprint)."""
        cands = []
        for fps_e in fpedges:
            for axv, ayv, bxv, byv, act in obs_edges:
                cands.append((d_seg_seg(fps_e, axv, ayv, bxv, byv, need_grad), act))
        dmin, g = _edges_min(cands, need_grad)
        a_in_b = _poly_inside(fppts[0][0], fppts[0][1], obs_edges)
        b_in_a = _fp_poly_inside(v0x, v0y, fpedges)
        overlap = jnp.logical_or(a_in_b, b_in_a)
        d = jnp.where(overlap, 0.0, dmin)
        if need_grad:
            keep = jnp.logical_not(overlap).astype(f32)
            g = tuple(_mul(keep, gi) for gi in g)
        return d, g

    def obs_terms(x, i, dt_pred=None, need_grad=True, t_override=None):
        """Per-mu-row obstacle inequality g = min_dist − d and (optionally)
        its pose gradient (∂g/∂x, ∂g/∂y, ∂g/∂θ); masked slots report
        g = min_dist − BIG(±fp radius) with gradients killed downstream by
        the zero AL weight (a = max(0, μ + ρg) ≈ 0 at g ≈ −1e6).

        ``i`` is the POSE index (0..N): with dynamic obstacles the slots
        are extrapolated to t = i * dt_pred. DERIVATIVE assembly
        (stage_grad_hess / terminal_Pp) uses the default — the solve's
        INITIAL dt, matching the per-cycle hoisted stage data of
        al_sqp._stage_obstacles (the f32 product i * dt matches
        arange(n) * stop_gradient(dt) bitwise since the index is exactly
        representable). The LINE-SEARCH merit passes the candidate's
        clipped dt and the DUAL update the current dt: al_sqp._al_merit and
        _update_duals both re-evaluate constraints.obstacle_inequalities at
        primal.dt, not the hoisted set. Returns (gs, grads): lists over the
        M mu rows in footprints.distances' concat order [point+circle,
        line, polygon]; grads entries are (gx, gy, gθ) of g (= −∇d)."""
        if t_override is not None:
            t = t_override if dynamic else 0.0
        else:
            if dt_pred is None:
                dt_pred = dt_i[0, 0]
            t = dt_pred * i if dynamic else 0.0
        pcs = fps = None
        fppts = fpedges = None
        if fp_poly is not None:
            fppts, fpedges = fp_polygon(x)
        elif fp_seg is not None:
            fps = fp_segment(x)
        else:
            pcs = fp_points(x)
        gs, grads = [], []

        def neg(g):
            return tuple(
                -gi if not _isc(gi) else 0.0 for gi in g
            ) if g is not None else None

        # point + circle slots (points are radius-0 circles)
        for j in range(mpc):
            cxj = _add(oc[j, 0, 0], _mul(ov[j, 0, 0], t))
            cyj = _add(oc[j, 1, 0], _mul(ov[j, 1, 0], t))
            rj = orr[j, 0, 0]
            mj = om[j, 0, 0] > 0.5
            if fp_poly is not None:
                dn, g = d_point_fp_polygon(cxj, cyj, fpedges, need_grad)
                d = jnp.where(mj, dn - rj, _BIG)
            elif fp_seg is not None:
                dn, g = d_seg_point(fps, cxj, cyj, need_grad)
                d = jnp.where(mj, dn - rj, _BIG)
            else:
                cands = []
                for pc in pcs:
                    dn, g = d_point_point(pc, cxj, cyj, need_grad)
                    d_i = jnp.where(mj, dn - rj, _BIG) - pc[2]
                    cands.append((d_i, g))
                d, g = cands[0]
                for c in cands[1:]:
                    d, g = min2((d, g), c, need_grad)
            gs.append(min_dist - d)
            grads.append(neg(g))

        # line slots (endpoints shift together under the slot velocity)
        for j in range(ml):
            shx = _mul(lvl[j, 0, 0], t)
            shy = _mul(lvl[j, 1, 0], t)
            ax = _add(ln[j, 0, 0, 0], shx)
            ay = _add(ln[j, 0, 1, 0], shy)
            bx = _add(ln[j, 1, 0, 0], shx)
            by = _add(ln[j, 1, 1, 0], shy)
            mj = lm[j, 0, 0] > 0.5
            if fp_poly is not None:
                dn, g = d_seg_fp_polygon(ax, ay, bx, by, fpedges, need_grad)
                d = jnp.where(mj, dn, _BIG)
            elif fp_seg is not None:
                dn, g = d_seg_seg(fps, ax, ay, bx, by, need_grad)
                d = jnp.where(mj, dn, _BIG)
            else:
                cands = []
                for pc in pcs:
                    dn, g = d_point_seg(pc, ax, ay, bx, by, need_grad)
                    d_i = jnp.where(mj, dn, _BIG) - pc[2]
                    cands.append((d_i, g))
                d, g = cands[0]
                for c in cands[1:]:
                    d, g = min2((d, g), c, need_grad)
            gs.append(min_dist - d)
            grads.append(neg(g))

        # polygon slots
        for j in range(mg):
            edges = _poly_edges(j, t)
            mj = pgm[j, 0, 0] > 0.5
            if fp_poly is not None:
                shx = _mul(pgv[j, 0, 0], t)
                shy = _mul(pgv[j, 1, 0], t)
                v0x = _add(pg[j, 0, 0, 0], shx)
                v0y = _add(pg[j, 0, 1, 0], shy)
                dn, g = d_polygon_fp_polygon(
                    edges, v0x, v0y, fppts, fpedges, need_grad
                )
                d = jnp.where(mj, dn, _BIG)
            elif fp_seg is not None:
                dn, g = d_seg_polygon(fps, edges, need_grad)
                d = jnp.where(mj, dn, _BIG)
            else:
                cands = []
                for pc in pcs:
                    dn, g = d_point_polygon(pc, edges, need_grad)
                    d_i = jnp.where(mj, dn, _BIG) - pc[2]
                    cands.append((d_i, g))
                d, g = cands[0]
                for c in cands[1:]:
                    d, g = min2((d, g), c, need_grad)
            gs.append(min_dist - d)
            grads.append(neg(g))
        return gs, grads

    # rate limits sanitized exactly like constraints.control_rate_inequalities
    lo_rs = [max(v, -_BIG) for v in lo_r]
    hi_rs = [min(v, _BIG) for v in hi_r]

    def hinge_w(t, rho):
        """AL curvature weight of an exactly-penalized linear inequality.

        Matches jax.hessian of max(0, t)^2/(2 rho): JAX's tie subgradient of
        maximum at t == 0 is 0.5, so the exactly-active case (t == 0 — e.g.
        the seeded velocity riding the box bound) gets rho/4, not 0 or rho.
        The obstacle GN weights stay crisp (al_sqp.gn_weights uses > 0).
        """
        s = jnp.where(t > 0.0, 1.0, jnp.where(t == 0.0, 0.5, 0.0))
        return rho * s * s

    def psi_sum(gs, mus, rho):
        """PHR penalty sum((max(0, mu + rho g))^2 - mu^2) / (2 rho)."""
        acc = 0.0
        for g, mu in zip(gs, mus):
            a = jnp.maximum(0.0, mu + rho * g)
            acc = _add(acc, a * a - mu * mu)
        return _mul(acc, 0.5 / rho) if not _isc(acc) else 0.0

    def phi_sum(cs, lams, rho):
        """Equality penalty sum(lam c) + rho/2 sum(c^2)."""
        acc = 0.0
        for c, lam in zip(cs, lams):
            acc = _add(acc, _add(_mul(lam, c), _mul(_mul(0.5, rho), c * c)))
        return acc

    # ---- per-stage constraint builders (shared by merit + derivatives) --- #
    def rate_g(uk, up, dtv):
        """4 rows: [du - hi dt (x2), lo dt - du (x2)]."""
        du = [uk[i] - up[i] for i in range(2)]
        return [
            du[0] - hi_rs[0] * dtv, du[1] - hi_rs[1] * dtv,
            lo_rs[0] * dtv - du[0], lo_rs[1] * dtv - du[1],
        ]

    def box_g(uk):
        return [
            uk[0] - hi_u[0], uk[1] - hi_u[1],
            lo_u[0] - uk[0], lo_u[1] - uk[1],
        ]

    def term_eq(xN):
        # se2_boxminus semantics: wrap ONLY the theta component — wrapping
        # the x/y translation would fold a >pi-meter goal error toward zero
        # and falsely report terminal feasibility (found in round-3 review)
        d = goal_dx(xN)
        return [_mul(1.0 if xf_fixed[i] else 0.0, d[i]) for i in range(3)]

    def dt_g(dtv):
        if not variable_dt:
            return [zero - _BIG, zero - _BIG]
        return [dtv - dt_max, dt_min - dtv]

    def goal_dx(x):
        """x ⊖ xf (SE(2) boxminus: θ wrapped)."""
        return [x[0] - xf[0, 0], x[1] - xf[1, 0], _wrap(x[2] - xf[2, 0])]

    def quad_terms(dx, u):
        """(Σ q_i dx_i², Σ r_j u_j²) with zero-weight folding."""
        x_term = _dotl([q_diag[i] for i in range(3)], [d * d for d in dx])
        u_term = _dotl([r_diag[j] for j in range(2)], [v * v for v in u])
        return x_term, u_term

    mt_like = objective in ("minimum_time", "minimum_time_via_points")

    # ---- via points (minimum_time_via_points objective) ------------------ #
    def via_sweep(xfun, want_cost):
        """Via-point stage assignment / cost (costs.via_stage_assignment +
        via_points_cost): per via slot, the first-minimum stage argmin of the
        position distance; ordered mode restricts each slot to stages at or
        after the previous ACTIVE slot's stage. want_cost returns the summed
        attraction cost of the trajectory (assignment recomputed from the
        candidate, matching _al_merit -> funcs.cost); otherwise returns the
        per-slot stage indices (f32 tiles) for the derivative assembly."""
        out_ks, acc = [], 0.0
        cursor = zero
        for j in range(mv):
            vpx, vpy = vp[j, 0, 0], vp[j, 1, 0]

            def vbody(k, carry, _vpx=vpx, _vpy=vpy):
                bd, bk, bth = carry
                x = xfun(k)
                dxv, dyv = x[0] - _vpx, x[1] - _vpy
                d2 = dxv * dxv + dyv * dyv
                if via_ordered:
                    d2 = jnp.where(k >= cursor, d2, _F32_MAX)
                upd = d2 < bd
                return (
                    jnp.where(upd, d2, bd),
                    jnp.where(upd, zero + k, bk),
                    jnp.where(upd, x[2], bth),
                )

            bd, bk, bth = jax.lax.fori_loop(
                0, N + 1, vbody, (zero + _F32_MAX, zero, zero)
            )
            if via_ordered:
                cursor = jnp.where(vm[j, 0, 0] > 0.5, bk, cursor)
            out_ks.append(bk)
            if want_cost:
                cj = _mul(via_pw, bd)
                if via_ow > 0.0:
                    dthv = _wrap(bth - vp[j, 2, 0])
                    cj = _add(cj, _mul(via_ow, dthv * dthv))
                acc = _add(acc, jnp.where(vm[j, 0, 0] > 0.5, cj, 0.0))
        return acc if want_cost else out_ks

    def via_rows(x, k, hzv, Hd):
        """Exact gradient/Hessian rows of the stage-k via term (the via
        attraction is quadratic in position — part of the AD objective, so
        exact in the hybrid surrogate). hzv: 3-list gradient accumulator;
        Hd: 3-list diagonal accumulator; k may be a traced index."""
        for j in range(mv):
            wf = jnp.where(vks[j] == k, vm[j, 0, 0], 0.0)
            hzv[0] = _add(hzv[0], _mul(2.0 * via_pw, wf * (x[0] - vp[j, 0, 0])))
            hzv[1] = _add(hzv[1], _mul(2.0 * via_pw, wf * (x[1] - vp[j, 1, 0])))
            Hd[0] = _add(Hd[0], _mul(2.0 * via_pw, wf))
            Hd[1] = _add(Hd[1], _mul(2.0 * via_pw, wf))
            if via_ow > 0.0:
                dthv = _wrap(x[2] - vp[j, 2, 0])
                hzv[2] = _add(hzv[2], _mul(2.0 * via_ow, wf * dthv))
                Hd[2] = _add(Hd[2], _mul(2.0 * via_ow, wf))
        return hzv, Hd

    def stage_iw(k):
        """Integration-rule stage weight (trapezoidal regrouping: ½ at k=0)."""
        return jnp.where(k == 0, 0.5, 1.0) if trapezoidal else 1.0

    def stage_cost(xk, uk, dtv, k, dtp=None):
        """Stage-k objective term (al_sqp._make_stage_fns :: objective —
        the via attraction is handled trajectory-wide by via_sweep). On the
        non-uniform grid the trapezoidal stage carries ½(dt_{k-1}+dt_k)·lx_k
        (dtp = candidate dt_{k-1}; dt_{-1} = 0)."""
        if mt_like:
            return dtv
        x_term, u_term = quad_terms(goal_dx(xk), uk)
        if integral_form:
            if nonu and trapezoidal:
                c = _add(
                    _mul(_mul(0.5, _add(dtp, dtv)), x_term), _mul(u_term, dtv)
                )
            else:
                c = _mul(_add(_mul(stage_iw(k), x_term), u_term), dtv)
        else:
            c = _add(x_term, u_term)
        if hybrid_w > 0.0:
            c = _add(c, _mul(hybrid_w, dtv))
        return c

    def ball_g(xN):
        """Terminal-ball inequality ‖x_N ⊖ xf‖²_S − r² and its position
        gradient rows (constraints.terminal_ball_inequality)."""
        dxb = goal_dx(xN)
        g = _add(
            _dotl([ball_w[i] for i in range(3)], [d * d for d in dxb]),
            -ball_r * ball_r,
        )
        gp = [_mul(2.0 * ball_w[i], dxb[i]) for i in range(3)]
        return g, gp

    # ---- full-trajectory AL merit of a line-search candidate -------------- #
    def merit_candidate(alpha, rho):
        """_al_merit at (xs + a dxs [wrapped], us + a dus, clip(dt + a dtau)).

        One pass over the stages; the candidate is never materialized.
        """
        dtv = jnp.clip(scal[0] + alpha * scal[7], dt_lo, dt_hi)

        def cand_x(k):
            return [
                xs_o[k, 0, 0] + alpha * dxs[k, 0],
                xs_o[k, 1, 0] + alpha * dxs[k, 1],
                _wrap(xs_o[k, 2, 0] + alpha * dxs[k, 2]),
            ]

        def cand_u(k):
            return [us_o[k, i, 0] + alpha * dus[k, i] for i in range(2)]

        def stage_merit_terms(k, m, xk, uk, xk1, up, dtv_k, t_k1, dtp):
            c, _, _, _, _ = defect(xk, uk, xk1, dtv_k)
            m = m + phi_sum(c, [ld_o[k, i, 0] for i in range(3)], rho)
            # obstacle rows: row k of (N, M) belongs to pose x_{k+1};
            # prediction at the CANDIDATE dt (al_sqp._al_merit evaluates
            # obstacle_inequalities at the candidate primal.dt; cumulative
            # time on the non-uniform grid)
            gs, _ = obs_terms(
                xk1, k + 1, dt_pred=dtv_k, need_grad=False,
                t_override=t_k1 if nonu else None,
            )
            m = m + psi_sum(gs, [mo_o[k, j, 0] for j in range(M)], rho)
            m = m + psi_sum(rate_g(uk, up, dtv_k), [mr_o[k, i, 0] for i in range(4)], rho)
            m = m + psi_sum(box_g(uk), [mb_o[k, i, 0] for i in range(4)], rho)
            if not mt_like:
                m = m + stage_cost(xk, uk, dtv_k, k, dtp=dtp)
            return m

        def cand_up(k):
            km1 = jnp.maximum(k - 1, 0)
            return [
                jnp.where(k == 0, u_prev[i, 0], us_o[km1, i, 0]
                          + alpha * dus[km1, i])
                for i in range(2)
            ]

        if nonu:
            def body(k, carry):
                m, tprev, dtp = carry
                dtv_k = jnp.clip(dts[k] + alpha * dtaus[k], dt_lo, dt_hi)
                tnext = tprev + dtv_k
                m = stage_merit_terms(
                    k, m, cand_x(k), cand_u(k), cand_x(k + 1), cand_up(k),
                    dtv_k, tnext, dtp,
                )
                # per-interval dt box + min-time stage cost live per stage
                m = m + psi_sum(
                    [dtv_k - dt_max, dt_min - dtv_k],
                    [md_o[k, 0, 0], md_o[k, 1, 0]], rho,
                )
                if mt_like:
                    m = m + dtv_k
                return m, tnext, dtv_k

            m, _tN, dt_last = jax.lax.fori_loop(0, N, body, (zero, zero, zero))
        else:
            def body(k, m):
                return stage_merit_terms(
                    k, m, cand_x(k), cand_u(k), cand_x(k + 1), cand_up(k),
                    dtv, None, None,
                )

            m = jax.lax.fori_loop(0, N, body, zero)
            dt_last = dtv
            if mt_like:
                m = m + float(N) * dtv              # minimum_time cost
        if objective == "minimum_time_via_points":
            # assignment recomputed from the CANDIDATE (funcs.cost semantics)
            m = m + via_sweep(cand_x, want_cost=True)
        xN = cand_x(N)
        te = term_eq(xN)
        m = m + phi_sum(te, [lt_o[i, 0] for i in range(3)], rho)
        if variable_dt and not nonu:
            m = m + psi_sum(dt_g(dtv), [md_o[i, 0] for i in range(2)], rho)
        if objective == "quadratic_form" and integral_form and trapezoidal:
            # the ½·dt·lx(x_N) tail of the trapezoidal regrouping
            # (dt_{N-1} on the non-uniform grid)
            x_term, _ = quad_terms(goal_dx(xN), [0.0, 0.0])
            m = m + _mul(_mul(0.5, x_term), dt_last)
        if ball_r > 0.0:
            gb, _ = ball_g(xN)
            m = m + psi_sum([gb], [mball_o[0, 0]], rho)
        if qf is not None:
            dxq = goal_dx(xN)
            m = m + sum(qf[i] * dxq[i] * dxq[i] for i in range(3))
        return m

    # ---- Riccati pieces over z = [dx(3), du_prev(2), dtau], v = du(2) ----- #
    na, nu = 6, 2
    nv = 3 if nonu else 2  # control width: [du] or [du, ddt_k]

    def terminal_Pp(rho):
        """PN (6x6) and pN (6) of the terminal stage merit.

        Terms: phi(masked terminal equality) [exact], obstacle GN at x_N,
        dt box [exact], optional terminal quadratic cost [exact]. The
        du_prev rows are zero (terminal merit doesn't touch u_{N-1}).
        """
        xN = read_x(N)
        Pm = [[0.0] * na for _ in range(na)]
        pm = [0.0] * na
        te = term_eq(xN)
        for i in range(3):
            if xf_fixed[i]:
                Pm[i][i] = _add(Pm[i][i], rho)
                pm[i] = _add(pm[i], lt_o[i, 0] + rho * te[i])
        if qf is not None:
            for i in range(3):
                if qf[i] != 0.0:
                    Pm[i][i] = _add(Pm[i][i], 2.0 * qf[i])
                    pm[i] = _add(pm[i], 2.0 * qf[i] * goal_dx(xN)[i])
        if objective == "minimum_time_via_points":
            pmv = [pm[0], pm[1], pm[2]]
            Pd = [Pm[0][0], Pm[1][1], Pm[2][2]]
            pmv, Pd = via_rows(xN, N, pmv, Pd)
            pm[0], pm[1], pm[2] = pmv
            Pm[0][0], Pm[1][1], Pm[2][2] = Pd
        gs, grads = obs_terms(
            xN, N, t_override=tv[N] if nonu else None
        )
        for j in range(M):
            mu = mo_o[N - 1, j, 0]
            a = jnp.maximum(0.0, mu + rho * gs[j])
            act = (mu + rho * gs[j] > 0.0).astype(f32)
            aw = rho * act
            # gradient: a * dg/dpose ; GN: aw * (dg/dpose)(dg/dpose)^T — the
            # pose block is 3x3 now that θ-dependent footprints are in scope
            gj = grads[j]
            for r in range(3):
                pm[r] = _add(pm[r], _mul(a, gj[r]))
                for c in range(r, 3):
                    Pm[r][c] = _add(Pm[r][c], _mul(_mul(aw, gj[r]), gj[c]))
        Pm[1][0] = Pm[0][1]
        Pm[2][0] = Pm[0][2]
        Pm[2][1] = Pm[1][2]
        if objective == "quadratic_form" and integral_form and trapezoidal:
            # ½·dt·lx(x_N) tail: exact gradient/Hessian incl. the dtau cross
            # terms (terminal w carries dt in al_sqp._make_terminal_fns —
            # dt_{N-1} on the non-uniform grid, which is exactly z[5])
            dxq = goal_dx(xN)
            dtv0 = dts[N - 1] if nonu else scal[0]
            x_term, _ = quad_terms(dxq, [0.0, 0.0])
            pm[5] = _add(pm[5], _mul(0.5, x_term))
            for i in range(3):
                if q_diag[i] != 0.0:
                    pm[i] = _add(pm[i], _mul(q_diag[i], dxq[i]) * dtv0)
                    Pm[i][i] = _add(Pm[i][i], q_diag[i] * dtv0)
                    Pm[i][5] = _add(Pm[i][5], _mul(q_diag[i], dxq[i]))
                    Pm[5][i] = Pm[i][5]
        if ball_r > 0.0:
            # exact PSD Hessian of the PHR ball penalty: ρs²·g'g'ᵀ (s = tie
            # subgradient, see hinge_w) + a·∇²g with ∇²g = 2 diag(ball_w)
            gb, gp = ball_g(xN)
            mu_b = mball_o[0, 0]
            tb = mu_b + rho * gb
            ab = jnp.maximum(0.0, tb)
            hwb = hinge_w(tb, rho)
            for i in range(3):
                pm[i] = _add(pm[i], _mul(ab, gp[i]))
                Pm[i][i] = _add(Pm[i][i], _mul(2.0 * ball_w[i], ab))
                for j in range(3):
                    Pm[i][j] = _add(Pm[i][j], _mul(_mul(hwb, gp[i]), gp[j]))
        if variable_dt and not nonu:
            dtv = scal[0]
            g1, g2 = dtv - dt_max, dt_min - dtv
            mu1, mu2 = md_o[0, 0], md_o[1, 0]
            a1 = jnp.maximum(0.0, mu1 + rho * g1)
            a2 = jnp.maximum(0.0, mu2 + rho * g2)
            pm[5] = _add(pm[5], a1 - a2)
            Pm[5][5] = _add(
                Pm[5][5], hinge_w(mu1 + rho * g1, rho) + hinge_w(mu2 + rho * g2, rho)
            )
        return Pm, pm

    def stage_grad_hess(k, rho):
        """Exact AL gradient (hz 6, hu nv) + hybrid GN Hessian blocks
        (Hzz 6x6, Hzu 6xnv, Huu nvxnv) of the stage merit at stage k.

        Uniform layout: z = [dx, du_prev, dtau], v = [du]. Non-uniform grid
        (nonu): z = [dx, du_prev, ddt_prev], v = [du, ddt_k] — the stage dt
        moves from the shared z[5] slot into the control column v[2]
        (al_sqp._make_stage_fns nonuniform w-layout).

        Stage merit terms: min-time objective (dt), obstacles at x_k
        (inactive at k=0, multiplier row mo[k-1]), rate (u_prev, u, dt),
        box (u), per-stage dt box (nonu only). All constraints are linear
        except the obstacle distance, whose GN weight is aw = rho*[active]
        (matches al_sqp's surrogate).
        """
        xk = read_x(k)
        uk = read_u(k)
        up = read_uprev(k)
        dtv = dts[k] if nonu else scal[0]
        hz = [0.0] * na
        hu = [0.0] * nv
        Hzz = [[0.0] * na for _ in range(na)]
        Hzu = [[0.0] * nv for _ in range(na)]
        Huu = [[0.0] * nv for _ in range(nv)]

        # objective stage terms
        if mt_like:
            # min-time stage cost = dt_k -> unit gradient on its slot
            if nonu:
                hu[2] = _add(hu[2], one)
            else:
                hz[5] = _add(hz[5], one)
            if objective == "minimum_time_via_points":
                hzv = [hz[0], hz[1], hz[2]]
                Hd = [Hzz[0][0], Hzz[1][1], Hzz[2][2]]
                hzv, Hd = via_rows(xk, k, hzv, Hd)
                hz[0], hz[1], hz[2] = hzv
                Hzz[0][0], Hzz[1][1], Hzz[2][2] = Hd
        else:
            # quadratic form: exact gradient + exact (PSD diagonal) Hessian,
            # incl. the x/u-dt cross rows of the integral form
            dxq = goal_dx(xk)
            if integral_form and nonu:
                km1n = jnp.maximum(k - 1, 0)
                dtp = jnp.where(k == 0, 0.0, dts[km1n])
                x_term, u_term = quad_terms(dxq, uk)
                if trapezoidal:
                    # c = ½(dtp+dt)·lx + lu·dt (+ w·dt)
                    wx = 0.5 * (dtp + dtv)
                    hz[5] = _add(hz[5], _mul(0.5, x_term))
                    hu[2] = _add(hu[2], _add(_mul(0.5, x_term), u_term))
                    for i in range(3):
                        if q_diag[i] != 0.0:
                            qi = _mul(2.0 * q_diag[i], dxq[i])
                            hz[i] = _add(hz[i], qi * wx)
                            Hzz[i][i] = _add(Hzz[i][i], 2.0 * q_diag[i] * wx)
                            Hzz[i][5] = _add(Hzz[i][5], _mul(0.5, qi))
                            Hzz[5][i] = Hzz[i][5]
                            Hzu[i][2] = _add(Hzu[i][2], _mul(0.5, qi))
                else:
                    # c = (lx + lu)·dt
                    hu[2] = _add(hu[2], _add(x_term, u_term))
                    for i in range(3):
                        if q_diag[i] != 0.0:
                            qi = _mul(2.0 * q_diag[i], dxq[i])
                            hz[i] = _add(hz[i], qi * dtv)
                            Hzz[i][i] = _add(Hzz[i][i], 2.0 * q_diag[i] * dtv)
                            Hzu[i][2] = _add(Hzu[i][2], qi)
                for j in range(2):
                    if r_diag[j] != 0.0:
                        rj = 2.0 * r_diag[j] * uk[j]
                        hu[j] = _add(hu[j], rj * dtv)
                        Huu[j][j] = _add(Huu[j][j], 2.0 * r_diag[j] * dtv)
                        Huu[j][2] = _add(Huu[j][2], rj)
                        Huu[2][j] = Huu[j][2]
                if hybrid_w > 0.0:
                    hu[2] = _add(hu[2], hybrid_w)
            elif integral_form:
                iw = stage_iw(k)
                x_term, u_term = quad_terms(dxq, uk)
                hz[5] = _add(hz[5], _add(_mul(iw, x_term), u_term))
                for i in range(3):
                    if q_diag[i] != 0.0:
                        qi = _mul(2.0 * q_diag[i], _mul(iw, dxq[i]))
                        hz[i] = _add(hz[i], qi * dtv)
                        Hzz[i][i] = _add(Hzz[i][i], _mul(2.0 * q_diag[i], iw) * dtv)
                        Hzz[i][5] = _add(Hzz[i][5], qi)
                        Hzz[5][i] = Hzz[i][5]
                for j in range(2):
                    if r_diag[j] != 0.0:
                        rj = 2.0 * r_diag[j] * uk[j]
                        hu[j] = _add(hu[j], rj * dtv)
                        Huu[j][j] = _add(Huu[j][j], 2.0 * r_diag[j] * dtv)
                        Hzu[5][j] = _add(Hzu[5][j], rj)
                if hybrid_w > 0.0:
                    hz[5] = _add(hz[5], hybrid_w)
            else:
                for i in range(3):
                    if q_diag[i] != 0.0:
                        hz[i] = _add(hz[i], _mul(2.0 * q_diag[i], dxq[i]))
                        Hzz[i][i] = _add(Hzz[i][i], 2.0 * q_diag[i])
                for j in range(2):
                    if r_diag[j] != 0.0:
                        hu[j] = _add(hu[j], 2.0 * r_diag[j] * uk[j])
                        Huu[j][j] = _add(Huu[j][j], 2.0 * r_diag[j])
                if hybrid_w > 0.0:
                    if nonu:
                        hu[2] = _add(hu[2], hybrid_w)
                    else:
                        hz[5] = _add(hz[5], hybrid_w)

        # obstacles at x_k (row k-1; inactive when k == 0)
        on = (k > 0).astype(f32)
        km1 = jnp.maximum(k - 1, 0)
        gs, grads = obs_terms(
            xk, k, t_override=tv[k] if nonu else None
        )
        for j in range(M):
            mu = mo_o[km1, j, 0] * on
            a = jnp.maximum(0.0, mu + rho * gs[j]) * on
            aw = rho * on * (mu + rho * gs[j] > 0.0).astype(f32)
            gj = grads[j]
            for r in range(3):
                hz[r] = _add(hz[r], _mul(a, gj[r]))
                for c in range(r, 3):
                    Hzz[r][c] = _add(Hzz[r][c], _mul(_mul(aw, gj[r]), gj[c]))
        Hzz[1][0] = Hzz[0][1]
        Hzz[2][0] = Hzz[0][2]
        Hzz[2][1] = Hzz[1][2]

        # rate rows: g = +-(du - b dt). Uniform: J_z over [du_prev, dtau],
        # J_v over du. Non-uniform: the dt column is v[2].
        # Linear -> exact Hessian = rho [active] J J^T.
        g_r = rate_g(uk, up, dtv)
        for idx, (sgn, comp, b) in enumerate(
            [(1.0, 0, hi_rs[0]), (1.0, 1, hi_rs[1]),
             (-1.0, 0, lo_rs[0]), (-1.0, 1, lo_rs[1])]
        ):
            mu = mr_o[k, idx, 0]
            a = jnp.maximum(0.0, mu + rho * g_r[idx])
            aw = hinge_w(mu + rho * g_r[idx], rho)
            # J entries: d g/d u_prev[comp] = -sgn; d g/d dt = -sgn*b;
            # d g/d u[comp] = +sgn
            jz_up, jz_t, jv = -sgn, -sgn * b, sgn
            zi = 3 + comp
            hz[zi] = _add(hz[zi], a * jz_up)
            hu[comp] = _add(hu[comp], a * jv)
            Hzz[zi][zi] = _add(Hzz[zi][zi], aw * jz_up * jz_up)
            Hzu[zi][comp] = _add(Hzu[zi][comp], aw * jz_up * jv)
            Huu[comp][comp] = _add(Huu[comp][comp], aw * jv * jv)
            if nonu:
                hu[2] = _add(hu[2], a * jz_t)
                Hzu[zi][2] = _add(Hzu[zi][2], aw * jz_up * jz_t)
                Huu[comp][2] = _add(Huu[comp][2], aw * jv * jz_t)
                Huu[2][comp] = Huu[comp][2]
                Huu[2][2] = _add(Huu[2][2], aw * jz_t * jz_t)
            else:
                ti = 5
                hz[ti] = _add(hz[ti], a * jz_t)
                Hzz[zi][ti] = _add(Hzz[zi][ti], aw * jz_up * jz_t)
                Hzz[ti][zi] = Hzz[zi][ti]
                Hzz[ti][ti] = _add(Hzz[ti][ti], aw * jz_t * jz_t)
                Hzu[ti][comp] = _add(Hzu[ti][comp], aw * jz_t * jv)

        # box rows: g = +-(u - b); J_v only.
        g_b = box_g(uk)
        for idx, (sgn, comp) in enumerate([(1.0, 0), (1.0, 1), (-1.0, 0), (-1.0, 1)]):
            mu = mb_o[k, idx, 0]
            a = jnp.maximum(0.0, mu + rho * g_b[idx])
            aw = hinge_w(mu + rho * g_b[idx], rho)
            hu[comp] = _add(hu[comp], a * sgn)
            Huu[comp][comp] = _add(Huu[comp][comp], aw)

        if nonu:
            # per-interval dt box (constraints.dt box joins the STAGE
            # inequalities on the non-uniform grid; multipliers md[k])
            g1, g2 = dtv - dt_max, dt_min - dtv
            mu1, mu2 = md_o[k, 0, 0], md_o[k, 1, 0]
            a1 = jnp.maximum(0.0, mu1 + rho * g1)
            a2 = jnp.maximum(0.0, mu2 + rho * g2)
            hu[2] = _add(hu[2], a1 - a2)
            Huu[2][2] = _add(
                Huu[2][2],
                hinge_w(mu1 + rho * g1, rho) + hinge_w(mu2 + rho * g2, rho),
            )
            if dt_prox > 0.0:
                # proximal damping of the delta-dt column
                # (SolverSettings.dt_prox; al_sqp adds it to Huu post-AD)
                Huu[2][2] = _add(Huu[2][2], dt_prox)
        return hz, hu, Hzz, Hzu, Huu

    # ---- the solve -------------------------------------------------------- #
    for _phase in range(n_al):
        rho = scal[1]
        reg = zero + reg0

        for _it in range(n_sqp):
            # via-point stage assignment at the CURRENT iterate — per-SQP-
            # iteration stage data, exactly like al_sqp._sqp_iteration's
            # _via_weights (piecewise-constant, not differentiated)
            if objective == "minimum_time_via_points":
                for _j, _bk in enumerate(via_sweep(read_x, want_cost=False)):
                    vks[_j] = _bk

            # ---------- backward Riccati sweep (streaming derivatives) ----- #
            PN, pN = terminal_Pp(rho)
            p_init = [pN[i] if not _isc(pN[i]) else zero + pN[i] for i in range(na)]
            P_init = [
                [PN[i][j] if not _isc(PN[i][j]) else zero + PN[i][j] for j in range(na)]
                for i in range(na)
            ]
            for i in range(na):
                pv[i] = p_init[i]
                for j in range(na):
                    P[i, j] = P_init[i][j]

            def backward(t, _):
                k = N - 1 - t
                xk, uk, xk1 = read_x(k), read_u(k), read_x(k + 1)
                dtv = dts[k] if nonu else scal[0]
                _c, F, G, mvec, rres = defect(xk, uk, xk1, dtv)
                mcol = mvec if variable_dt else [0.0, 0.0, 0.0]
                hz, hu, Hzz, Hzu, Huu = stage_grad_hess(k, rho)

                if nonu:
                    # non-uniform transition (riccati.build_augmented_
                    # transition_nonuniform): ddt_k is a control column,
                    # ddt_{k-1} rides in z — Fz = [[F,0,0],[0]],
                    # Gz = [[G|m],[I3]], rz = [r;0]
                    Fz = [
                        [F[0][0], F[0][1], F[0][2], 0.0, 0.0, 0.0],
                        [F[1][0], F[1][1], F[1][2], 0.0, 0.0, 0.0],
                        [F[2][0], F[2][1], F[2][2], 0.0, 0.0, 0.0],
                        [0.0] * 6, [0.0] * 6, [0.0] * 6,
                    ]
                    Gz = [
                        [G[0][0], G[0][1], mcol[0]],
                        [G[1][0], G[1][1], mcol[1]],
                        [G[2][0], G[2][1], mcol[2]],
                        [1.0, 0.0, 0.0], [0.0, 1.0, 0.0], [0.0, 0.0, 1.0],
                    ]
                else:
                    # augmented transition (structured):
                    #   Fz = [[F,0,m],[0,0,0],[0,0,1]], Gz = [[G],[I],[0]]
                    Fz = [
                        [F[0][0], F[0][1], F[0][2], 0.0, 0.0, mcol[0]],
                        [F[1][0], F[1][1], F[1][2], 0.0, 0.0, mcol[1]],
                        [F[2][0], F[2][1], F[2][2], 0.0, 0.0, mcol[2]],
                        [0.0] * 6, [0.0] * 6,
                        [0.0, 0.0, 0.0, 0.0, 0.0, 1.0],
                    ]
                    Gz = [
                        [G[0][0], G[0][1]], [G[1][0], G[1][1]], [G[2][0], G[2][1]],
                        [1.0, 0.0], [0.0, 1.0], [0.0, 0.0],
                    ]
                rz = [rres[0], rres[1], rres[2], 0.0, 0.0, 0.0]

                if CHAINBREAK:
                    # timing probe only (see the knob comment at the top):
                    # registers instead of the loop-carried VMEM state —
                    # severs the cross-stage dependency, results are WRONG
                    Pm = [[P_init[i][j] for j in range(na)] for i in range(na)]
                    pl_ = list(p_init)
                else:
                    Pm = [[P[i, j] for j in range(na)] for i in range(na)]
                    pl_ = [pv[i] for i in range(na)]
                PF = _mat_mul(Pm, Fz)
                PG = _mat_mul(Pm, Gz)
                Prp = [_add(_dotl(Pm[i], rz), pl_[i]) for i in range(na)]
                FT = _mat_T(Fz)
                Qzz = [
                    [_add(Hzz[i][j], _dotl(FT[i], [PF[l][j] for l in range(na)]))
                     for j in range(na)]
                    for i in range(na)
                ]
                Qzu = [
                    [_add(Hzu[i][j], _dotl(FT[i], [PG[l][j] for l in range(na)]))
                     for j in range(nv)]
                    for i in range(na)
                ]
                GT = _mat_T(Gz)
                Quu = [
                    [
                        _add(
                            _add(Huu[i][j],
                                 _dotl(GT[i], [PG[l][j] for l in range(na)])),
                            reg if i == j else 0.0,
                        )
                        for j in range(nv)
                    ]
                    for i in range(nv)
                ]
                qz = [_add(hz[i], _dotl(FT[i], Prp)) for i in range(na)]
                qu = [_add(hu[i], _dotl(GT[i], Prp)) for i in range(nv)]

                if nonu:
                    # closed-form 3x3 inverse (adjugate / det)
                    a00, a01, a02 = Quu[0]
                    a10, a11, a12 = Quu[1]
                    a20, a21, a22 = Quu[2]
                    c00 = a11 * a22 - a12 * a21
                    c01 = a02 * a21 - a01 * a22
                    c02 = a01 * a12 - a02 * a11
                    c10 = a12 * a20 - a10 * a22
                    c11 = a00 * a22 - a02 * a20
                    c12 = a02 * a10 - a00 * a12
                    c20 = a10 * a21 - a11 * a20
                    c21 = a01 * a20 - a00 * a21
                    c22 = a00 * a11 - a01 * a10
                    det = a00 * c00 + a01 * c10 + a02 * c20
                    inv_det = 1.0 / det
                    Qi = [
                        [c00 * inv_det, c01 * inv_det, c02 * inv_det],
                        [c10 * inv_det, c11 * inv_det, c12 * inv_det],
                        [c20 * inv_det, c21 * inv_det, c22 * inv_det],
                    ]
                else:
                    det = Quu[0][0] * Quu[1][1] - Quu[0][1] * Quu[1][0]
                    inv_det = 1.0 / det
                    Qi = [
                        [Quu[1][1] * inv_det, -Quu[0][1] * inv_det],
                        [-Quu[1][0] * inv_det, Quu[0][0] * inv_det],
                    ]
                Km = [
                    [
                        -_dotl(Qi[i], [Qzu[j][l] for l in range(nv)])
                        for j in range(na)
                    ]
                    for i in range(nv)
                ]
                kf = [-_dotl(Qi[i], qu) for i in range(nv)]
                # constant-folded entries (the non-uniform Fz has three
                # all-zero rows) must be materialized before the ref store
                tile = lambda v: v if not _isc(v) else zero + v  # noqa: E731
                for i in range(na):
                    for j in range(na):
                        v = _add(Qzz[i][j], _dotl(Qzu[i], [Km[l][j] for l in range(nv)]))
                        vT = _add(Qzz[j][i], _dotl(Qzu[j], [Km[l][i] for l in range(nv)]))
                        P[i, j] = tile(_mul(0.5, _add(v, vT)))
                    pv[i] = tile(_add(qz[i], _dotl(Qzu[i], kf)))
                for i in range(nv):
                    kffs[k, i] = tile(kf[i])
                    for j in range(na):
                        Ks[k, i, j] = tile(Km[i][j])
                return ()

            if debug_step == 4:
                # dump raw stage N-1 pieces: x_{N-1}, u_{N-1}, x_N, c, f
                xk, uk, xk1 = read_x(N - 1), read_u(N - 1), read_x(N)
                c4, F4, G4, f4, _r4 = defect(xk, uk, xk1, scal[0])
                for i in range(3):
                    ld_o[0, i, 0] = xk[i]
                    ld_o[1, i, 0] = xk1[i]
                    ld_o[2, i, 0] = c4[i]
                    ld_o[3, i, 0] = f4[i]
                lt_o[0, 0] = uk[0]
                lt_o[1, 0] = uk[1]
                lt_o[2, 0] = scal[0]
                for r_ in (rho_o, cost_o, eq_o, in_o, cv_o, dt_o):
                    r_[0, 0] = zero
                return

            if debug_step >= 2:
                # dump P/p after terminal init (3) or one backward step (2)
                if debug_step == 2:
                    jax.lax.fori_loop(0, 1, backward, ())
                for i in range(6):
                    ld_o[i // 3, i % 3, 0] = pv[i]
                for i in range(6):
                    for j in range(6):
                        idx = i * 6 + j
                        if idx < N * M:
                            mo_o[idx % N, idx // N, 0] = P[i, j]
                        else:
                            mr_o[(idx - N * M) % N, (idx - N * M) // N, 0] = P[i, j]
                for r_ in (rho_o, cost_o, eq_o, in_o, cv_o, dt_o):
                    r_[0, 0] = zero
                return

            jax.lax.fori_loop(0, N, backward, ())

            # ---------- initial stage: free dtau --------------------------- #
            # (uniform shared-dt only; non-uniform ddt_k are stage controls)
            tiny = float(jnp.finfo(jnp.float32).tiny)
            if variable_dt and not nonu:
                Ptau = P[5, 5] + reg
                dtau = -pv[5] / jnp.maximum(Ptau, tiny)
            else:
                dtau = zero
            scal[7] = dtau
            if debug_step:
                # P0/p0 diagnostics (before pv is reused as the rollout z)
                ld_o[0, 0, 0] = pv[5]
                ld_o[0, 1, 0] = P[5, 5]
                ld_o[0, 2, 0] = pv[0]
                ld_o[1, 0, 0] = P[0, 0]
                ld_o[1, 1, 0] = P[0, 5]
                ld_o[1, 2, 0] = P[3, 3]

            # ---------- forward rollout ------------------------------------ #
            for i in range(3):
                dxs[0, i] = zero
            # z carried in pv (reuse): z = [dx(3), du_prev(2), dtau/ddt_prev]
            for i in range(5):
                pv[i] = zero
            pv[5] = dtau  # 0 on the non-uniform grid (ddt_{-1} = 0)

            def forward(k, _):
                xk, uk, xk1 = read_x(k), read_u(k), read_x(k + 1)
                dtv = dts[k] if nonu else scal[0]
                _c, F, G, mvec, rres = defect(xk, uk, xk1, dtv)
                mcol = mvec if variable_dt else [0.0, 0.0, 0.0]
                z = [pv[i] for i in range(na)]
                u = [
                    _add(_dotl([Ks[k, i, j] for j in range(na)], z), kffs[k, i])
                    for i in range(nv)
                ]
                du2 = u[:2]
                ddt = u[2] if nonu else z[5]
                xn = [
                    _add(
                        _add(_dotl(F[i], z[:3]), _dotl(G[i], du2)),
                        _add(_mul(mcol[i], ddt), rres[i]),
                    )
                    for i in range(3)
                ]
                for i in range(2):
                    dus[k, i] = u[i]
                if nonu:
                    dtaus[k] = u[2]
                for i in range(3):
                    dxs[k + 1, i] = xn[i]
                pv[0], pv[1], pv[2] = xn[0], xn[1], xn[2]
                pv[3], pv[4] = u[0], u[1]
                if nonu:
                    pv[5] = u[2]
                return ()

            jax.lax.fori_loop(0, N, forward, ())

            # ---------- NaN quarantine ------------------------------------- #
            # float carry: Mosaic cannot legalize an i1-vector scf.for carry
            def finck(k, ok):
                for i in range(3):
                    ok = ok * jnp.isfinite(dxs[k + 1, i]).astype(f32)
                for i in range(2):
                    ok = ok * jnp.isfinite(dus[k, i]).astype(f32)
                if nonu:
                    ok = ok * jnp.isfinite(dtaus[k]).astype(f32)
                return ok

            okf = jax.lax.fori_loop(
                0, N, finck, jnp.isfinite(scal[7]).astype(f32)
            )

            def quarantine(k, _):
                for i in range(3):
                    dxs[k + 1, i] = dxs[k + 1, i] * okf
                for i in range(2):
                    dus[k, i] = dus[k, i] * okf
                if nonu:
                    dtaus[k] = dtaus[k] * okf
                return ()

            jax.lax.fori_loop(0, N, quarantine, ())
            scal[7] = scal[7] * okf

            if debug_step:
                # dump the raw KKT step into the primal outputs and stop;
                # P0/p0 diagnostics ride in lam_def rows 0-1
                def dbg(k, _):
                    for i in range(3):
                        xs_o[k, i, 0] = dxs[k, i]
                    for i in range(2):
                        km = jnp.minimum(k, N - 1)
                        us_o[km, i, 0] = dus[km, i]
                    return ()

                jax.lax.fori_loop(0, N + 1, dbg, ())
                dt_o[0, 0] = scal[7]
                for r_ in (rho_o, cost_o, eq_o, in_o, cv_o):
                    r_[0, 0] = zero
                return

            # ---------- line search ---------------------------------------- #
            dtau = scal[7]
            if nonu:
                # tightest per-stage trust cap; each stage's scale floored
                # at dt_ref (al_sqp._sqp_iteration dt_scale note)
                def capk(k, cmin):
                    dsc = jnp.maximum(dts[k], dt_ref)
                    ck = jnp.where(
                        jnp.abs(dtaus[k]) > 0.0,
                        jnp.minimum(
                            1.0,
                            dt_trust_frac * dsc
                            / jnp.maximum(jnp.abs(dtaus[k]), 1e-30),
                        ),
                        1.0,
                    )
                    return jnp.minimum(cmin, ck)

                cap = jax.lax.fori_loop(0, N, capk, one)
            else:
                cap = jnp.where(
                    jnp.abs(dtau) > 0.0,
                    jnp.minimum(
                        1.0,
                        dt_trust_frac * scal[0] / jnp.maximum(jnp.abs(dtau), 1e-30),
                    ),
                    1.0,
                )
            best_m = zero + _F32_MAX
            best_a = zero
            accepted = zero
            for aj in alphas:
                al = aj * cap
                m = merit_candidate(al, rho)
                m = jnp.where(jnp.isfinite(m), m, jnp.inf)
                better = m < best_m
                best_m = jnp.where(better, m, best_m)
                best_a = jnp.where(better, al, best_a)
                accepted = jnp.where(better, one, accepted)
            # alpha = 0 candidate (merit clamped to f32 max)
            m0 = jnp.minimum(merit_candidate(zero, rho), _F32_MAX)
            m0 = jnp.where(jnp.isfinite(m0), m0, _F32_MAX)
            better = m0 < best_m
            best_a = jnp.where(better, zero, best_a)
            accepted = jnp.where(better, zero, accepted)

            # apply the winning candidate
            def apply(k, _):
                for i in range(2):
                    xs_o[k, i, 0] = xs_o[k, i, 0] + best_a * dxs[k, i]
                    # us has only N rows — guard the k = N pass (an
                    # unconditional min()-clamped write would double-add
                    # the increment to row N-1)
                    km = jnp.minimum(k, N - 1)
                    inc = jnp.where(k < N, best_a * dus[km, i], 0.0)
                    us_o[km, i, 0] = us_o[km, i, 0] + inc
                xs_o[k, 2, 0] = _wrap(xs_o[k, 2, 0] + best_a * dxs[k, 2])
                return ()

            jax.lax.fori_loop(0, N + 1, apply, ())
            if nonu:
                def apply_dt(k, _):
                    dts[k] = jnp.clip(dts[k] + best_a * dtaus[k], dt_lo, dt_hi)
                    return ()

                jax.lax.fori_loop(0, N, apply_dt, ())
            else:
                scal[0] = jnp.clip(scal[0] + best_a * scal[7], dt_lo, dt_hi)

            reg = jnp.where(
                accepted > 0.5,
                jnp.maximum(reg * reg_shrink, reg_min),
                jnp.minimum(jnp.maximum(reg, reg0) * reg_grow, reg_max),
            )

        # ---------------- dual update (phase end) -------------------------- #
        rho = scal[1]
        dtv = scal[0]

        def dual_body(k, carry):
            if nonu:
                eq_m, in_m, tprev = carry
                dtv_k = dts[k]
                t_k1 = tprev + dtv_k
            else:
                eq_m, in_m = carry
                dtv_k = dtv
                t_k1 = None
            xk, uk, xk1 = read_x(k), read_u(k), read_x(k + 1)
            up = read_uprev(k)
            c, _, _, _, _ = defect(xk, uk, xk1, dtv_k)
            for i in range(3):
                ld_o[k, i, 0] = ld_o[k, i, 0] + rho * c[i]
                eq_m = jnp.maximum(eq_m, jnp.abs(c[i]))
            gs, _ = obs_terms(
                xk1, k + 1, dt_pred=dtv_k, need_grad=False, t_override=t_k1
            )
            for j in range(M):
                mo_o[k, j, 0] = jnp.maximum(0.0, mo_o[k, j, 0] + rho * gs[j])
                in_m = jnp.maximum(in_m, gs[j])
            g_r = rate_g(uk, up, dtv_k)
            for i in range(4):
                mr_o[k, i, 0] = jnp.maximum(0.0, mr_o[k, i, 0] + rho * g_r[i])
                in_m = jnp.maximum(in_m, g_r[i])
            g_b = box_g(uk)
            for i in range(4):
                mb_o[k, i, 0] = jnp.maximum(0.0, mb_o[k, i, 0] + rho * g_b[i])
                in_m = jnp.maximum(in_m, g_b[i])
            if nonu:
                # per-interval dt box rows (stage-owned on this grid)
                for i, g in enumerate([dtv_k - dt_max, dt_min - dtv_k]):
                    md_o[k, i, 0] = jnp.maximum(0.0, md_o[k, i, 0] + rho * g)
                    in_m = jnp.maximum(in_m, g)
                return eq_m, in_m, t_k1
            return eq_m, in_m

        if nonu:
            eq_m, in_m, _tN = jax.lax.fori_loop(
                0, N, dual_body, (zero, zero, zero)
            )
        else:
            eq_m, in_m = jax.lax.fori_loop(0, N, dual_body, (zero, zero))
        te = term_eq(read_x(N))
        for i in range(3):
            if xf_fixed[i]:
                lt_o[i, 0] = lt_o[i, 0] + rho * te[i]
                eq_m = jnp.maximum(eq_m, jnp.abs(te[i]))
            else:
                lt_o[i, 0] = zero
        if ball_r > 0.0:
            gb, _ = ball_g(read_x(N))
            mball_o[0, 0] = jnp.maximum(0.0, mball_o[0, 0] + rho * gb)
            in_m = jnp.maximum(in_m, gb)
        else:
            # disabled ball: the XLA path still updates against the inactive
            # −BIG row, which clamps any (pathological) nonzero input to 0
            mball_o[0, 0] = jnp.maximum(0.0, mball_o[0, 0] - rho * _BIG)
        if not nonu:
            g_d = dt_g(dtv)
            for i in range(2):
                if variable_dt:
                    md_o[i, 0] = jnp.maximum(0.0, md_o[i, 0] + rho * g_d[i])
                in_m = jnp.maximum(in_m, g_d[i])
        in_m = jnp.maximum(in_m, 0.0)

        viol = jnp.maximum(eq_m, in_m)
        grow = jnp.logical_or(
            viol > viol_decrease_req * scal[6], viol > 0.05 * tol_eq
        )
        scal[1] = jnp.where(grow, jnp.minimum(rho * rho_growth, rho_max), rho)
        scal[6] = viol
        scal[8] = eq_m
        scal[9] = in_m

        # best-feasible snapshot
        okc = jnp.logical_and(eq_m < tol_eq, in_m < tol_ineq).astype(f32)

        def snap(k, _):
            for i in range(3):
                bxs[k, i] = jnp.where(okc > 0.5, xs_o[k, i, 0], bxs[k, i])
            for i in range(2):
                km = jnp.minimum(k, N - 1)
                bus[km, i] = jnp.where(okc > 0.5, us_o[km, i, 0], bus[km, i])
            return ()

        jax.lax.fori_loop(0, N + 1, snap, ())
        if nonu:
            def snap_dt(k, _):
                bdts[k] = jnp.where(okc > 0.5, dts[k], bdts[k])
                return ()

            jax.lax.fori_loop(0, N, snap_dt, ())
        else:
            scal[2] = jnp.where(okc > 0.5, scal[0], scal[2])
        scal[3] = jnp.where(okc > 0.5, eq_m, scal[3])
        scal[4] = jnp.where(okc > 0.5, in_m, scal[4])
        scal[5] = jnp.maximum(scal[5], okc)

    # ---- final selection + outputs ---------------------------------------- #
    eq_f, in_f = scal[8], scal[9]
    final_ok = jnp.logical_and(eq_f < tol_eq, in_f < tol_ineq)
    use_best = jnp.logical_and(scal[5] > 0.5, jnp.logical_not(final_ok)).astype(f32)

    # jnp.where (not an arithmetic blend): the snapshot buffers are
    # uninitialized garbage on lanes that never found a feasible iterate,
    # and 0 * NaN = NaN would poison the final primal there.
    ub = use_best > 0.5

    def sel(k, _):
        for i in range(3):
            xs_o[k, i, 0] = jnp.where(ub, bxs[k, i], xs_o[k, i, 0])
        for i in range(2):
            km = jnp.minimum(k, N - 1)
            us_o[km, i, 0] = jnp.where(ub, bus[km, i], us_o[km, i, 0])
        return ()

    jax.lax.fori_loop(0, N + 1, sel, ())
    if nonu:
        # per-stage final dt selection; dt_fin carries Σ dt for the cost
        def sel_dt(k, acc):
            dk = jnp.where(ub, bdts[k], dts[k])
            dts[k] = dk
            dt_o[k, 0, 0] = dk
            return acc + dk

        dt_sum = jax.lax.fori_loop(0, N, sel_dt, zero)
        dt_fin = None
    else:
        dt_fin = jnp.where(ub, scal[2], scal[0])
        dt_o[0, 0] = dt_fin
    rho_o[0, 0] = scal[1]
    eq_o[0, 0] = jnp.where(ub, scal[3], eq_f)
    in_o[0, 0] = jnp.where(ub, scal[4], in_f)
    cv_o[0, 0] = jnp.logical_or(final_ok, scal[5] > 0.5).astype(f32)
    if mt_like:
        cost = dt_sum if nonu else float(N) * dt_fin
        if objective == "minimum_time_via_points":
            cost = cost + via_sweep(read_x, want_cost=True)
    else:
        # full quadratic objective at the SELECTED primal (al_sqp evaluates
        # funcs.cost after the best-feasible selection)
        if nonu:
            def cost_body(k, carry):
                acc, dtp = carry
                dk = dts[k]
                c = stage_cost(read_x(k), read_u(k), dk, k, dtp=dtp)
                return acc + (c if not _isc(c) else zero + c), dk

            cost, dt_last_f = jax.lax.fori_loop(0, N, cost_body, (zero, zero))
        else:
            def cost_body(k, acc):
                c = stage_cost(read_x(k), read_u(k), dt_fin, k)
                return acc + (c if not _isc(c) else zero + c)

            cost = jax.lax.fori_loop(0, N, cost_body, zero)
            dt_last_f = dt_fin
        if integral_form and trapezoidal:
            x_term, _ = quad_terms(goal_dx(read_x(N)), [0.0, 0.0])
            cost = cost + _mul(_mul(0.5, x_term), dt_last_f)
    if qf is not None:
        xN = read_x(N)
        dxq = goal_dx(xN)
        cost = cost + sum(qf[i] * dxq[i] * dxq[i] for i in range(3))
    cost_o[0, 0] = cost


# --------------------------------------------------------------------------- #
# host-side wrapper
# --------------------------------------------------------------------------- #
def _to_tiles(a, batch):
    pad = (-batch) % BT
    if pad:
        a = jnp.concatenate([a, jnp.zeros((pad,) + a.shape[1:], a.dtype)], axis=0)
    a = jnp.moveaxis(a, 0, -1)
    return a.reshape(a.shape[:-1] + (-1, SUBLANES, LANES))


def _from_tiles(a, batch):
    a = a.reshape(a.shape[:-3] + (-1,))
    a = jnp.moveaxis(a, -1, 0)
    return a[:batch]


def _circle_slots(obs, batch, dtype):
    """Flatten point + circle slots into (B, M, 2) centers / (B, M) radii,
    (B, M) masks, (B, M, 2) velocities. Points are circles of radius zero
    (same distance kernel)."""
    centers = []
    radii = []
    masks = []
    vels = []
    if obs.points.shape[-2]:
        centers.append(obs.points)
        radii.append(jnp.zeros(obs.points.shape[:-1], dtype))
        masks.append(obs.point_mask)
        vels.append(obs.point_vels)
    if obs.circles.shape[-2]:
        centers.append(obs.circles)
        radii.append(obs.circle_radii)
        masks.append(obs.circle_mask)
        vels.append(obs.circle_vels)
    if not centers:
        z2 = jnp.zeros((batch, 0, 2), dtype)
        return z2, jnp.zeros((batch, 0), dtype), jnp.zeros((batch, 0), bool), z2
    return (
        jnp.concatenate(centers, axis=-2),
        jnp.concatenate(radii, axis=-1),
        jnp.concatenate(masks, axis=-1),
        jnp.concatenate(vels, axis=-2),
    )


def fused_obstacles_supported(scenario) -> bool:
    """All four slot families (point/circle/line/polygon) are kernel-scoped;
    polygons are bounded at 16 padded vertices to keep the fully-unrolled
    per-edge geometry within a sane program size (wider pads fall back)."""
    o = scenario.obstacles
    return o.polygons.shape[-3] == 0 or o.polygons.shape[-2] <= 16


@functools.partial(
    jax.jit, static_argnames=("spec", "settings", "interpret", "debug_step")
)
def fused_solve(
    spec, settings, scenario, init, duals,
    interpret: bool = False, debug_step: bool = False,
):
    """Whole-solve fused kernel over a leading scenario batch.

    Same contract as vmap(solve_single): returns a SolveResult whose duals
    carry mu_ball unchanged (inactive in this scope).
    """
    from mpc_local_planner_tpu.solvers.al_sqp import DualState, SolveResult
    from mpc_local_planner_tpu.ocp.grid import Primal

    B = scenario.x0.shape[0]
    N, M = spec.N, spec.obstacle_cap
    f32 = jnp.float32
    obs = scenario.obstacles
    oc, orr, om, ovl = _circle_slots(obs, B, f32)
    mpc = oc.shape[-2]
    ml = obs.lines.shape[-3]
    mg = obs.polygons.shape[-3]
    V = obs.polygons.shape[-2] if mg else 0
    if mpc + ml + mg != M:
        raise ValueError(
            f"fused kernel: {mpc}+{ml}+{mg} obstacle slots != obstacle_cap {M}"
        )
    mu_obs_in = duals.mu_obs
    if M == 0:
        # obstacle-free spec: the kernel still wants non-zero-size tiles, so
        # run it with ONE masked dummy slot (g = min_dist − BIG never
        # activates — exact no-op, matching the XLA path's absent term) and
        # slice the multiplier rows back to width 0 on the way out.
        M = mpc = 1
        oc = jnp.zeros((B, 1, 2), f32)
        orr = jnp.zeros((B, 1), f32)
        om = jnp.zeros((B, 1), bool)
        ovl = jnp.zeros((B, 1, 2), f32)
        mu_obs_in = jnp.zeros((B, N, 1), f32)
    nonu = bool(spec.nonuniform_dt)
    if nonu:
        # per-stage dt: (B, N); mu_dt flat (B, 2N) -> (B, N, 2) stage rows
        dt_in = jnp.broadcast_to(jnp.asarray(init.dt, f32), (B, N))
        mu_dt_in = duals.mu_dt.reshape(B, N, 2)
    else:
        dt_in = jnp.broadcast_to(jnp.asarray(init.dt, f32), (B,))[:, None]
        mu_dt_in = duals.mu_dt

    # positional input layout (matches the kernel's unpack): base, per-family
    # obstacle arrays (present only for non-empty families), warm duals
    arrays = [init.xs, init.us, dt_in, scenario.xf, scenario.u_prev]
    if mpc:
        arrays += [oc, orr[..., None] * 1.0, om.astype(f32)[..., None] * 1.0, ovl]
    if ml:
        arrays += [
            obs.lines,
            obs.line_mask.astype(f32)[..., None] * 1.0,
            obs.line_vels,
        ]
    if mg:
        arrays += [
            obs.polygons,
            obs.polygon_nv.astype(f32)[..., None] * 1.0,
            obs.polygon_mask.astype(f32)[..., None] * 1.0,
            obs.polygon_vels,
        ]
    mv = spec.via_cap if spec.objective == "minimum_time_via_points" else 0
    if mv:
        arrays += [
            scenario.via_points,
            scenario.via_mask.astype(f32)[..., None] * 1.0,
        ]
    arrays += [
        duals.lam_def, duals.lam_term, mu_obs_in, duals.mu_rate,
        duals.mu_box, mu_dt_in, duals.mu_ball, duals.rho[:, None],
    ]
    tiled = [_to_tiles(jnp.asarray(a, f32), B) for a in arrays]
    G = tiled[0].shape[-3]

    # static kernel parameters: force concrete evaluation even when the
    # caller wrapped fused_solve in an outer jit (control_box builds jnp
    # arrays, which would otherwise be tracers here)
    with jax.ensure_compile_time_eval():
        lo_u, hi_u = spec.control_box()
        lo_r, hi_r = spec.control_rate_box()
        lo_u = tuple(float(v) for v in lo_u)
        hi_u = tuple(float(v) for v in hi_u)
        lo_r = tuple(float(v) for v in lo_r)
        hi_r = tuple(float(v) for v in hi_r)
    qf = tuple(float(q) for q in spec.qf_diag) if spec.qf_diag is not None else None
    model = {
        UnicycleModel: "unicycle",
        SimpleCarModel: "simple_car",
        SimpleCarFrontWheelDrivingModel: "front_wheel",
        KinematicBicycleModelVelocityInput: "bicycle",
    }[type(spec.model)]
    fp_circles, fp_seg, fp_poly = _footprint_static(spec.footprint)

    kernel = functools.partial(
        _fused_kernel,
        N=N, M=M, mpc=mpc, ml=ml, mg=mg, V=V, mv=mv, model=model,
        colloc=spec.collocation,
        via_pw=float(spec.via_position_weight),
        via_ow=float(spec.via_orientation_weight),
        via_ordered=bool(spec.via_points_ordered),
        wheelbase=float(getattr(spec.model, "wheelbase", 1.0)),
        bike_lf=float(getattr(spec.model, "lf", 0.25)),
        bike_lr=float(getattr(spec.model, "lr", 0.25)),
        dynamic=bool(spec.enable_dynamic_obstacles),
        nonu=nonu, dt_prox=float(settings.dt_prox) if nonu else 0.0,
        fp_circles=fp_circles, fp_seg=fp_seg, fp_poly=fp_poly,
        lo_u=lo_u, hi_u=hi_u, lo_r=lo_r, hi_r=hi_r,
        min_dist=float(spec.min_obstacle_dist),
        xf_fixed=tuple(bool(b) for b in spec.xf_fixed),
        variable_dt=bool(spec.variable_dt),
        dt_min=float(spec.dt_min), dt_max=float(spec.dt_max),
        dt_ref=float(spec.dt_ref), qf=qf,
        objective=spec.objective,
        q_diag=tuple(float(q) for q in spec.q_diag),
        r_diag=tuple(float(r) for r in spec.r_diag),
        integral_form=bool(spec.integral_form),
        trapezoidal=spec.cost_integration == "trapezoidal",
        hybrid_w=float(spec.hybrid_time_weight),
        ball_w=tuple(float(w) for w in spec.ball_weights),
        ball_r=float(spec.ball_radius),
        n_al=settings.n_al, n_sqp=settings.n_sqp,
        alphas=tuple(float(a) for a in settings.alphas),
        dt_trust_frac=float(settings.dt_trust_frac),
        rho0=float(settings.rho0), rho_growth=float(settings.rho_growth),
        rho_max=float(settings.rho_max),
        reg0=float(settings.reg0), reg_shrink=float(settings.reg_shrink),
        reg_grow=float(settings.reg_grow), reg_min=float(settings.reg_min),
        reg_max=float(settings.reg_max),
        viol_decrease_req=float(settings.viol_decrease_req),
        tol_eq=float(settings.tol_eq), tol_ineq=float(settings.tol_ineq),
        debug_step=debug_step,
    )

    def spec_of(a):
        blk = a.shape[:-3] + (1, SUBLANES, LANES)
        nlead = len(a.shape) - 3
        return pl.BlockSpec(
            blk, (lambda g, _n=nlead: (0,) * _n + (g, 0, 0)),
            memory_space=pltpu.VMEM,
        )

    def oshape(*lead):
        return jax.ShapeDtypeStruct(lead + (G, SUBLANES, LANES), f32)

    out_shapes = [
        oshape(N + 1, 3), oshape(N, 2),                      # xs, us
        oshape(N, 1) if nonu else oshape(1),                 # dt
        oshape(N, 3), oshape(3), oshape(N, M),               # lam_def, lam_term, mu_obs
        oshape(N, 4), oshape(N, 4),                          # mu_rate, mu_box
        oshape(N, 2) if nonu else oshape(2),                 # mu_dt
        oshape(1), oshape(1),                                # mu_ball, rho
        oshape(1), oshape(1), oshape(1), oshape(1),          # cost, eq, ineq, conv
    ]
    outs = pl.pallas_call(
        kernel,
        grid=(G,),
        in_specs=[spec_of(a) for a in tiled],
        out_specs=[spec_of(s) for s in out_shapes],
        out_shape=out_shapes,
        scratch_shapes=[
            pltpu.VMEM((6, 6, SUBLANES, LANES), f32),            # P
            pltpu.VMEM((6, SUBLANES, LANES), f32),               # pv / z
            pltpu.VMEM((N, 3 if nonu else 2, 6, SUBLANES, LANES), f32),  # K tape
            pltpu.VMEM((N, 3 if nonu else 2, SUBLANES, LANES), f32),     # kff tape
            pltpu.VMEM((N + 1, 3, SUBLANES, LANES), f32),        # dxs
            pltpu.VMEM((N, 2, SUBLANES, LANES), f32),            # dus
            pltpu.VMEM((N + 1, 3, SUBLANES, LANES), f32),        # best xs
            pltpu.VMEM((N, 2, SUBLANES, LANES), f32),            # best us
            pltpu.VMEM((10, SUBLANES, LANES), f32),              # scalars
        ]
        + ([pltpu.VMEM((mv, SUBLANES, LANES), f32)] if mv else [])   # via ks
        + (
            [
                pltpu.VMEM((N, SUBLANES, LANES), f32),   # dts (working)
                pltpu.VMEM((N, SUBLANES, LANES), f32),   # best dts
                pltpu.VMEM((N, SUBLANES, LANES), f32),   # per-stage dtau
                pltpu.VMEM((N + 1, SUBLANES, LANES), f32),  # hoisted t_i
            ]
            if nonu
            else []
        ),
        interpret=interpret,
        # the whole-solve scratch (K tapes + step/snapshot buffers) sits in
        # scoped VMEM; at SUBLANES=8 the non-uniform variant's wider tapes
        # cross the default 16 MiB scoped limit — raise it (v5e VMEM is
        # 128 MiB; the kernel peaks well under 32)
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=64 * 1024 * 1024),
    )(*tiled)

    xs, us, dt, ld, lt, mo, mr, mb, md, mball, rho, cost, eq, ineq, conv = outs
    ft = lambda a: _from_tiles(a, B)  # noqa: E731
    dtype = init.xs.dtype
    if nonu:
        dt_out = ft(dt)[..., 0].astype(dtype)               # (B, N)
        md_out = ft(md).reshape(B, 2 * N).astype(dtype)     # back to flat
    else:
        dt_out = ft(dt)[..., 0].astype(dtype)
        md_out = ft(md).astype(dtype)
    return SolveResult(
        primal=Primal(
            xs=ft(xs).astype(dtype), us=ft(us).astype(dtype),
            dt=dt_out,
        ),
        duals=DualState(
            lam_def=ft(ld).astype(dtype), lam_term=ft(lt).astype(dtype),
            mu_obs=ft(mo)[..., : spec.obstacle_cap].astype(dtype),
            mu_rate=ft(mr).astype(dtype),
            mu_box=ft(mb).astype(dtype), mu_dt=md_out,
            mu_ball=ft(mball).astype(dtype), rho=ft(rho)[..., 0].astype(dtype),
        ),
        cost=ft(cost)[..., 0].astype(dtype),
        eq_norm=ft(eq)[..., 0].astype(dtype),
        ineq_viol=ft(ineq)[..., 0].astype(dtype),
        converged=ft(conv)[..., 0] > 0.5,
    )
