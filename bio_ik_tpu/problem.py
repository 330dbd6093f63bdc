"""Problem compilation and fitness evaluation.

TPU-native counterpart of the reference's ``Problem``
(reference: src/problem.h:118-136, src/problem.cpp:72-341).

A goal list compiles into:
  * a deduped ordered tip-link list (reference: addTipLink, problem.cpp:57-65),
  * the active-variable set (joint group minus fixed joints, plus variables
    referenced by goals; reference: problem.cpp:102-204),
  * per-goal-kind struct-of-arrays batches ("goals as data") evaluated by
    vectorized kernels, split into primary and secondary groups
    (reference: problem.cpp:181-184),
  * velocity-normalized displacement factors (reference: problem.cpp:206-225),
  * a vectorized acceptance test (reference: checkSolutionActiveVariables,
    problem.cpp:259-341).

Structure (which kinds, how many instances, which tips/variables) is
static per Problem — it specializes the jitted graph.  Numeric goal
parameters (targets, weights, the seed) live in a ``data`` pytree produced
by :meth:`Problem.make_data`, so targets can change per solve (and carry a
scenario batch dimension) without recompilation.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field
from typing import Any, Callable, Dict, List, Optional, Sequence, Tuple

import numpy as np
import jax.numpy as jnp

from . import goals as G
from .config import SolverConfig, DEFAULT_CONFIG
from .math.frame import Frame
from .math.quat import (
    quat_angle_shortest,
    quat_conj,
    quat_mul,
    quat_rotate,
    quat_to_rotvec_wrapped,
)
from .robot.model import RobotModel

__all__ = ["Problem", "GoalGroup"]


def _norm(v):
    v = np.asarray(v, dtype=np.float64)
    n = np.linalg.norm(v)
    return v / n if n > 0 else v


@dataclass
class GoalGroup:
    """One vectorized batch of same-kind goals."""

    kind: str
    # static structure
    tip_slots: np.ndarray = field(default_factory=lambda: np.zeros(0, np.int64))
    static: Dict[str, Any] = field(default_factory=dict)
    # numeric parameter template (numpy; becomes part of the data pytree)
    params: Dict[str, np.ndarray] = field(default_factory=dict)
    weight_sq: np.ndarray = field(default_factory=lambda: np.zeros(0))
    # acceptance classification (reference: problem.cpp:153-176)
    goal_type: str = "unknown"  # position | orientation | pose | unknown

    @property
    def count(self) -> int:
        return len(self.weight_sq)


class Problem:
    """A compiled IK problem for one robot + goal structure."""

    def __init__(
        self,
        model: RobotModel,
        goal_list: Sequence[G.Goal],
        fixed_joints: Sequence[str] = (),
        active_variables: Optional[Sequence[int]] = None,
        config: SolverConfig = DEFAULT_CONFIG,
    ):
        self.model = model
        self.config = config
        self.goal_list = list(goal_list)
        dtype = np.dtype(config.dtype)
        self.dtype = dtype

        # ---- tip link discovery (dedupe, order-preserving) --------------
        tip_links: List[str] = []

        def tip_slot(link: str) -> int:
            if link not in model.link_index:
                raise ValueError(f"unknown link {link!r}")
            if link not in tip_links:
                tip_links.append(link)
            return tip_links.index(link)

        # ---- active variables -------------------------------------------
        if active_variables is None:
            active = list(model.actuated_variables(exclude_fixed_joints=fixed_joints))
        else:
            active = list(active_variables)
        fixed = set(fixed_joints)
        # variables referenced by goals join the active set
        # (reference: problem.cpp:102-204)
        for g in self.goal_list:
            names: Tuple[str, ...] = ()
            if isinstance(g, G.JointVariableGoal):
                names = (g.variable_name,)
            elif isinstance(g, G.JointFunctionGoal):
                names = tuple(g.variable_names)
            for n in names:
                if n not in model.var_index:
                    raise ValueError(f"unknown variable {n!r}")
                v = model.var_index[n]
                joint_of_v = None
                for li, vs in enumerate(model.vstart):
                    if vs >= 0 and vs <= v < vs + model.vcount[li]:
                        joint_of_v = model.joint_names[li]
                if v not in active and joint_of_v not in fixed:
                    active.append(v)
        self.active_vars = active
        V = len(active)
        av = np.asarray(active, dtype=np.int64)

        # ---- per-active-variable device constants ------------------------
        b = model._np_bounds
        self.amin = jnp.asarray(b["min"][av], dtype)
        self.amax = jnp.asarray(b["max"][av], dtype)
        self.aclip_min = jnp.asarray(b["clip_min"][av], dtype)
        self.aclip_max = jnp.asarray(b["clip_max"][av], dtype)
        self.aspan = jnp.asarray(b["span"][av], dtype)
        self.amid = jnp.asarray(0.5 * (b["min"][av] + b["max"][av]), dtype)
        self.abounded = jnp.asarray(np.isfinite(b["clip_max"][av]), dtype)
        # velocity-normalized displacement factors
        # (reference: problem.cpp:206-225)
        rcp = b["max_velocity_rcp"][av]
        s = rcp.sum()
        factors = rcp / s if s > 0 else np.full(V, 1.0 / max(V, 1))
        self.velocity_weights = jnp.asarray(factors, dtype)

        # ---- compile goals into groups -----------------------------------
        self.primary: List[GoalGroup] = []
        self.secondary: List[GoalGroup] = []
        pending: Dict[Tuple[str, bool], List[Tuple[G.Goal, int]]] = {}

        def var_slot(name: str) -> Tuple[int, int]:
            v = model.var_index[name]
            slot = active.index(v) if v in active else -1
            return slot, v

        for g in self.goal_list:
            if g.secondary and not isinstance(
                g,
                (
                    G.AvoidJointLimitsGoal,
                    G.CenterJointsGoal,
                    G.RegularizationGoal,
                    G.MinimalDisplacementGoal,
                    G.JointVariableGoal,
                    G.JointFunctionGoal,
                ),
            ):
                raise ValueError(
                    f"secondary goals must be joint-space goals, got {type(g).__name__}"
                )
            kind = _KIND_OF[type(g)]
            slot = tip_slot(g.link) if hasattr(g, "link") and g.link else -1
            pending.setdefault((kind, g.secondary), []).append((g, slot))

        # builders may register additional tips (BalanceGoal)
        self.tip_links_builder = tip_links
        for (kind, secondary), items in pending.items():
            builder = _BUILDERS[kind]
            groups = builder(self, items)
            for grp in groups:
                (self.secondary if secondary else self.primary).append(grp)

        self.tip_links = tip_links
        self.ntips = len(tip_links)

        # acceptance thresholds
        self.dpos = config.dpos
        self.drot = config.drot
        self.dtwist = config.dtwist

    # ------------------------------------------------------------------
    def make_data(self, q_seed_full) -> Dict[str, Any]:
        """Build the numeric data pytree for one solve.

        ``q_seed_full (Vfull,)`` is the initial guess / seed state
        (reference: problem.initial_guess, kinematics_plugin.cpp:506-507).
        Goal parameters are copied from the compiled goal list; callers may
        functionally update entries (e.g. new targets) between solves, or
        stack a leading scenario-batch axis on every leaf.
        """
        q_seed_full = jnp.asarray(q_seed_full, self.dtype)
        av = np.asarray(self.active_vars, dtype=np.int64)
        data = {
            "seed_full": q_seed_full,
            "seed_active": q_seed_full[..., av],
            "primary": [
                {k: jnp.asarray(v, self.dtype) for k, v in grp.params.items()}
                | {"weight_sq": jnp.asarray(grp.weight_sq, self.dtype)}
                for grp in self.primary
            ],
            "secondary": [
                {k: jnp.asarray(v, self.dtype) for k, v in grp.params.items()}
                | {"weight_sq": jnp.asarray(grp.weight_sq, self.dtype)}
                for grp in self.secondary
            ],
        }
        return data

    # ------------------------------------------------------------------
    def fitness(self, tips, qa, data):
        """Primary fitness ``Σ weight²·e`` (reference: problem.cpp:251-257).

        ``tips (..., T, 7)`` packed (possibly raw linearizer output),
        ``qa (..., V)`` active variable values.
        """
        total = jnp.zeros(qa.shape[:-1], self.dtype)
        for grp, gdata in zip(self.primary, data["primary"]):
            e = _EVALUATORS[grp.kind](self, grp, gdata, tips, qa, data)
            total = total + jnp.sum(gdata["weight_sq"] * e, axis=-1)
        return total

    def fitness_secondary(self, qa, data):
        """Secondary fitness on joint variables only
        (reference: ik_base.h:163-185 — evaluated against null tip frames).
        """
        total = jnp.zeros(qa.shape[:-1], self.dtype)
        for grp, gdata in zip(self.secondary, data["secondary"]):
            e = _EVALUATORS[grp.kind](self, grp, gdata, None, qa, data)
            total = total + jnp.sum(gdata["weight_sq"] * e, axis=-1)
        return total

    def fitness_combined(self, tips, qa, data):
        return self.fitness(tips, qa, data) + self.fitness_secondary(qa, data)

    @property
    def has_secondary(self) -> bool:
        return bool(self.secondary)

    # ------------------------------------------------------------------
    def check_solution(self, tips_frame: Frame, qa, data):
        """Vectorized tolerance acceptance test
        (reference: checkSolutionActiveVariables, problem.cpp:259-341).

        ``tips_frame`` must come from **exact** FK.  Returns a boolean with
        the broadcast batch shape.
        """
        dpos, drot, dtwist = self.dpos, self.drot, self.dtwist
        ok = jnp.ones(tips_frame.pos.shape[:-2], dtype=bool)
        tips = jnp.concatenate([tips_frame.pos, tips_frame.quat], axis=-1)

        for grp, gdata in zip(self.primary, data["primary"]):
            slots = grp.tip_slots
            if grp.goal_type in ("position", "pose"):
                tp = tips_frame.pos[..., slots, :]
                dp = tp - gdata["position"]
                if math.isfinite(dpos):
                    ok &= jnp.all(
                        jnp.linalg.norm(dp, axis=-1) <= dpos, axis=-1
                    )
            if grp.goal_type in ("orientation", "pose"):
                tq = tips_frame.quat[..., slots, :]
                gq = gdata["orientation"]
                if math.isfinite(drot):
                    ang = quat_angle_shortest(tq, gq) * (180.0 / math.pi)
                    ok &= jnp.all(ang <= drot, axis=-1)
            if grp.goal_type != "unknown":
                if math.isfinite(dtwist):
                    # twist of goal⁻¹·tip in goal coordinates, component-wise
                    # |·| ≤ dtwist (KDL::Equal semantics; reference
                    # problem.cpp:276-322, frame.h:240-259)
                    gq = gdata.get("orientation")
                    gp = gdata["position"]
                    tq = tips_frame.quat[..., slots, :]
                    tp = tips_frame.pos[..., slots, :]
                    if gq is None:
                        vel = tp - gp
                        comps = [vel] if grp.goal_type == "position" else []
                    else:
                        gq_inv = quat_conj(gq)
                        vel = quat_rotate(gq_inv, tp - gp)
                        rot = quat_to_rotvec_wrapped(quat_mul(gq_inv, tq))
                        if grp.goal_type == "pose":
                            comps = [vel, rot]
                        elif grp.goal_type == "orientation":
                            comps = [rot]
                        else:
                            comps = [vel]
                    for c in comps:
                        ok &= jnp.all(jnp.abs(c) <= dtwist, axis=(-2, -1))
            else:
                dmax = min(dpos, dtwist)
                if math.isfinite(dmax):
                    e = _EVALUATORS[grp.kind](self, grp, gdata, tips, qa, data)
                    ok &= jnp.all(gdata["weight_sq"] * e < dmax * dmax, axis=-1)
        return ok


# ==========================================================================
# goal kind registry: builders (host-side compile) + evaluators (traced)
# ==========================================================================

_KIND_OF = {
    G.PositionGoal: "position",
    G.OrientationGoal: "orientation",
    G.PoseGoal: "pose",
    G.LookAtGoal: "lookat",
    G.MaxDistanceGoal: "max_distance",
    G.MinDistanceGoal: "min_distance",
    G.LineGoal: "line",
    G.PlaneGoal: "plane",
    G.TouchGoal: "touch",
    G.SideGoal: "side",
    G.DirectionGoal: "direction",
    G.ConeGoal: "cone",
    G.LinkFunctionGoal: "link_function",
    G.AvoidJointLimitsGoal: "avoid_joint_limits",
    G.CenterJointsGoal: "center_joints",
    G.RegularizationGoal: "regularization",
    G.MinimalDisplacementGoal: "minimal_displacement",
    G.JointVariableGoal: "joint_variable",
    G.JointFunctionGoal: "joint_function",
    G.BalanceGoal: "balance",
}

_BUILDERS: Dict[str, Callable] = {}
_EVALUATORS: Dict[str, Callable] = {}


def _builder(kind, goal_type="unknown"):
    def deco(fn):
        def build(problem, items):
            groups = fn(problem, items)
            for grp in groups:
                grp.kind = kind
                grp.goal_type = goal_type
            return groups

        _BUILDERS[kind] = build
        return fn

    return deco


def _evaluator(kind):
    def deco(fn):
        _EVALUATORS[kind] = fn
        return fn

    return deco


def _simple_group(items, **param_fns) -> GoalGroup:
    grp = GoalGroup(kind="")
    grp.tip_slots = np.asarray([slot for _, slot in items], dtype=np.int64)
    grp.weight_sq = np.asarray([g.weight**2 for g, _ in items])
    for name, fn in param_fns.items():
        grp.params[name] = np.stack([np.asarray(fn(g), np.float64) for g, _ in items])
    return grp


def _tip_pq(tips, grp):
    return tips[..., grp.tip_slots, 0:3], tips[..., grp.tip_slots, 3:7]


def _normalize_rows(v, eps=1e-12):
    return v / jnp.maximum(jnp.linalg.norm(v, axis=-1, keepdims=True), eps)


# ---- position / orientation / pose ---------------------------------------


@_builder("position", goal_type="position")
def _build_position(problem, items):
    return [_simple_group(items, position=lambda g: g.position)]


@_evaluator("position")
def _eval_position(problem, grp, gdata, tips, qa, data):
    tp, _ = _tip_pq(tips, grp)
    return jnp.sum(jnp.square(tp - gdata["position"]), axis=-1)


@_builder("orientation", goal_type="orientation")
def _build_orientation(problem, items):
    return [_simple_group(items, orientation=lambda g: _norm(g.orientation))]


def _quat_err_sq(tq, gq):
    dm = jnp.sum(jnp.square(tq - gq), axis=-1)
    dp = jnp.sum(jnp.square(tq + gq), axis=-1)
    return jnp.minimum(dm, dp)


@_evaluator("orientation")
def _eval_orientation(problem, grp, gdata, tips, qa, data):
    _, tq = _tip_pq(tips, grp)
    return _quat_err_sq(tq, gdata["orientation"])


@_builder("pose", goal_type="pose")
def _build_pose(problem, items):
    return [
        _simple_group(
            items,
            position=lambda g: g.position,
            orientation=lambda g: _norm(g.orientation),
            rotation_scale_sq=lambda g: g.rotation_scale**2,
        )
    ]


@_evaluator("pose")
def _eval_pose(problem, grp, gdata, tips, qa, data):
    tp, tq = _tip_pq(tips, grp)
    ep = jnp.sum(jnp.square(tp - gdata["position"]), axis=-1)
    er = _quat_err_sq(tq, gdata["orientation"])
    return ep + gdata["rotation_scale_sq"] * er


# ---- directional link goals ----------------------------------------------


@_builder("lookat")
def _build_lookat(problem, items):
    return [_simple_group(items, axis=lambda g: _norm(g.axis), target=lambda g: g.target)]


@_evaluator("lookat")
def _eval_lookat(problem, grp, gdata, tips, qa, data):
    tp, tq = _tip_pq(tips, grp)
    v = _normalize_rows(quat_rotate(tq, gdata["axis"]))
    n = _normalize_rows(gdata["target"] - tp)
    return jnp.sum(jnp.square(n - v), axis=-1)


@_builder("max_distance")
def _build_maxd(problem, items):
    return [_simple_group(items, target=lambda g: g.target, distance=lambda g: g.distance)]


@_evaluator("max_distance")
def _eval_maxd(problem, grp, gdata, tips, qa, data):
    tp, _ = _tip_pq(tips, grp)
    d = jnp.maximum(
        0.0, jnp.linalg.norm(tp - gdata["target"], axis=-1) - gdata["distance"]
    )
    return d * d


@_builder("min_distance")
def _build_mind(problem, items):
    return [_simple_group(items, target=lambda g: g.target, distance=lambda g: g.distance)]


@_evaluator("min_distance")
def _eval_mind(problem, grp, gdata, tips, qa, data):
    tp, _ = _tip_pq(tips, grp)
    d = jnp.maximum(
        0.0, gdata["distance"] - jnp.linalg.norm(tp - gdata["target"], axis=-1)
    )
    return d * d


@_builder("line")
def _build_line(problem, items):
    return [
        _simple_group(items, position=lambda g: g.position, direction=lambda g: _norm(g.direction))
    ]


@_evaluator("line")
def _eval_line(problem, grp, gdata, tips, qa, data):
    tp, _ = _tip_pq(tips, grp)
    d = tp - gdata["position"]
    along = jnp.sum(d * gdata["direction"], axis=-1, keepdims=True)
    perp = d - gdata["direction"] * along
    return jnp.sum(jnp.square(perp), axis=-1)


@_builder("plane")
def _build_plane(problem, items):
    return [
        _simple_group(items, position=lambda g: g.position, normal=lambda g: _norm(g.normal))
    ]


@_evaluator("plane")
def _eval_plane(problem, grp, gdata, tips, qa, data):
    tp, _ = _tip_pq(tips, grp)
    sd = jnp.sum((tp - gdata["position"]) * gdata["normal"], axis=-1)
    return sd * sd


@_builder("touch")
def _build_touch(problem, items):
    grp = _simple_group(
        items, position=lambda g: g.position, normal=lambda g: _norm(g.normal)
    )
    # surface clouds: explicit points (radius 0), or a support set with
    # per-point radii derived from the link's URDF collision geometry
    # (reference: goal_types.cpp:45-228 derives it from the MoveIt/FCL
    # collision model automatically) — spheres enter as ONE center point
    # with radius=r, making their support EXACT (see
    # RobotModel.collision_support)
    clouds = [
        (np.asarray(g.points, np.float64),
         np.zeros(len(g.points)))
        if g.points else problem.model.collision_support(g.link)
        for g, _ in items
    ]
    # pad per-goal point clouds to a common length
    maxp = max(len(c) for c, _ in clouds)
    pts = np.zeros((len(items), maxp, 3))
    rad = np.zeros((len(items), maxp))
    for i, (p, r) in enumerate(clouds):
        pts[i, : len(p)] = p
        pts[i, len(p):] = p[-1]  # pad with last point (no effect on min)
        rad[i, : len(p)] = r
        rad[i, len(p):] = r[-1]
    grp.params["points"] = pts
    grp.params["radii"] = rad
    return [grp]


@_evaluator("touch")
def _eval_touch(problem, grp, gdata, tips, qa, data):
    tp, tq = _tip_pq(tips, grp)
    # world-space surface points: (..., k, P, 3)
    world = tp[..., None, :] + quat_rotate(tq[..., None, :], gdata["points"])
    sd = jnp.sum((world - gdata["position"][..., None, :]) * gdata["normal"][..., None, :], axis=-1)
    # per-point support radius: a point with radius r stands for a
    # sphere, whose deepest extent along the plane normal is its
    # center's signed distance minus r (exact sphere support)
    d = jnp.min(sd - gdata["radii"], axis=-1)
    return d * d


@_builder("side")
def _build_side(problem, items):
    return [_simple_group(items, axis=lambda g: _norm(g.axis), direction=lambda g: _norm(g.direction))]


@_evaluator("side")
def _eval_side(problem, grp, gdata, tips, qa, data):
    _, tq = _tip_pq(tips, grp)
    v = quat_rotate(tq, gdata["axis"])
    f = jnp.maximum(0.0, jnp.sum(v * gdata["direction"], axis=-1))
    return f * f


@_builder("direction")
def _build_direction(problem, items):
    return [_simple_group(items, axis=lambda g: _norm(g.axis), direction=lambda g: _norm(g.direction))]


@_evaluator("direction")
def _eval_direction(problem, grp, gdata, tips, qa, data):
    _, tq = _tip_pq(tips, grp)
    v = quat_rotate(tq, gdata["axis"])
    return jnp.sum(jnp.square(v - gdata["direction"]), axis=-1)


@_builder("cone")
def _build_cone(problem, items):
    return [
        _simple_group(
            items,
            axis=lambda g: _norm(g.axis),
            direction=lambda g: _norm(g.direction),
            angle=lambda g: g.angle,
            position=lambda g: g.position,
            position_weight_sq=lambda g: g.position_weight**2,
        )
    ]


@_evaluator("cone")
def _eval_cone(problem, grp, gdata, tips, qa, data):
    tp, tq = _tip_pq(tips, grp)
    v = quat_rotate(tq, gdata["axis"])
    dirs = gdata["direction"]
    cross = jnp.linalg.norm(jnp.cross(v, dirs), axis=-1)
    dot = jnp.sum(v * dirs, axis=-1)
    ang = jnp.arctan2(cross, dot)
    d = jnp.maximum(0.0, ang - gdata["angle"])
    ep = jnp.sum(jnp.square(gdata["position"] - tp), axis=-1)
    return d * d + gdata["position_weight_sq"] * ep


@_builder("link_function")
def _build_link_function(problem, items):
    # one group per instance — the callable is static structure
    groups = []
    for g, slot in items:
        grp = _simple_group([(g, slot)])
        grp.static["function"] = g.function
        groups.append(grp)
    return groups


@_evaluator("link_function")
def _eval_link_function(problem, grp, gdata, tips, qa, data):
    tp, tq = _tip_pq(tips, grp)
    fn = grp.static["function"]
    return fn(tp[..., 0, :], tq[..., 0, :])[..., None]


# ---- joint-space goals ----------------------------------------------------


def _single_group(items) -> GoalGroup:
    grp = GoalGroup(kind="")
    grp.weight_sq = np.asarray([g.weight**2 for g, _ in items])
    return grp


@_builder("avoid_joint_limits")
def _build_ajl(problem, items):
    return [_single_group(items)]


@_evaluator("avoid_joint_limits")
def _eval_ajl(problem, grp, gdata, tips, qa, data):
    d = jnp.abs(qa - problem.amid) * 2.0 - problem.aspan * 0.5
    d = jnp.maximum(0.0, d) * problem.velocity_weights * problem.abounded
    e = jnp.sum(d * d, axis=-1)
    return jnp.broadcast_to(e[..., None], e.shape + (grp.count,))


@_builder("center_joints")
def _build_cj(problem, items):
    return [_single_group(items)]


@_evaluator("center_joints")
def _eval_cj(problem, grp, gdata, tips, qa, data):
    d = (qa - problem.amid) * problem.velocity_weights * problem.abounded
    e = jnp.sum(d * d, axis=-1)
    return jnp.broadcast_to(e[..., None], e.shape + (grp.count,))


@_builder("regularization")
def _build_reg(problem, items):
    return [_single_group(items)]


@_evaluator("regularization")
def _eval_reg(problem, grp, gdata, tips, qa, data):
    d = qa - data["seed_active"]
    e = jnp.sum(d * d, axis=-1)
    return jnp.broadcast_to(e[..., None], e.shape + (grp.count,))


@_builder("minimal_displacement")
def _build_md(problem, items):
    return [_single_group(items)]


@_evaluator("minimal_displacement")
def _eval_md(problem, grp, gdata, tips, qa, data):
    d = (qa - data["seed_active"]) * problem.velocity_weights
    e = jnp.sum(d * d, axis=-1)
    return jnp.broadcast_to(e[..., None], e.shape + (grp.count,))


@_builder("joint_variable")
def _build_jv(problem, items):
    grp = _single_group(items)
    slots, vidx = [], []
    for g, _ in items:
        v = problem.model.var_index[g.variable_name]
        slots.append(problem.active_vars.index(v) if v in problem.active_vars else -1)
        vidx.append(v)
    grp.static["slots"] = np.asarray(slots, np.int64)
    grp.static["vidx"] = np.asarray(vidx, np.int64)
    grp.params["target"] = np.asarray([g.variable_position for g, _ in items])
    return [grp]


def _gather_goal_vars(problem, slots, vidx, qa, data):
    """Variable values for goal variables: from ``qa`` when active, else
    from the seed (reference: GoalContext::getVariablePosition negative-
    index convention, goal.h:70-77)."""
    safe = np.maximum(slots, 0)
    from_active = qa[..., safe]
    from_seed = data["seed_full"][..., vidx]
    return jnp.where(jnp.asarray(slots >= 0), from_active, from_seed)


@_evaluator("joint_variable")
def _eval_jv(problem, grp, gdata, tips, qa, data):
    vals = _gather_goal_vars(problem, grp.static["slots"], grp.static["vidx"], qa, data)
    d = vals - gdata["target"]
    return d * d


@_builder("joint_function")
def _build_jf(problem, items):
    groups = []
    for g, _ in items:
        grp = _single_group([(g, -1)])
        slots, vidx = [], []
        for name in g.variable_names:
            v = problem.model.var_index[name]
            slots.append(problem.active_vars.index(v) if v in problem.active_vars else -1)
            vidx.append(v)
        grp.static["slots"] = np.asarray(slots, np.int64)
        grp.static["vidx"] = np.asarray(vidx, np.int64)
        grp.static["function"] = g.function
        groups.append(grp)
    return groups


@_evaluator("joint_function")
def _eval_jf(problem, grp, gdata, tips, qa, data):
    vals = _gather_goal_vars(problem, grp.static["slots"], grp.static["vidx"], qa, data)
    preferred = grp.static["function"](vals)
    e = jnp.sum(jnp.square(preferred - vals), axis=-1)
    return e[..., None]


@_builder("balance")
def _build_balance(problem, items):
    groups = []
    m = problem.model
    massive = [li for li in range(m.nlinks) if m.masses[li] > 0]
    if not massive and items:
        raise ValueError("BalanceGoal requires links with inertial mass in the URDF")
    total = sum(m.masses[li] for li in massive)
    for g, _ in items:
        grp = _single_group([(g, -1)])
        # every massive link becomes a problem tip
        # (reference: BalanceGoal::describe, goal_types.cpp:231-255)
        slots = []
        for li in massive:
            link = m.link_names[li]
            # reuse Problem's tip discovery through a closure-free path:
            if link not in problem.tip_links_builder:
                problem.tip_links_builder.append(link)
            slots.append(problem.tip_links_builder.index(link))
        grp.tip_slots = np.asarray(slots, np.int64)
        grp.static["mass_frac"] = np.asarray([m.masses[li] / total for li in massive])
        grp.static["coms"] = np.asarray([m.coms[li] for li in massive])
        grp.params["target"] = np.asarray(g.target, np.float64)[None].repeat(1, axis=0)
        grp.params["axis"] = _norm(g.axis)[None].repeat(1, axis=0)
        groups.append(grp)
    return groups


@_evaluator("balance")
def _eval_balance(problem, grp, gdata, tips, qa, data):
    tp = tips[..., grp.tip_slots, 0:3]
    tq = tips[..., grp.tip_slots, 3:7]
    coms = jnp.asarray(grp.static["coms"], tips.dtype)
    mass = jnp.asarray(grp.static["mass_frac"], tips.dtype)
    world = tp + quat_rotate(tq, coms)
    com = jnp.sum(world * mass[..., None], axis=-2)
    d = com - gdata["target"][..., 0, :]
    axis = gdata["axis"][..., 0, :]
    d = d - axis * jnp.sum(axis * d, axis=-1, keepdims=True)
    return jnp.sum(d * d, axis=-1)[..., None]
