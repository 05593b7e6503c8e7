"""Pallas TPU kernel: fused Point-maze rollout.

The XLA lockstep path dispatches ~10-20 fused kernels per env step inside the
scan (~150µs per batch-step at 4096 envs).  This kernel runs the ENTIRE
rollout — kinematics, wall collision resolution, contact ejection, task
heads, truncation, auto-reset with on-core PRNG — inside one `pallas_call`:
the env state lives in VMEM for the whole trajectory, the batch rides the
128-wide lanes (batch-last layout), and the W wall segments unroll into
registers.  One kernel launch per rollout instead of per step.

Supports Point robots in every registered maze, including object worlds:
movable blocks ride as quasi-static lane projections and object balls as
the kick/roll/bounce model — exact mirrors of ``MazeEnvSpec._push_blocks``
/ ``_step_balls`` (the float32 production path), so the kernel stays
differentially testable against the XLA step.  Task heads evaluate at
``OBS_OFFSET`` (robot, or first observed object for BlockCarry/Billiard —
reference maze_task.py:592-604,646-658 semantics).  The auto-reset RNG
stream differs from the jax.random path (distribution-equivalent).
Differential tests: tests/test_pallas.py — single-step mode vs the XLA
path.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

from . import object_lanes
from .lane_env import LaneEnvKernel, goal_heads, uniform


class BallLanes(NamedTuple):
    """One hinge-type object ball in the kernel (envs/env.py _BallRuntime)."""

    body_pos: tuple   # (bx, by) python floats
    size: float
    qpos_idx: tuple   # (x, y, rot) absolute lane indices


class BlockLanes(NamedTuple):
    """One movable block (envs/env.py _BlockRuntime; quasi-static path)."""

    body_pos: tuple   # (3,) python floats
    half: tuple       # (3,)
    axis_mask: tuple  # (3,)
    xy_lo: tuple      # (2,)
    xy_hi: tuple      # (2,)
    qpos_idx: tuple   # (x, y, z, spin) absolute lane indices (-1 = absent)


class PointKernelSpec(NamedTuple):
    """Static scalars + wall/goal arrays baked into the kernel."""

    walls_p1: np.ndarray       # (W, 2)
    walls_p2: np.ndarray       # (W, 2)
    walls_mask: np.ndarray     # (W,)
    goal_pos: np.ndarray       # (G, 3)
    goal_dim_mask: np.ndarray  # (G, 3)
    goal_threshold: np.ndarray # (G,)
    goal_scale: np.ndarray     # (G,)
    goal_valid: np.ndarray     # (G,)
    reward_type: str           # "dist" | "goal" | "none"
    penalty: float
    scale: float
    restitution: float
    com_offset: float          # centrifugal residual arm (models/point.py)
    eject_margin: float
    eject_lam: float           # impedance rate 1/tc_eff
    eject_mu: float            # slide friction
    dt: float
    episode_limit: int
    inner_scale: float
    # arrow-box tip contacts (segments.tip_impedance_eject constants)
    radius: float              # manual-collision inflation of the segments
    body_mass: float
    couple_arm: float
    spin_inertia: float        # I' = I - a^2/m
    arrow_tips: tuple          # ((tx, ty), ...) leading corners, body frame
    # object worlds (empty tuples for plain mazes)
    balls: tuple = ()              # BallLanes
    blocks: tuple = ()             # BlockLanes
    objball_walls_p1: np.ndarray = None  # (W2, 2) ball-inflated wall soup
    objball_walls_p2: np.ndarray = None
    objball_walls_mask: np.ndarray = None
    obs_offset: int = 0            # 0 = robot heads; 3 = first object
    ball_kick: float = 0.0         # MazeEnvSpec.BALL_KICK_GAIN
    ball_decay: float = 0.0        # MazeEnvSpec.BALL_ROLL_DECAY
    robot_geom_r: float = 0.5      # body sphere radius (point.xml:22)
    n_world: int = 0               # world dof lane count after the robot 3
    # reduced impedance object solve (ops/object_lanes): replaces the
    # round-1 kick/quasi-static model for XY-block and hinge-ball worlds;
    # z/spin-block worlds keep the approximate lanes path (None here)
    object_spec: tuple = None          # ObjectLanesSpec
    object_dof_idx: tuple = ()         # absolute lane indices, solver order
    # sample_goals() task: the step kernel carries per-env goal positions
    # as lane rows instead of baking es.goal_pos constants
    dynamic_goals: bool = False


def spec_from_env(spec) -> PointKernelSpec:
    """Lower a MazeEnvSpec (Point robot) to kernel data."""
    assert spec.robot.MANUAL_COLLISION, "pallas path is Point-only"
    g = spec.heads.goals
    balls = tuple(
        BallLanes(
            body_pos=tuple(float(x) for x in np.asarray(ob.body_pos)),
            size=float(ob.size),
            qpos_idx=tuple(int(i) for i in ob.qpos_idx),
        )
        for ob in spec.ball_runtimes
    )
    # SPIN rotors (PUT_SPIN_NEAR_AGENT, no stock task) are not lowered —
    # the AssertionError routes make_fast_* to the XLA path, which has the
    # rolling-contact model (envs/env.py _spin_blocks)
    assert not any(b.spin for b in spec.block_runtimes), "spin world"
    blocks = tuple(
        BlockLanes(
            body_pos=tuple(float(x) for x in np.asarray(b.body_pos)),
            half=tuple(float(x) for x in np.asarray(b.half)),
            axis_mask=tuple(float(x) for x in np.asarray(b.axis_mask)),
            xy_lo=tuple(float(x) for x in np.asarray(b.xy_lo)),
            xy_hi=tuple(float(x) for x in np.asarray(b.xy_hi)),
            qpos_idx=tuple(int(i) for i in b.qpos_idx),
        )
        for b in spec.block_runtimes
    )
    return PointKernelSpec(
        walls_p1=np.asarray(spec.walls.p1, np.float32),
        walls_p2=np.asarray(spec.walls.p2, np.float32),
        walls_mask=np.asarray(spec.walls.mask),
        goal_pos=np.asarray(g.pos, np.float32),
        goal_dim_mask=np.asarray(g.dim_mask, np.float32),
        goal_threshold=np.asarray(g.threshold, np.float32),
        goal_scale=np.asarray(g.reward_scale, np.float32),
        goal_valid=np.asarray(g.valid),
        reward_type=spec.task.REWARD_TYPE,
        penalty=float(spec.task.PENALTY or 0.0),
        scale=float(spec.task.scale),
        restitution=float(spec.restitution_coef),
        com_offset=float(spec.robot.COM_OFFSET),
        eject_margin=float(getattr(spec.robot, "WALL_CONTACT_MARGIN", 0.0)),
        eject_lam=float(getattr(spec.robot, "CONTACT_LAM", 0.0)),
        eject_mu=float(getattr(spec.robot, "CONTACT_MU", 0.0)),
        dt=float(spec.robot.timestep),
        episode_limit=1000,
        inner_scale=float(spec.inner_reward_scaling),
        radius=float(spec.robot.RADIUS),
        body_mass=float(getattr(spec.robot, "BODY_MASS", 1.0)),
        couple_arm=float(getattr(spec.robot, "COUPLE_ARM", 0.0)),
        spin_inertia=float(getattr(spec.robot, "SPIN_INERTIA_PRIME", 1.0)),
        arrow_tips=tuple(getattr(spec.robot, "ARROW_TIPS", ())),
        balls=balls,
        blocks=blocks,
        objball_walls_p1=np.asarray(spec.objball_walls.p1, np.float32),
        objball_walls_p2=np.asarray(spec.objball_walls.p2, np.float32),
        objball_walls_mask=np.asarray(spec.objball_walls.mask),
        obs_offset=int(spec.task.OBS_OFFSET),
        ball_kick=float(spec.BALL_KICK_GAIN),
        ball_decay=float(spec.BALL_ROLL_DECAY),
        n_world=int(spec.nq - 3),
        object_spec=object_lanes.spec_from_env(spec),
        object_dof_idx=tuple(spec._object_dof_idx()),
        dynamic_goals=bool(spec.task.sample_goals()),
    )


def _detect(walls_p1, walls_p2, walls_mask, ox, oy, nx, ny):
    """Nearest wall crossing of (ox,oy)→(nx,ny) over a static wall soup;
    returns (hit, px, py, rx, ry) with reference semantics
    (segments.detect parity; loops unroll into registers)."""
    dx_, dy_ = nx - ox, ny - oy
    moved = dx_ * dx_ + dy_ * dy_ > np.float32(1e-16)
    best_hit = jnp.zeros_like(ox, dtype=jnp.bool_)
    best_d2 = jnp.full_like(ox, np.float32(np.inf))
    best_px = jnp.zeros_like(ox)
    best_py = jnp.zeros_like(ox)
    best_rx = jnp.zeros_like(ox)
    best_ry = jnp.zeros_like(ox)
    for w in range(len(walls_mask)):
        if not walls_mask[w]:
            continue
        p1x, p1y = np.float32(walls_p1[w, 0]), np.float32(walls_p1[w, 1])
        p2x, p2y = np.float32(walls_p2[w, 0]), np.float32(walls_p2[w, 1])
        v1x, v1y = p2x - p1x, p2y - p1y
        c_old = v1x * (oy - p1y) - v1y * (ox - p1x)
        c_new = v1x * (ny - p1y) - v1y * (nx - p1x)
        s1 = c_old * c_new <= 0.0
        cw1 = dx_ * (p1y - oy) - dy_ * (p1x - ox)
        cw2 = dx_ * (p2y - oy) - dy_ * (p2x - ox)
        s2 = cw1 * cw2 <= 0.0
        a = v1x * dy_ - v1y * dx_
        b = v1x * (ny - p2y) - v1y * (nx - p2x)
        safe_a = jnp.where(a == 0.0, np.float32(1.0), a)
        tt = b / safe_a
        px = nx - tt * dx_
        py = ny - tt * dy_
        hit = s1 & s2 & moved & (a != 0.0)
        d2 = (px - ox) ** 2 + (py - oy) ** 2
        nrm = v1x * v1x + v1y * v1y
        sc = ((nx - p1x) * v1x + (ny - p1y) * v1y) / np.float32(nrm)
        prx = p1x + sc * v1x
        pry = p1y + sc * v1y
        rx = 2 * prx - nx
        ry = 2 * pry - ny
        better = hit & (d2 < best_d2)
        best_d2 = jnp.where(better, d2, best_d2)
        best_px = jnp.where(better, px, best_px)
        best_py = jnp.where(better, py, best_py)
        best_rx = jnp.where(better, rx, best_rx)
        best_ry = jnp.where(better, ry, best_ry)
        best_hit = best_hit | hit
    return best_hit, best_px, best_py, best_rx, best_ry


def _resolve(walls_p1, walls_p2, walls_mask, restitution, ox, oy, nx, ny):
    """segments.resolve parity: restitution blend + give-up fallback."""
    hit1, px, py, rx, ry = _detect(walls_p1, walls_p2, walls_mask,
                                   ox, oy, nx, ny)
    c = np.float32(restitution)
    bx = px + c * (rx - px)
    by = py + c * (ry - py)
    hit2, *_ = _detect(walls_p1, walls_p2, walls_mask, ox, oy, bx, by)
    resx = jnp.where(hit2, ox, bx)
    resy = jnp.where(hit2, oy, by)
    return jnp.where(hit1, resx, nx), jnp.where(hit1, resy, ny), hit1


def _push_blocks_lanes(ks: PointKernelSpec, q, x, y):
    """Quasi-static block push, mirror of MazeEnvSpec._push_blocks: overlap
    of the robot contact disc with the block AABB resolves by translating
    the block along its movable axes, clamped to static travel limits."""
    r = np.float32(ks.radius if ks.radius is not None else 0.5)
    q = list(q)
    for b in ks.blocks:
        cx = np.float32(b.body_pos[0])
        cy = np.float32(b.body_pos[1])
        if b.qpos_idx[0] >= 0:
            cx = cx + q[b.qpos_idx[0]]
        if b.qpos_idx[1] >= 0:
            cy = cy + q[b.qpos_idx[1]]
        lox = cx - np.float32(b.half[0])
        hix = cx + np.float32(b.half[0])
        loy = cy - np.float32(b.half[1])
        hiy = cy + np.float32(b.half[1])
        clx = jnp.clip(x, lox, hix)
        cly = jnp.clip(y, loy, hiy)
        dx_, dy_ = x - clx, y - cly
        dist = jnp.sqrt(dx_ * dx_ + dy_ * dy_ + np.float32(1e-12))
        overlap = r - dist
        nx_ = jnp.where(dist > 1e-6, -dx_ / dist, jnp.zeros_like(x))
        ny_ = jnp.where(dist > 1e-6, -dy_ / dist, jnp.zeros_like(y))
        inside = dist <= 1e-6
        pen0 = hix - x
        pen1 = x - lox
        pen2 = hiy - y
        pen3 = y - loy
        # axis of min penetration when inside (argmin over 4, branch-free)
        m01 = jnp.minimum(pen0, pen1)
        m23 = jnp.minimum(pen2, pen3)
        use_x = m01 <= m23
        nix = jnp.where(use_x, jnp.where(pen0 <= pen1, 1.0, -1.0), 0.0)
        niy = jnp.where(use_x, 0.0, jnp.where(pen2 <= pen3, 1.0, -1.0))
        nx_ = jnp.where(inside, nix, nx_)
        ny_ = jnp.where(inside, niy, ny_)
        push = jnp.where(overlap > 0, overlap, 0.0)
        pushx = push * nx_ * np.float32(b.axis_mask[0])
        pushy = push * ny_ * np.float32(b.axis_mask[1])
        if b.qpos_idx[0] >= 0:
            newc = jnp.clip(cx + pushx, np.float32(b.xy_lo[0]),
                            np.float32(b.xy_hi[0]))
            q[b.qpos_idx[0]] = newc - np.float32(b.body_pos[0])
        if b.qpos_idx[1] >= 0:
            newc = jnp.clip(cy + pushy, np.float32(b.xy_lo[1]),
                            np.float32(b.xy_hi[1]))
            q[b.qpos_idx[1]] = newc - np.float32(b.body_pos[1])
    # block-block separation (MazeEnvSpec._separate_blocks mirror)
    for i in range(len(ks.blocks)):
        for j in range(i + 1, len(ks.blocks)):
            bi, bj = ks.blocks[i], ks.blocks[j]

            def center(b, q):
                cs = []
                for ax in range(2):
                    c = np.float32(b.body_pos[ax])
                    if b.qpos_idx[ax] >= 0:
                        c = c + q[b.qpos_idx[ax]]
                    else:
                        c = c + jnp.zeros_like(q[0])
                    cs.append(c)
                return cs

            ci = center(bi, q)
            cj = center(bj, q)
            pen = [np.float32(bi.half[ax] + bj.half[ax])
                   - jnp.abs(ci[ax] - cj[ax]) for ax in range(2)]
            overlapping = (pen[0] > 0) & (pen[1] > 0)
            use_x = pen[0] <= pen[1]
            for axis in range(2):
                sel = overlapping & (use_x if axis == 0 else ~use_x)
                d = jnp.where(pen[axis] > 0, pen[axis], 0.0)
                sgn = jnp.sign(cj[axis] - ci[axis])
                sgn = jnp.where(sgn == 0, np.float32(1.0), sgn)
                mi = 1.0 if bi.qpos_idx[axis] >= 0 else 0.0
                mj = 1.0 if bj.qpos_idx[axis] >= 0 else 0.0
                tot = mi + mj
                if tot == 0:
                    continue
                if bi.qpos_idx[axis] >= 0 and mi > 0:
                    newc = jnp.clip(
                        ci[axis] - jnp.where(sel, d * np.float32(mi / tot),
                                             0.0) * sgn,
                        np.float32(bi.xy_lo[axis]), np.float32(bi.xy_hi[axis]))
                    q[bi.qpos_idx[axis]] = newc - np.float32(bi.body_pos[axis])
                if bj.qpos_idx[axis] >= 0 and mj > 0:
                    newc = jnp.clip(
                        cj[axis] + jnp.where(sel, d * np.float32(mj / tot),
                                             0.0) * sgn,
                        np.float32(bj.xy_lo[axis]), np.float32(bj.xy_hi[axis]))
                    q[bj.qpos_idx[axis]] = newc - np.float32(bj.body_pos[axis])
    return tuple(q)


def _step_balls_lanes(ks: PointKernelSpec, q, v, x, y):
    """Object-ball dynamics, mirror of MazeEnvSpec._step_balls: kick by the
    robot disc, roll with decay, manual wall bounce on the ball-inflated
    segment soup with velocity steering."""
    dt = np.float32(ks.dt)
    DECAY = np.float32(ks.ball_decay)
    KICK = np.float32(ks.ball_kick)
    RGR = np.float32(ks.robot_geom_r)
    rest = np.float32(ks.restitution)
    q = list(q)
    v = list(v)
    for ob in ks.balls:
        xi, yi, _ri = ob.qpos_idx
        bx = np.float32(ob.body_pos[0]) + q[xi]
        by = np.float32(ob.body_pos[1]) + q[yi]
        velx, vely = v[xi], v[yi]
        dx_, dy_ = bx - x, by - y
        dist = jnp.sqrt(dx_ * dx_ + dy_ * dy_ + np.float32(1e-12))
        overlap = (RGR + np.float32(ob.size)) - dist
        hit = overlap > 0.0
        velx = jnp.where(hit, velx + dx_ / dist * overlap * KICK, velx)
        vely = jnp.where(hit, vely + dy_ / dist * overlap * KICK, vely)
        ox, oy = bx, by
        bx = bx + velx * dt
        by = by + vely * dt
        velx = velx * (np.float32(1.0) - DECAY)
        vely = vely * (np.float32(1.0) - DECAY)
        rx, ry, _ = _resolve(
            ks.objball_walls_p1, ks.objball_walls_p2, ks.objball_walls_mask,
            rest, ox, oy, bx, by,
        )
        bounced = (jnp.abs(rx - bx) > 1e-7) | (jnp.abs(ry - by) > 1e-7)
        mx, my = rx - ox, ry - oy
        mnorm = jnp.sqrt(mx * mx + my * my + np.float32(1e-12))
        speed = jnp.sqrt(velx * velx + vely * vely)
        steer = bounced & (mnorm > 1e-6)
        velx = jnp.where(steer, mx / mnorm * speed * rest, velx)
        vely = jnp.where(steer, my / mnorm * speed * rest, vely)
        q[xi] = rx - np.float32(ob.body_pos[0])
        q[yi] = ry - np.float32(ob.body_pos[1])
        v[xi] = velx
        v[yi] = vely
    return tuple(q), tuple(v)


def _first_object_pos(ks: PointKernelSpec, q):
    """(px, py, pz) of the first observed object — the heads' anchor when
    OBS_OFFSET == 3 (balls precede blocks in the obs layout)."""
    if ks.balls:
        ob = ks.balls[0]
        return (
            np.float32(ob.body_pos[0]) + q[ob.qpos_idx[0]],
            np.float32(ob.body_pos[1]) + q[ob.qpos_idx[1]],
            jnp.zeros_like(q[0]),  # hinge-ball center3 z = 0 (envs/env.py)
        )
    b = ks.blocks[0]
    px = np.float32(b.body_pos[0])
    py = np.float32(b.body_pos[1])
    pz = np.float32(b.body_pos[2])
    px = px + q[b.qpos_idx[0]] if b.qpos_idx[0] >= 0 else px + jnp.zeros_like(q[0])
    py = py + q[b.qpos_idx[1]] if b.qpos_idx[1] >= 0 else py + jnp.zeros_like(q[0])
    pz = pz + q[b.qpos_idx[2]] if b.qpos_idx[2] >= 0 else pz + jnp.zeros_like(q[0])
    return px, py, pz


def _step_math(ks: PointKernelSpec, q, v, t, ax, ar, goal=None):
    """One env step on (TB,)-shaped lanes-resident vectors.

    Mirror of MazeEnvSpec._step_manual (float32 path) for the Point robot:
    kinematics → drift/friction → block push → ball dynamics → wall-contact
    ejection → arrow-tip contacts → wall resolve (restitution + give-up) →
    heads.  All wall/object loops unroll into registers.
    """
    PI = np.float32(np.pi)
    dt = np.float32(ks.dt)
    x, y, ori = q[0], q[1], q[2]
    vx, vy, vr = v[0], v[1], v[2]
    old_x, old_y = x, y
    # kinematics (point.py:44-57); the reference clips the FULL qvel
    # (incl. object-ball dofs) to ±10
    ori = ori + ar
    ori = jnp.where(ori < -PI, ori + 2 * PI, ori)
    ori = jnp.where(ori > PI, ori - 2 * PI, ori)
    x = x + jnp.cos(ori) * ax
    y = y + jnp.sin(ori) * ax
    vx = jnp.clip(vx, -10.0, 10.0)
    vy = jnp.clip(vy, -10.0, 10.0)
    vr = jnp.clip(vr, -10.0, 10.0)
    v_world = tuple(jnp.clip(vw, -10.0, 10.0) for vw in v[3:])
    q_world_pre = q[3:]
    # reduced impedance object solve, from the post-teleport pre-residual
    # robot state (mirror of envs/env.py _step_manual: the engine's
    # mj_step ran from exactly this state; the RK4 sweep inside kills the
    # one-contact-sample-per-teleport aliasing)
    if ks.object_spec is not None and ks.object_dof_idx:
        q_full = [x, y, ori] + list(q_world_pre)
        v_full = [vx, vy, vr] + list(v_world)
        oq = tuple(q_full[i] for i in ks.object_dof_idx)
        ov = tuple(v_full[i] for i in ks.object_dof_idx)
        oq, ov = object_lanes.object_step_lanes(
            ks.object_spec, (x, y, ori), (vx, vy, vr), oq, ov)
        for slot, i in enumerate(ks.object_dof_idx):
            q_full[i] = oq[slot]
            v_full[i] = ov[slot]
        q_world_pre = tuple(q_full[3:])
        v_world = tuple(v_full[3:])
    # mj residual: drift + centrifugal slide coupling from the hinge spin
    # (models/point.py residual_step — closed-form, no calibration)
    r_com = np.float32(ks.com_offset)
    sin0, cos0 = jnp.sin(ori), jnp.cos(ori)
    ori_dt = ori + vr * dt
    sin1, cos1 = jnp.sin(ori_dt), jnp.cos(ori_dt)
    dvx = vr * r_com * (sin1 - sin0)
    dvy = -vr * r_com * (cos1 - cos0)
    x = x + vx * dt + r_com * (cos0 - cos1) - vr * r_com * sin0 * dt
    y = y + vy * dt + r_com * (sin0 - sin1) + vr * r_com * cos0 * dt
    ori2 = ori_dt
    vx = vx + dvx
    vy = vy + dvy

    # z/spin-block worlds (no reduced solve): quasi-static block push /
    # kick-ball model at the robot's post-move position (env.py order)
    q_world = q_world_pre
    if (ks.blocks or ks.balls) and ks.object_spec is None:
        q_full = (x, y, ori2) + q_world
        v_full = (vx, vy, vr) + v_world
        if ks.blocks:
            q_full = _push_blocks_lanes(ks, q_full, x, y)
        if ks.balls:
            q_full, v_full = _step_balls_lanes(ks, q_full, v_full, x, y)
        q_world = q_full[3:]
        v_world = v_full[3:]

    def detect(ox, oy, nx, ny):
        return _detect(ks.walls_p1, ks.walls_p2, ks.walls_mask,
                       ox, oy, nx, ny)

    # wall-contact ejection at the pre-resolution position (what mj_step
    # saw): impedance map of ops/segments.impedance_eject, unrolled.
    # Signed distance oriented by the pre-move position (old_x, old_y) so a
    # kinematic step that crosses a wall face reads deep positive
    # penetration with an outward normal, like the XLA path.
    if ks.eject_margin > 0.0:
        dv_x = jnp.zeros_like(x)
        dv_y = jnp.zeros_like(y)
        m = np.float32(ks.eject_margin)
        lam = np.float32(ks.eject_lam)
        mu = np.float32(ks.eject_mu)
        edecay = np.float32(np.exp(-ks.eject_lam * ks.dt))
        for w in range(len(ks.walls_mask)):
            if not ks.walls_mask[w]:
                continue
            p1x, p1y = np.float32(ks.walls_p1[w, 0]), np.float32(ks.walls_p1[w, 1])
            p2x, p2y = np.float32(ks.walls_p2[w, 0]), np.float32(ks.walls_p2[w, 1])
            v1x, v1y = p2x - p1x, p2y - p1y
            nrm = np.float32(v1x * v1x + v1y * v1y)
            tt = jnp.clip(((x - p1x) * v1x + (y - p1y) * v1y) / nrm, 0.0, 1.0)
            cx = p1x + tt * v1x
            cy = p1y + tt * v1y
            ddx, ddy = x - cx, y - cy
            dist = jnp.sqrt(ddx * ddx + ddy * ddy + np.float32(1e-12))
            side = jnp.sign((old_x - cx) * ddx + (old_y - cy) * ddy)
            side = jnp.where(side == 0.0, np.float32(1.0), side)
            pen = jnp.maximum(m - dist * side, 0.0)
            act = pen > 0.0
            nx_, ny_ = ddx / dist * side, ddy / dist * side
            vn = vx * nx_ + vy * ny_
            vn2 = edecay * (vn - lam * (vn - lam * pen) * dt)
            dvn = jnp.where(act, jnp.maximum(vn2 - vn, 0.0), 0.0)
            vt = -vx * ny_ + vy * nx_
            dvt = -jnp.sign(vt) * jnp.minimum(jnp.abs(vt), mu * dvn)
            dvt = jnp.where(act, dvt, 0.0)
            dv_x = dv_x + dvn * nx_ - dvt * ny_
            dv_y = dv_y + dvn * ny_ + dvt * nx_
        vx = vx + dv_x
        vy = vy + dv_y

    # arrow-box tip contacts (segments.tip_impedance_eject, unrolled):
    # exact 3-dof impedance response at each leading arrow corner, applied
    # sequentially per tip (each tip sees the previous tip's qvel update),
    # matching envs/env.py:_step_manual.
    if ks.arrow_tips:
        lam = np.float32(ks.eject_lam)
        edecay = np.float32(np.exp(-ks.eject_lam * ks.dt))
        bm = np.float32(ks.body_mass)
        arm = np.float32(ks.couple_arm)
        ip = np.float32(ks.spin_inertia)
        infl = np.float32(ks.radius)
        coef = np.float32(ks.couple_arm / (ks.body_mass * ks.spin_inertia))
        sin2, cos2 = jnp.sin(ori2), jnp.cos(ori2)
        ux, uy = -sin2, cos2
        for tip_body in ks.arrow_tips:
            tbx, tby = np.float32(tip_body[0]), np.float32(tip_body[1])
            rrx = tbx * cos2 - tby * sin2        # r_rel = tip - center
            rry = tbx * sin2 + tby * cos2
            tipx = x + rrx
            tipy = y + rry
            dv_x = jnp.zeros_like(x)
            dv_y = jnp.zeros_like(y)
            dv_r = jnp.zeros_like(x)
            for w in range(len(ks.walls_mask)):
                if not ks.walls_mask[w]:
                    continue
                p1x, p1y = np.float32(ks.walls_p1[w, 0]), np.float32(ks.walls_p1[w, 1])
                p2x, p2y = np.float32(ks.walls_p2[w, 0]), np.float32(ks.walls_p2[w, 1])
                v1x, v1y = p2x - p1x, p2y - p1y
                nrm = np.float32(v1x * v1x + v1y * v1y)
                tt = jnp.clip(
                    ((tipx - p1x) * v1x + (tipy - p1y) * v1y) / nrm, 0.0, 1.0)
                cx = p1x + tt * v1x
                cy = p1y + tt * v1y
                dcx, dcy = old_x - cx, old_y - cy
                dcn = jnp.sqrt(dcx * dcx + dcy * dcy + np.float32(1e-12))
                nx_, ny_ = dcx / dcn, dcy / dcn
                s_d = (tipx - cx) * nx_ + (tipy - cy) * ny_
                pen = jnp.maximum(-(s_d + infl), 0.0)
                act = pen > 0.0
                rxn = rrx * ny_ - rry * nx_
                un = nx_ * ux + ny_ * uy
                g = rxn - (arm / bm) * un
                A = np.float32(1.0) / bm + (g * g) / ip
                vn = nx_ * vx + ny_ * vy + rxn * vr
                vn2 = edecay * (vn - lam * (vn - lam * pen) * dt)
                dvn = jnp.where(act, jnp.maximum(vn2 - vn, 0.0), 0.0)
                f = dvn / A
                dv_x = dv_x + f * (nx_ / bm - ux * coef * g)
                dv_y = dv_y + f * (ny_ / bm - uy * coef * g)
                dv_r = dv_r + f * g / ip
            vx = vx + dv_x
            vy = vy + dv_y
            vr = vr + dv_r

    hit1, px, py, rx, ry = detect(old_x, old_y, x, y)
    c = np.float32(ks.restitution)
    bx = px + c * (rx - px)
    by = py + c * (ry - py)
    hit2, *_ = detect(old_x, old_y, bx, by)
    resx = jnp.where(hit2, old_x, bx)
    resy = jnp.where(hit2, old_y, by)
    x = jnp.where(hit1, resx, x)
    y = jnp.where(hit1, resy, y)

    t = t + 1
    # task heads: obs[:3] = (x, y, ori2), or the first observed object's
    # center when OBS_OFFSET == 3 (BlockCarry/Billiard semantics)
    if ks.obs_offset == 3:
        hx, hy, hz = _first_object_pos(ks, (x, y, ori2) + q_world)
        reward, terminated = goal_heads(ks, hx, hy, hz, goal=goal)
    else:
        reward, terminated = goal_heads(ks, x, y, ori2, goal=goal)
    truncated = t >= ks.episode_limit
    return ((x, y, ori2) + q_world, (vx, vy, vr) + v_world,
            t, reward, terminated, truncated)


def _make_kernel(ks: PointKernelSpec,
                 default_tile: int) -> LaneEnvKernel:
    nq_total = 3 + ks.n_world
    if ks.object_spec is not None:
        # the stacked contact rows of the reduced object solve live in
        # VMEM as (R, tile) blocks — cap the tile so they fit
        default_tile = min(default_tile, 512)

    def env_step(q, v, t, ctrl, goal=None):
        ax, ar = ctrl
        return _step_math(ks, q, v, t, ax, ar, goal=goal)

    def sample_ctrl(tile):
        # Point action box: forward gain in ±1, rotation delta in ±0.25
        return (
            uniform((tile,), np.float32(-1.0), np.float32(1.0)),
            uniform((tile,), np.float32(-0.25), np.float32(0.25)),
        )

    def sample_reset(q, v, tile):
        # reference noise law point.py:71-81: qpos ~ U(-0.1, 0.1),
        # qvel ~ U(0, 0.1); world dofs reset to zero (point.py:78-79,
        # ZERO_WORLD_DOFS_ON_RESET)
        zero = jnp.zeros((tile,), jnp.float32)
        q_r = tuple(
            uniform((tile,), np.float32(-0.1), np.float32(0.1))
            for _ in range(3)
        ) + (zero,) * ks.n_world
        v_r = tuple(
            uniform((tile,), np.float32(0.0), np.float32(0.1))
            for _ in range(3)
        ) + (zero,) * ks.n_world
        return q_r, v_r

    return LaneEnvKernel(
        nq_total, nq_total, 2, env_step, sample_ctrl, sample_reset,
        default_tile=default_tile,
        n_goal=len(ks.goal_valid) if ks.dynamic_goals else 0,
    )


def build_rollout_kernel(ks: PointKernelSpec, num_envs: int, num_steps: int,
                         tile: int = 2048, interpret: bool = None):
    """jit-able fn: (qpos(B,3), qvel(B,3), t(B,), seed ()) →
    (qpos', qvel', t', reward_sum (), episodes ()).

    Actions are sampled on-core (uniform over the Point action box) — the
    benchmark/random-rollout path with zero host↔device interchange.
    """
    if ks.object_spec is not None:
        tile = min(tile, 512)  # (R, tile) stacked contact rows in VMEM
    return _make_kernel(ks, tile).build_rollout(
        num_envs, num_steps, tile, interpret)


def build_step_kernel(ks: PointKernelSpec, num_envs: int, tile: int = 512,
                      interpret: bool = None):
    """Single-step mode with explicit actions, no auto-reset — the
    differential-testing surface against MazeEnvSpec.step and the public
    batched-API fast path."""
    if ks.object_spec is not None:
        tile = min(tile, 512)
    return _make_kernel(ks, tile).build_step(num_envs, tile, interpret)
