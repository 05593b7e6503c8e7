"""Pallas TPU kernel: fused Point-maze rollout.

The XLA lockstep path dispatches ~10-20 fused kernels per env step inside the
scan (~150µs per batch-step at 4096 envs).  This kernel runs the ENTIRE
rollout — kinematics, wall collision resolution, contact ejection, task
heads, truncation, auto-reset with on-core PRNG — inside one `pallas_call`:
the env state lives in VMEM for the whole trajectory, the batch rides the
128-wide lanes (batch-last layout), and the W wall segments unroll into
registers.  One kernel launch per rollout instead of per step.

Supports Point robots in object-free mazes (the benchmark configs
PointUMaze-v0/v1, Point4Rooms-v2, ...).  Semantics match
`MazeEnvSpec.step` (same math, same constants); the auto-reset RNG stream
differs from the jax.random path (distribution-equivalent).  Differential
tests: tests/test_pallas.py — single-step mode vs the XLA path.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

from .lane_env import LaneEnvKernel, goal_heads, uniform

LANE = 128


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


def spec_from_env(spec) -> PointKernelSpec:
    """Lower a MazeEnvSpec (Point robot, no movable objects) to kernel data."""
    assert spec.robot.MANUAL_COLLISION, "pallas path is Point-only"
    assert not spec.block_runtimes and not spec.ball_runtimes, (
        "pallas path supports object-free mazes"
    )
    g = spec.heads.goals
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
    )


def _step_math(ks: PointKernelSpec, x, y, ori, vx, vy, vr, t, ax, ar):
    """One env step on (TB,)-shaped lanes-resident vectors.

    Mirror of MazeEnvSpec._step_manual for the Point robot: kinematics →
    drift/friction → wall resolve (restitution + give-up) → ejection →
    heads.  All wall loops unroll into registers (W is small and static).
    """
    PI = np.float32(np.pi)
    dt = np.float32(ks.dt)
    old_x, old_y = x, y
    # kinematics (point.py:44-57)
    ori = ori + ar
    ori = jnp.where(ori < -PI, ori + 2 * PI, ori)
    ori = jnp.where(ori > PI, ori - 2 * PI, ori)
    x = x + jnp.cos(ori) * ax
    y = y + jnp.sin(ori) * ax
    vx = jnp.clip(vx, -10.0, 10.0)
    vy = jnp.clip(vy, -10.0, 10.0)
    vr = jnp.clip(vr, -10.0, 10.0)
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

    def detect(ox, oy, nx, ny):
        """Nearest wall crossing of (ox,oy)→(nx,ny); returns
        (hit, px, py, rx, ry) with reference semantics."""
        dx_, dy_ = nx - ox, ny - oy
        moved = dx_ * dx_ + dy_ * dy_ > np.float32(1e-16)
        best_hit = jnp.zeros_like(ox, dtype=jnp.bool_)
        best_d2 = jnp.full_like(ox, np.float32(np.inf))
        best_px = jnp.zeros_like(ox)
        best_py = jnp.zeros_like(ox)
        best_rx = jnp.zeros_like(ox)
        best_ry = jnp.zeros_like(ox)
        for w in range(len(ks.walls_mask)):
            if not ks.walls_mask[w]:
                continue
            p1x, p1y = np.float32(ks.walls_p1[w, 0]), np.float32(ks.walls_p1[w, 1])
            p2x, p2y = np.float32(ks.walls_p2[w, 0]), np.float32(ks.walls_p2[w, 1])
            v1x, v1y = p2x - p1x, p2y - p1y
            c_old = v1x * (oy - p1y) - v1y * (ox - p1x)
            c_new = v1x * (ny - p1y) - v1y * (nx - p1x)
            s1 = c_old * c_new <= 0.0
            cw1 = dx_ * (p1y - oy) - dy_ * (p1x - ox)
            cw2 = dx_ * (p2y - oy) - dy_ * (p2x - ox)
            s2 = cw1 * cw2 <= 0.0
            a = v1x * dy_ - v1y * dx_
            b = v1x * (ny - p2y) - v1y * (nx - p2x)
            # cross point: new - (b/a)*d  (reference form old + (b'/a)d,
            # equivalent via b' = a + b)
            safe_a = jnp.where(a == 0.0, np.float32(1.0), a)
            tt = b / safe_a
            px = nx - tt * dx_
            py = ny - tt * dy_
            hit = s1 & s2 & moved & (a != 0.0)
            d2 = (px - ox) ** 2 + (py - oy) ** 2
            # reflection of (nx, ny) across the wall line
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
    # task heads on obs[:3] = (x, y, ori2)
    reward, terminated = goal_heads(ks, x, y, ori2)
    truncated = t >= ks.episode_limit
    return x, y, ori2, vx, vy, vr, t, reward, terminated, truncated


def _make_kernel(ks: PointKernelSpec,
                 default_tile: int) -> LaneEnvKernel:
    def env_step(q, v, t, ctrl):
        x, y, ori = q
        vx, vy, vr = v
        ax, ar = ctrl
        x, y, ori, vx, vy, vr, t, reward, term, trunc = _step_math(
            ks, x, y, ori, vx, vy, vr, t, ax, ar
        )
        return (x, y, ori), (vx, vy, vr), t, reward, term, trunc

    def sample_ctrl(tile):
        # Point action box: forward gain in ±1, rotation delta in ±0.25
        return (
            uniform((tile,), np.float32(-1.0), np.float32(1.0)),
            uniform((tile,), np.float32(-0.25), np.float32(0.25)),
        )

    def sample_reset(q, v, tile):
        # reference noise law point.py:71-81: qpos ~ U(-0.1, 0.1),
        # qvel ~ U(0, 0.1)
        q_r = tuple(
            uniform((tile,), np.float32(-0.1), np.float32(0.1))
            for _ in range(3)
        )
        v_r = tuple(
            uniform((tile,), np.float32(0.0), np.float32(0.1))
            for _ in range(3)
        )
        return q_r, v_r

    return LaneEnvKernel(
        3, 3, 2, env_step, sample_ctrl, sample_reset,
        default_tile=default_tile,
    )


def build_rollout_kernel(ks: PointKernelSpec, num_envs: int, num_steps: int,
                         tile: int = 2048, interpret: bool = None):
    """jit-able fn: (qpos(B,3), qvel(B,3), t(B,), seed ()) →
    (qpos', qvel', t', reward_sum (), episodes ()).

    Actions are sampled on-core (uniform over the Point action box) — the
    benchmark/random-rollout path with zero host↔device interchange.
    """
    return _make_kernel(ks, tile).build_rollout(
        num_envs, num_steps, tile, interpret)


def build_step_kernel(ks: PointKernelSpec, num_envs: int, tile: int = 512,
                      interpret: bool = None):
    """Single-step mode with explicit actions, no auto-reset — the
    differential-testing surface against MazeEnvSpec.step and the public
    batched-API fast path."""
    return _make_kernel(ks, tile).build_step(num_envs, tile, interpret)
