"""Lockstep maze environment: spec construction + pure reset/step functions.

TPU-native inversion of the reference ``MazeEnv``
(`/root/reference/mujoco_maze/maze_env.py`): construction is *trace time* —
the grid maze lowers to static wall/goal/object arrays baked into a jitted
step kernel — and the per-step object graph mutation becomes a pure function

    step(state, action) -> (state', obs, reward, terminated, info)

over an explicit :class:`EnvState` pytree.  ``jax.vmap`` over the batch axis
and ``shard_map`` over a device mesh compose on top (see
:mod:`mujoco_maze_tpu.envs.batched` / :mod:`mujoco_maze_tpu.parallel`).

Step-order parity with maze_env.py:448-481: manual robot kinematics →
engine substep → robot wall resolution → object-ball wall resolution →
observation (t already incremented) → task reward/termination heads.
"""

from __future__ import annotations

from typing import Any, Dict, List, NamedTuple, Optional, Tuple, Type

import jax
import jax.numpy as jnp
import numpy as np

from ..maze.cells import MazeCell
from ..maze.structure import MazeStructure, analyze_maze, with_ball_size
from ..models.base import Robot
from ..ops import segments
from ..physics import point_world
from ..tasks.core import MazeTask, TaskHeads

GRAVITY = 9.81
EPISODE_LIMIT = 1000  # reference max_episode_steps (__init__.py:31)


class EnvState(NamedTuple):
    """Per-env dynamic state (the carried pytree of the lockstep kernel)."""

    qpos: jnp.ndarray  # (nq,) robot dofs then world dofs
    qvel: jnp.ndarray  # (nv,)
    t: jnp.ndarray     # () int32 — env steps since reset
    key: jax.Array     # PRNG state for this env's reset stream
    goal_pos: Optional[jnp.ndarray] = None  # (G, 3) when the task resamples
                                            # goals per episode; else None


class StepResult(NamedTuple):
    state: EnvState
    obs: jnp.ndarray
    reward: jnp.ndarray
    terminated: jnp.ndarray
    truncated: jnp.ndarray
    info: Dict[str, jnp.ndarray]


# jax.export serializes pytree structure by registered name; without this
# any program carrying EnvState/StepResult in its signature (the step-API
# scan the benchmark AOT-caches) refuses to serialize (round-3 verdict:
# the silent cause of every zero-byte bench_step_api artifact).
try:
    from jax import export as _jexport

    _jexport.register_namedtuple_serialization(
        EnvState, serialized_name="mujoco_maze_tpu.EnvState")
    _jexport.register_namedtuple_serialization(
        StepResult, serialized_name="mujoco_maze_tpu.StepResult")
except Exception:  # older jax without the registration API
    pass


class _BlockRuntime(NamedTuple):
    """Static per-movable-block constants used inside the step kernel."""

    body_pos: jnp.ndarray   # (3,)
    half: jnp.ndarray       # (3,)
    axis_mask: jnp.ndarray  # (3,) 1.0 where x/y/z slide exists
    spin: bool
    falling: bool
    xy_lo: jnp.ndarray      # (2,) slide-center lower clamp
    xy_hi: jnp.ndarray      # (2,)
    z_lo: float
    qpos_idx: Tuple[int, ...]  # dof offsets into the full vector, axis order x,y,z,spin


class _BallRuntime(NamedTuple):
    body_pos: jnp.ndarray  # (2,)
    size: float
    qpos_idx: Tuple[int, ...]  # hinge kind: (x, y, rot); free kind: (adr,)
    kind: str = "hinge"        # "hinge" | "free"


class MazeEnvSpec:
    """Static description of one env ID; builds the pure reset/step fns."""

    # Point-path object-ball model constants (calibrated vs MuJoCo strike
    # goldens; see _step_balls)
    BALL_ROLL_DECAY = 0.5   # rolling friction: ball stops within ~10 steps
    BALL_KICK_GAIN = 2.0    # velocity gain per unit overlap per step

    def __init__(
        self,
        robot: Robot,
        maze_task: Type[MazeTask],
        maze_size_scaling: float,
        inner_reward_scaling: float = 1.0,
        maze_height: float = 0.5,
        restitution_coef: float = 0.8,
        task_kwargs: Optional[Dict[str, Any]] = None,
        dtype=jnp.float32,
    ) -> None:
        self.robot = robot
        self.task: MazeTask = maze_task(maze_size_scaling, **(task_kwargs or {}))
        self.heads: TaskHeads = self.task.lower()
        self.inner_reward_scaling = float(inner_reward_scaling)
        self.restitution_coef = float(restitution_coef)
        self.dtype = dtype

        structure = self.task.create_maze()
        ms = analyze_maze(
            structure,
            maze_size_scaling,
            maze_height,
            put_spin_near_agent=self.task.PUT_SPIN_NEAR_AGENT,
        )
        ms = with_ball_size(ms, self.task.OBJECT_BALL_SIZE)
        self.structure: MazeStructure = ms

        if robot.MANUAL_COLLISION:
            if robot.RADIUS is None:
                raise ValueError("Manual collision needs radius of the model")
            segs = ms.wall_segments(robot.RADIUS)
            self.walls = self._to_dtype_walls(segments.pad_walls(segs, max(len(segs), 1)))
        else:
            self.walls = None

        # exact mj_step replica for the Point robot (physics/point_world.py):
        # used in fidelity mode (dtype float64) — the float32 production path
        # keeps the closed-form residual + impedance maps, which are ~100x
        # cheaper and mm-accurate.  The replica needs float64 for its
        # bit-exact floor-contact switch anyway.
        self.point_world = None
        self.point_ball_world = None
        if (robot.MANUAL_COLLISION and dtype == jnp.float64
                and getattr(robot, "USES_POINT_WORLD", False)):
            self.point_world = (
                point_world.params_for_world(
                    any_blocks=bool(ms.movable_blocks), dt=robot.timestep,
                    torso_z=(0.75 + ms.height_offset) if ms.elevated
                    else 0.0),
                point_world.wall_boxes_from_structure(ms, dtype=jnp.float64),
            )
            if ms.object_balls and robot.OBJBALL_TYPE == "hinge":
                self.point_ball_world = point_world.ball_world_from_structure(
                    ms, dtype=jnp.float64)
            # XY movable blocks join the coupled solve; spin blocks keep
            # the approximate path (block_world_from_structure -> None);
            # z (falling) blocks ride the reduced f32 solve only
            self.point_block_world = point_world.block_world_from_structure(
                ms, dtype=jnp.float64)
        else:
            self.point_block_world = None
        # float32 production path: the reduced robot-prescribed object solve
        # (point_world.object_forward) replaces the round-1 calibrated
        # kick/quasi-static model — same derived impedance rows, objects
        # integrated by RK4 within the step (no single-sample aliasing),
        # blocks with momentum.  Falling (z) blocks joined in round 5
        # (allow_z below); spin blocks keep the approximate path.
        self.object_world = None
        if (robot.MANUAL_COLLISION and self.point_world is None
                and getattr(robot, "USES_POINT_WORLD", False)):
            oballs = None
            if ms.object_balls and robot.OBJBALL_TYPE == "hinge":
                oballs = point_world.ball_world_from_structure(ms, dtype=dtype)
            # allow_z: falling (z-slide) blocks join the reduced solve
            # (round-5) — gravity + floor support + joint limits; only
            # spin blocks keep the approximate path
            oblocks = point_world.block_world_from_structure(
                ms, dtype=dtype, allow_z=True)
            if oballs is not None or oblocks is not None:
                owp = point_world.params_for_world(
                    any_blocks=bool(ms.movable_blocks), dt=robot.timestep,
                    torso_z=(0.75 + ms.height_offset) if ms.elevated
                    else 0.0)
                owb = point_world.wall_boxes_from_structure(ms, dtype=dtype)
                self.object_world = (owp, owb, oballs, oblocks)
        ball_segs = ms.wall_segments(self.task.OBJECT_BALL_SIZE)
        self.objball_walls = self._to_dtype_walls(
            segments.pad_walls(ball_segs, max(len(ball_segs), 1))
        )

        # ---- world dof layout: robot dofs, then blocks, then balls ------
        self.dynamic_model = None
        self.contact_set = None
        if getattr(robot, "USES_WORLD_ENGINE", False):
            self._build_engine_world()
            self.init_qpos = self.dynamic_model.qpos0.copy()
        else:
            self._build_world_layout()
            init_qpos = np.zeros(self.nq, dtype=np.float64)
            init_qpos[: robot.nq] = robot.init_qpos(ms.height_offset)
            self.init_qpos = init_qpos
        self.init_qvel = np.zeros(self.nv, dtype=np.float64)

        # ---- observation metadata ---------------------------------------
        n_objects = 0
        if self.task.OBSERVE_BALLS:
            n_objects += len(ms.object_balls)
        if self.task.OBSERVE_BLOCKS:
            n_objects += len(ms.movable_blocks)
        self.obs_dim = robot.obs_dim + 3 * n_objects + 1
        if self.task.TOP_DOWN_VIEW:
            self.obs_dim += self.TOP_DOWN_VIEW_SIZE**2 * 3
        self.has_extended_obs = (
            self.task.TOP_DOWN_VIEW or self.task.OBSERVE_BLOCKS or self.task.OBSERVE_BALLS
        )

    # ------------------------------------------------------------------
    def _to_dtype_walls(self, w: segments.Walls) -> segments.Walls:
        return segments.Walls(
            p1=w.p1.astype(self.dtype), p2=w.p2.astype(self.dtype), mask=w.mask
        )

    def _build_world_layout(self) -> None:
        ms = self.structure
        robot = self.robot
        grid = ms.grid
        s = ms.size_scaling
        next_idx = robot.nq  # world layout is 1 qpos per dof → nq == nv offsets

        blocks: List[_BlockRuntime] = []
        for b in ms.movable_blocks:
            idxs = []
            axis = [0.0, 0.0, 0.0]
            for k, present in enumerate((b.move_x, b.move_y, b.move_z)):
                if present:
                    idxs.append(next_idx)
                    next_idx += 1
                    axis[k] = 1.0
                else:
                    idxs.append(-1)
            if b.spin:
                # Divergence: reference uses a ball joint (maze_env.py:649-660);
                # we model spin as a single z hinge. No stock task uses SPIN.
                idxs.append(next_idx)
                next_idx += 1
            else:
                idxs.append(-1)
            xy_lo, xy_hi = self._block_xy_limits(b)
            blocks.append(
                _BlockRuntime(
                    body_pos=jnp.asarray(np.asarray(b.pos), self.dtype),
                    half=jnp.asarray(np.asarray(b.size), self.dtype),
                    axis_mask=jnp.asarray(axis, self.dtype),
                    spin=b.spin,
                    falling=b.falling,
                    xy_lo=jnp.asarray(xy_lo, self.dtype),
                    xy_hi=jnp.asarray(xy_hi, self.dtype),
                    z_lo=float(b.z_range[0]),
                    qpos_idx=tuple(idxs),
                )
            )
        self.block_runtimes = tuple(blocks)

        balls: List[_BallRuntime] = []
        for ob in ms.object_balls:
            idxs = (next_idx, next_idx + 1, next_idx + 2)  # x, y, rot (hinge type)
            next_idx += 3
            balls.append(
                _BallRuntime(
                    body_pos=jnp.asarray(np.asarray(ob.pos), self.dtype),
                    size=float(ob.size),
                    qpos_idx=idxs,
                )
            )
        self.ball_runtimes = tuple(balls)

        self.nq = next_idx
        self.nv = next_idx
        self.grid_arr = jnp.asarray(ms.grid)

    def _build_engine_world(self) -> None:
        """Compose robot + movable objects + static maze geoms into ONE
        RigidModel stepped by the engine with contacts (the Ant path).

        Replaces the reference's XML world synthesis (maze_env.py:97-217):
        movable blocks become slide/ball-jointed box bodies whose travel
        limits encode block-vs-wall collision; object balls become freejoint
        spheres; BLOCK cells and elevated platforms become static AABBs; the
        floor is a plane.  All MuJoCo default-class params of the robot XML
        carry over, including the solimp hardening applied when movable
        blocks exist (maze_env.py:108-112).
        """
        from ..physics import contact as contact_mod
        from ..physics import engine as engine_mod
        from ..physics.model import (
            BALL as J_BALL,
            FREE as J_FREE,
            SLIDE as J_SLIDE,
            Body,
            Geom,
            Joint,
            build_model,
        )

        ms = self.structure
        robot = self.robot
        bodies, actuators = robot.build_bodies(
            torso_z=0.75 + ms.height_offset
        )
        n_robot_bodies = len(bodies)

        geom_default = dict(robot.WORLD_GEOM_DEFAULTS)
        if ms.any_blocks:
            # better contact detection with movable blocks (maze_env.py:108-112)
            geom_default["solimp"] = (0.995, 0.995, 0.01)
            for _, g in [(i, g) for b in bodies for i, g in enumerate(b.geoms)]:
                g.solimp = (0.995, 0.995, 0.01)

        block_joint_names: List[Tuple[str, object]] = []
        for b in ms.movable_blocks:
            joints = []
            lo, hi = self._block_xy_limits(b)
            if b.move_x:
                joints.append(
                    Joint(
                        J_SLIDE, axis=(1, 0, 0), name=f"{b.name}_x",
                        limited=True,
                        range=(lo[0] - b.pos[0], hi[0] - b.pos[0]),
                    )
                )
            if b.move_y:
                joints.append(
                    Joint(
                        J_SLIDE, axis=(0, 1, 0), name=f"{b.name}_y",
                        limited=True,
                        range=(lo[1] - b.pos[1], hi[1] - b.pos[1]),
                    )
                )
            if b.move_z:
                # limited=False: the z limit is resolved COUPLED with the
                # platform-support contact (support_qfrc below) — the
                # reference block is synthesized overlapping its platform
                # and perches ON TOP of it with the (−h, 0) limit softly
                # violated by ~h (probed MuJoCo 3: AntFall z settles at
                # +3.92 of limit hi=0); the decoupled engine limit clamp
                # would slam it back down
                joints.append(
                    Joint(
                        J_SLIDE, axis=(0, 0, 1), name=f"{b.name}_z",
                        limited=False, range=b.z_range,
                    )
                )
            if b.spin:
                joints.append(Joint(J_BALL, name=f"{b.name}_spin"))
            bodies.append(
                Body(
                    name=b.name,
                    parent=-1,
                    pos=b.pos,
                    joints=joints,
                    geoms=[
                        Geom(
                            gtype=2,  # box
                            size=b.size,
                            mass=b.mass,
                            contype=1,
                            conaffinity=1,
                            **geom_default,
                        )
                    ],
                )
            )
            block_joint_names.append((b.name, b))
        for ob in ms.object_balls:
            # freejoint object ball (ant path — maze_env.py:539-560)
            ball_geom = Geom(
                gtype=0,
                size=(ob.size,),
                pos=(0.0, 0.0, ob.size),
                contype=1,
                conaffinity=1,
                density=geom_default.get("density", 1000.0),
                friction=geom_default.get("friction", (1.0, 0.5, 0.5)),
                solref=geom_default.get("solref", (0.02, 1.0)),
                solimp=(0.9, 0.99, 0.001),
                margin=geom_default.get("margin", 0.0),
            )
            bodies.append(
                Body(
                    name=ob.name,
                    parent=-1,
                    pos=(ob.pos[0], ob.pos[1], 0.0),
                    joints=[Joint(J_FREE, name=f"{ob.name}_root")],
                    geoms=[ball_geom],
                )
            )

        statics = [
            Geom(gtype=3, size=(), pos=(0, 0, 0), contype=1, conaffinity=1,
                 friction=geom_default.get("friction", (1.0, 0.5, 0.5)),
                 solref=geom_default.get("solref", (0.02, 1.0)),
                 solimp=geom_default.get("solimp", (0.8, 0.8, 0.01)),
                 margin=geom_default.get("margin", 0.0))
        ]
        for pos, size in zip(ms.block_pos, ms.block_size):
            statics.append(
                Geom(gtype=2, size=tuple(size), pos=tuple(pos),
                     contype=1, conaffinity=1, **geom_default)
            )
        for pos, size in zip(ms.platform_pos, ms.platform_size):
            statics.append(
                Geom(gtype=2, size=tuple(size), pos=tuple(pos),
                     contype=1, conaffinity=1, **geom_default)
            )

        model = build_model(
            bodies,
            actuators,
            timestep=robot.timestep,
            static_geoms=statics,
        )
        self.dynamic_model = engine_mod.prepare(model)
        self.contact_set = contact_mod.build_contact_set(model)
        self.nq = model.nq
        self.nv = model.nv
        self.grid_arr = jnp.asarray(ms.grid)

        # Support + z-limit for z-slide ("falling") blocks, resolved as a
        # COUPLED 2-row impedance solve (round-5).  Reference geometry
        # (probed on MuJoCo 3): the fall block is synthesized overlapping
        # its own elevated platform box (maze_env.py:578-586); box-box
        # contact pops it out ON TOP, where it perches with the (−h, 0)
        # z limit softly violated by ~h — an equilibrium between the
        # saturated platform contact (solimp .995/.995/.01, 4 face
        # corners) and the saturated soft limit (solimp .9/.95/.001).
        # AntFall settle probe: MuJoCo z = +3.9217; this solve matches.
        # Pushed past the platform edge (over the chasm), the support
        # target drops to the global floor plane (which extends under
        # chasm cells) and the block falls flush — the Fall bridge.
        falling = []
        k = 0
        jadr_by_name = {}
        for bidx, b in enumerate(bodies):
            for jn in b.joints:
                jadr_by_name[jn.name] = (int(model.jnt_dofadr[k]), bidx)
                k += 1
        for name, b in block_joint_names:
            if b.falling:
                zdof, bodyidx = jadr_by_name[f"{name}_z"]
                half_z = float(b.size[2])
                # platforms reachable within the block's xy travel
                plats = []
                for ppos, psize in zip(ms.platform_pos, ms.platform_size):
                    if (abs(ppos[0] - b.pos[0])
                            < b.xy_range + b.size[0] + psize[0] + 1e-9
                            and abs(ppos[1] - b.pos[1])
                            < b.xy_range + b.size[1] + psize[1] + 1e-9):
                        plats.append((
                            float(ppos[0]), float(ppos[1]),
                            float(psize[0] + b.size[0]),
                            float(psize[1] + b.size[1]),
                            float(ppos[2] + psize[2]),
                        ))
                falling.append((bodyidx, zdof, half_z, tuple(plats)))
        self._falling_blocks = tuple(
            (bodyidx, zdof) for bodyidx, zdof, _, _ in falling)
        self._falling_support = tuple(falling)
        tc = max(0.02, 2.0 * robot.timestep)
        self._support_params = (tc, 0.95, 2.0 / (0.95 * tc), 0.95 / (0.95**2 * tc**2))

        def support_qfrc(kd, qacc0, Minv, qvel_now):
            from ..physics.contact import falling_support_force

            qfrc = jnp.zeros(self.nv, qvel_now.dtype)
            tc_ = max(0.02, 2.0 * float(robot.timestep))
            for bodyidx, zdof, half_z, plats in self._falling_support:
                center = kd.fkr.body_pos[bodyidx]
                bpz = float(self.dynamic_model.body_pos[bodyidx][2])
                z = center[2] - jnp.asarray(bpz, qvel_now.dtype)
                bottom = bpz + z - half_z
                # platform-aware support target: the highest overlapped top
                s = jnp.zeros_like(z)
                for (px, py, ox, oy, top) in plats:
                    over = ((jnp.abs(center[0] - px) < ox)
                            & (jnp.abs(center[1] - py) < oy))
                    s = jnp.maximum(s, jnp.where(over, top, 0.0))
                f_net = falling_support_force(
                    z, bottom, s, qvel_now[zdof], qacc0[zdof],
                    Minv[zdof, zdof] + 1e-12, tc_)
                qfrc = qfrc.at[zdof].add(f_net)
            return qfrc

        self.engine_support_qfrc = support_qfrc

        # obs runtimes from the model's joint addresses
        name_to_qadr = {}
        k = 0
        for b in bodies:
            for jn in b.joints:
                name_to_qadr[jn.name] = int(model.jnt_qposadr[k])
                k += 1
        blocks: List[_BlockRuntime] = []
        for name, b in block_joint_names:
            idxs = [
                name_to_qadr.get(f"{name}_x", -1),
                name_to_qadr.get(f"{name}_y", -1),
                name_to_qadr.get(f"{name}_z", -1),
                name_to_qadr.get(f"{name}_spin", -1),
            ]
            lo, hi = self._block_xy_limits(b)
            blocks.append(
                _BlockRuntime(
                    body_pos=jnp.asarray(np.asarray(b.pos), self.dtype),
                    half=jnp.asarray(np.asarray(b.size), self.dtype),
                    axis_mask=jnp.asarray(
                        [float(b.move_x), float(b.move_y), float(b.move_z)],
                        self.dtype,
                    ),
                    spin=b.spin,
                    falling=b.falling,
                    xy_lo=jnp.asarray(lo, self.dtype),
                    xy_hi=jnp.asarray(hi, self.dtype),
                    z_lo=float(b.z_range[0]),
                    qpos_idx=tuple(idxs),
                )
            )
        self.block_runtimes = tuple(blocks)
        balls: List[_BallRuntime] = []
        for ob in ms.object_balls:
            adr = name_to_qadr[f"{ob.name}_root"]
            balls.append(
                _BallRuntime(
                    body_pos=jnp.asarray(np.asarray(ob.pos), self.dtype),
                    size=float(ob.size),
                    qpos_idx=(adr,),
                    kind="free",
                )
            )
        self.ball_runtimes = tuple(balls)

    def _block_xy_limits(self, b) -> Tuple[np.ndarray, np.ndarray]:
        """Static travel limits of a movable block's center per axis.

        Walks the grid row/col outward from the block cell until a BLOCK cell
        bounds it (contact analog of block-vs-wall collision); falling blocks
        additionally carry the reference's ±size_scaling slide range
        (maze_env.py:615-633).
        """
        ms = self.structure
        grid = ms.grid
        s = ms.size_scaling
        h_cells, w_cells = grid.shape
        i, j = b.row, b.col
        sx, sy = b.size[0], b.size[1]

        def face_x(col: int) -> float:
            return col * s - ms.torso_x

        def face_y(row: int) -> float:
            return row * s - ms.torso_y

        # +x
        jj = j
        while jj + 1 < w_cells and not MazeCell(grid[i, jj + 1]).is_block():
            jj += 1
        x_hi = face_x(jj) + s * 0.5 - sx
        jj = j
        while jj - 1 >= 0 and not MazeCell(grid[i, jj - 1]).is_block():
            jj -= 1
        x_lo = face_x(jj) - s * 0.5 + sx
        ii = i
        while ii + 1 < h_cells and not MazeCell(grid[ii + 1, j]).is_block():
            ii += 1
        y_hi = face_y(ii) + s * 0.5 - sy
        ii = i
        while ii - 1 >= 0 and not MazeCell(grid[ii - 1, j]).is_block():
            ii -= 1
        y_lo = face_y(ii) - s * 0.5 + sy
        if b.falling:
            x_lo = max(x_lo, b.pos[0] - b.xy_range)
            x_hi = min(x_hi, b.pos[0] + b.xy_range)
            y_lo = max(y_lo, b.pos[1] - b.xy_range)
            y_hi = min(y_hi, b.pos[1] + b.xy_range)
        return (
            np.array([x_lo, y_lo], dtype=np.float64),
            np.array([x_hi, y_hi], dtype=np.float64),
        )

    # ------------------------------------------------------------------
    # world-object helpers (traced; all loops unroll over static specs)
    # ------------------------------------------------------------------
    def _object_dof_idx(self) -> Tuple[int, ...]:
        """Env-layout qpos indices of the object dofs, in the reduced
        solver's layout (balls x/y/rot first, then block x[,y])."""
        idx: List[int] = []
        if self.object_world is not None and self.object_world[2] is not None:
            for ob in self.ball_runtimes:
                idx.extend(ob.qpos_idx)  # hinge kind: (x, y, rot)
        if self.object_world is not None and self.object_world[3] is not None:
            for b in self.block_runtimes:
                idx.extend(i for i in b.qpos_idx[:3] if i >= 0)
        return tuple(idx)

    def _block_center(self, qpos: jnp.ndarray, b: _BlockRuntime) -> jnp.ndarray:
        """(3,) current block body origin."""
        disp = []
        for k in range(3):
            idx = b.qpos_idx[k]
            disp.append(qpos[idx] if idx >= 0 else jnp.zeros((), self.dtype))
        return b.body_pos + jnp.stack(disp)

    def _ball_center(self, qpos: jnp.ndarray, ob: _BallRuntime) -> jnp.ndarray:
        """(2,) current ball body origin (xy)."""
        if ob.kind == "free":
            adr = ob.qpos_idx[0]
            return qpos[adr : adr + 2]
        return ob.body_pos + jnp.stack([qpos[ob.qpos_idx[0]], qpos[ob.qpos_idx[1]]])

    def _ball_center3(self, qpos: jnp.ndarray, ob: _BallRuntime) -> jnp.ndarray:
        """(3,) ball body origin — the reference's get_body_com(objball)."""
        if ob.kind == "free":
            adr = ob.qpos_idx[0]
            return qpos[adr : adr + 3]
        return jnp.concatenate(
            [self._ball_center(qpos, ob), jnp.zeros((1,), self.dtype)]
        )

    def _cell_at(self, xy: jnp.ndarray) -> jnp.ndarray:
        """Grid cell value under a world xy position (clamped to bounds)."""
        ms = self.structure
        s = ms.size_scaling
        col = jnp.round((xy[0] + ms.torso_x) / s).astype(jnp.int32)
        row = jnp.round((xy[1] + ms.torso_y) / s).astype(jnp.int32)
        h_cells, w_cells = ms.grid.shape
        row = jnp.clip(row, 0, h_cells - 1)
        col = jnp.clip(col, 0, w_cells - 1)
        return self.grid_arr[row, col]

    def _push_blocks(
        self, qpos: jnp.ndarray, qvel: jnp.ndarray, robot_xy: jnp.ndarray, dt: float
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Quasi-static push of near-massless blocks by the robot disc.

        Replaces the reference's MuJoCo soft contacts between robot geoms and
        movable-block boxes (mass 2e-4, maze_env.py:602) with a positional
        projection: overlap of the robot's contact disc with the block AABB
        is resolved by translating the block along its movable axes, clamped
        to its static travel limits.  A second pass separates overlapping
        block PAIRS (MultiPush/PushMaze worlds) along the axis of least
        penetration — the quasi-static analog of the f64 path's block-block
        contact rows (physics/point_world.py), split evenly when both
        blocks can move on that axis.
        """
        r = self.robot.RADIUS if self.robot.RADIUS is not None else 0.5
        for b in self.block_runtimes:
            center = self._block_center(qpos, b)
            # closest point on AABB (xy) to robot center
            lo = center[:2] - b.half[:2]
            hi = center[:2] + b.half[:2]
            closest = jnp.clip(robot_xy, lo, hi)
            d = robot_xy - closest
            dist = jnp.sqrt(jnp.sum(d * d) + 1e-12)
            overlap = r - dist
            # Push direction: away from robot. If robot center inside AABB,
            # push along the axis of minimal exit.
            n = jnp.where(dist > 1e-6, -d / dist, jnp.zeros(2, self.dtype))
            inside = dist <= 1e-6
            # axis of min penetration when inside
            pen = jnp.stack([hi[0] - robot_xy[0], robot_xy[0] - lo[0],
                             hi[1] - robot_xy[1], robot_xy[1] - lo[1]])
            k = jnp.argmin(pen)
            n_inside = jnp.stack(
                [
                    jnp.where(k == 0, 1.0, jnp.where(k == 1, -1.0, 0.0)),
                    jnp.where(k == 2, 1.0, jnp.where(k == 3, -1.0, 0.0)),
                ]
            ).astype(self.dtype)
            n = jnp.where(inside, n_inside, n)
            push = jnp.where(overlap > 0, overlap, 0.0) * n
            push = push * b.axis_mask[:2]
            # z dof: reference blocks rest with their bottom on the global
            # floor plane (see _build_engine_world note) — z stays at 0.
            for k2 in range(2):
                idx = b.qpos_idx[k2]
                if idx >= 0:
                    newc = jnp.clip(
                        center[k2] + push[k2], b.xy_lo[k2], b.xy_hi[k2]
                    )
                    qpos = qpos.at[idx].set(newc - b.body_pos[k2])
        # block-block separation (pairs, least-penetration axis)
        for i in range(len(self.block_runtimes)):
            for j in range(i + 1, len(self.block_runtimes)):
                qpos = self._separate_blocks(
                    qpos, self.block_runtimes[i], self.block_runtimes[j]
                )
        return qpos, qvel

    def _separate_blocks(
        self, qpos: jnp.ndarray, bi: _BlockRuntime, bj: _BlockRuntime
    ) -> jnp.ndarray:
        """Project two overlapping movable blocks apart (xy AABBs)."""
        ci = self._block_center(qpos, bi)[:2]
        cj = self._block_center(qpos, bj)[:2]
        pen = (bi.half[:2] + bj.half[:2]) - jnp.abs(ci - cj)
        overlapping = (pen[0] > 0) & (pen[1] > 0)
        use_x = pen[0] <= pen[1]
        for axis in range(2):
            sel = overlapping & (use_x if axis == 0 else ~use_x)
            d = jnp.where(pen[axis] > 0, pen[axis], 0.0)
            sgn = jnp.sign(cj[axis] - ci[axis])
            sgn = jnp.where(sgn == 0, 1.0, sgn)
            # movable on this axis ⇔ a slide dof exists (static int check)
            mi = 1.0 if bi.qpos_idx[axis] >= 0 else 0.0
            mj = 1.0 if bj.qpos_idx[axis] >= 0 else 0.0
            tot = mi + mj
            if tot == 0:
                continue
            share_i = mi / tot
            share_j = mj / tot
            if bi.qpos_idx[axis] >= 0 and share_i > 0:
                newc = jnp.clip(
                    ci[axis] - jnp.where(sel, d * share_i, 0.0) * sgn,
                    bi.xy_lo[axis], bi.xy_hi[axis],
                )
                qpos = qpos.at[bi.qpos_idx[axis]].set(newc - bi.body_pos[axis])
            if bj.qpos_idx[axis] >= 0 and share_j > 0:
                newc = jnp.clip(
                    cj[axis] + jnp.where(sel, d * share_j, 0.0) * sgn,
                    bj.xy_lo[axis], bj.xy_hi[axis],
                )
                qpos = qpos.at[bj.qpos_idx[axis]].set(newc - bj.body_pos[axis])
        return qpos

    def _spin_blocks(
        self,
        qpos: jnp.ndarray,
        qvel: jnp.ndarray,
        robot_xy: jnp.ndarray,
        old_xy: jnp.ndarray,
        dt: float,
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """SPIN cells (``PUT_SPIN_NEAR_AGENT``): rotor driven by rolling
        contact with the robot disc.

        The reference synthesizes the spin block as a thin near-massless box
        on an undamped free ball joint (maze_env.py:576-578,602,649-660); we
        model the documented z-hinge reduction (``_build_world_layout``).
        With friction 1.0 and block mass ~2e-4 the contact is the no-slip
        massless limit: while touching, the block's surface velocity at the
        contact point matches the robot's, i.e. ω := (r × v_robot)_z / |r|²
        about the hinge; off contact ω persists (zero damping); θ integrates
        every step.  The robot is not pushed back (the block yields first at
        this mass ratio).
        """
        r = self.robot.RADIUS if self.robot.RADIUS is not None else 0.5
        vel = (robot_xy - old_xy) / dt
        for b in self.block_runtimes:
            if not b.spin:
                continue
            idx = b.qpos_idx[3]
            th = qpos[idx]
            om = qvel[idx]
            a = b.half[0]
            c = b.body_pos[:2]
            ct, st = jnp.cos(th), jnp.sin(th)
            rel = robot_xy - c
            # robot center in the (rotated) block frame
            px = ct * rel[0] + st * rel[1]
            py = -st * rel[0] + ct * rel[1]
            cx = jnp.clip(px, -a, a)
            cy = jnp.clip(py, -a, a)
            dx, dy = px - cx, py - cy
            touching = dx * dx + dy * dy < r * r  # includes center-inside
            # lever arm hinge → contact point, world frame
            lx = ct * cx - st * cy
            ly = st * cx + ct * cy
            lev2 = lx * lx + ly * ly + jnp.asarray(1e-9, self.dtype)
            om_match = (lx * vel[1] - ly * vel[0]) / lev2
            om = jnp.where(touching, om_match, om).astype(self.dtype)
            th = th + om * dt
            qpos = qpos.at[idx].set(th)
            qvel = qvel.at[idx].set(om)
        return qpos, qvel

    def _step_balls(
        self,
        qpos: jnp.ndarray,
        qvel: jnp.ndarray,
        robot_xy: jnp.ndarray,
        robot_disp: jnp.ndarray,
        dt: float,
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Object-ball dynamics: strike by robot, roll with decay, wall bounce.

        Replaces MuJoCo sphere-sphere contact between the robot body sphere
        (radius 0.5, point.xml:22) and the object ball with an impulse model,
        and the engine's ball-wall contacts with the manual segment resolution
        the reference applies at maze_env.py:466-473 (but written to the
        ball's qpos — the reference's write to ``xipos`` was a no-op on
        dynamics).
        """
        ROBOT_GEOM_R = 0.5
        # Calibrated against directed-strike MuJoCo goldens
        # (tests/goldens/PointBilliard-v0_strike.npz): the engine transfers
        # only a small fraction of the robot's teleport velocity into the
        # ball, and rolling friction stops the ball within ~10 steps.
        DECAY = self.BALL_ROLL_DECAY
        KICK = self.BALL_KICK_GAIN
        for ob in self.ball_runtimes:
            xi, yi, _ = ob.qpos_idx
            center = self._ball_center(qpos, ob)
            vel = jnp.stack([qvel[xi], qvel[yi]])
            # strike: robot disc overlapping ball → soft impedance push
            # (velocity gain ∝ overlap, direction away from the robot's
            # current center — no positional snap; matches the soft-contact
            # behavior where a teleporting robot passes through a light
            # ball, nudging it rather than plowing it)
            d = center - robot_xy
            dist = jnp.sqrt(jnp.sum(d * d) + 1e-12)
            overlap = (ROBOT_GEOM_R + ob.size) - dist
            n = d / dist
            hit = overlap > 0.0
            vel = jnp.where(hit, vel + n * overlap * KICK, vel)
            # integrate
            old_center = center
            center = center + vel * dt
            vel = vel * (1.0 - DECAY)
            # wall bounce with restitution (manual segment resolution)
            resolved = segments.resolve(
                self.objball_walls, old_center, center, self.restitution_coef
            )
            bounced = jnp.any(jnp.abs(resolved - center) > 1e-7)
            # reflect velocity about the wall when bounced: approximate by
            # steering velocity along the resolved motion direction.
            move = resolved - old_center
            mnorm = jnp.sqrt(jnp.sum(move * move) + 1e-12)
            speed = jnp.sqrt(jnp.sum(vel * vel))
            vel = jnp.where(
                bounced & (mnorm > 1e-6),
                move / mnorm * speed * self.restitution_coef,
                vel,
            )
            qpos = qpos.at[xi].set(resolved[0] - ob.body_pos[0])
            qpos = qpos.at[yi].set(resolved[1] - ob.body_pos[1])
            qvel = qvel.at[xi].set(vel[0])
            qvel = qvel.at[yi].set(vel[1])
        return qpos, qvel

    # ------------------------------------------------------------------
    # top-down view (generalized port of maze_env.py:262-349)
    # ------------------------------------------------------------------
    TOP_DOWN_VIEW_SIZE = 5  # reference fixed 5x5x3 (maze_env.py:95)

    def _top_down_view(self, state: EnvState) -> jnp.ndarray:
        """Egocentric (V, V, 3) occupancy: walls, chasms, movable blocks.

        Fractional-area splatting over a 3x3 stencil per item, vectorized;
        the reference's hardcoded ``2 +`` center offsets generalize to
        ``V // 2`` (SURVEY quirk list).
        """
        ms = self.structure
        s = ms.size_scaling
        V = self.TOP_DOWN_VIEW_SIZE
        c = V // 2
        robot_xy = state.qpos[:2]

        # static item positions (world): walls (d=0), chasms (d=1)
        items_xy: List[np.ndarray] = []
        items_d: List[int] = []
        h_cells, w_cells = ms.grid.shape
        for i in range(h_cells):
            for j in range(w_cells):
                cell = MazeCell(int(ms.grid[i, j]))
                if cell.is_block():
                    items_xy.append(
                        np.array([j * s - ms.torso_x, i * s - ms.torso_y])
                    )
                    items_d.append(0)
                elif cell.is_chasm():
                    items_xy.append(
                        np.array([j * s - ms.torso_x, i * s - ms.torso_y])
                    )
                    items_d.append(1)
        static_xy = jnp.asarray(
            np.asarray(items_xy, dtype=np.float64).reshape(-1, 2), self.dtype
        )
        static_d = np.asarray(items_d, dtype=np.int32)

        view = jnp.zeros((V, V, 3), self.dtype)

        def splat(view, xy_rel, d):
            # (N, 2) relative positions, static depth index d per item
            row = c + (xy_rel[:, 1] + s / 2) / s
            col = c + (xy_rel[:, 0] + s / 2) / s
            r0 = jnp.floor(row).astype(jnp.int32)
            c0 = jnp.floor(col).astype(jnp.int32)
            rf = row - r0
            cf = col - c0
            wr = jnp.stack(
                [
                    jnp.maximum(0.0, 0.5 - rf),
                    jnp.minimum(1.0, rf + 0.5) - jnp.maximum(0.0, rf - 0.5),
                    jnp.maximum(0.0, rf - 0.5),
                ],
                axis=-1,
            )  # (N, 3)
            wc = jnp.stack(
                [
                    jnp.maximum(0.0, 0.5 - cf),
                    jnp.minimum(1.0, cf + 0.5) - jnp.maximum(0.0, cf - 0.5),
                    jnp.maximum(0.0, cf - 0.5),
                ],
                axis=-1,
            )
            for dr in range(3):
                for dc in range(3):
                    rr = r0 + (dr - 1)
                    cc = c0 + (dc - 1)
                    w = wr[:, dr] * wc[:, dc]
                    valid = (rr >= 0) & (rr < V) & (cc >= 0) & (cc < V)
                    rr = jnp.clip(rr, 0, V - 1)
                    cc = jnp.clip(cc, 0, V - 1)
                    view = view.at[rr, cc, d].add(jnp.where(valid, w, 0.0))
            return view

        if len(static_d):
            for depth in (0, 1):
                sel = np.nonzero(static_d == depth)[0]
                if len(sel):
                    view = splat(view, static_xy[sel] - robot_xy[None, :], depth)
        if self.block_runtimes:
            block_xy = jnp.stack(
                [self._block_center(state.qpos, b)[:2] for b in self.block_runtimes]
            )
            view = splat(view, block_xy - robot_xy[None, :], 2)
        return view

    # ------------------------------------------------------------------
    # observation assembly (maze_env.py:351-369)
    # ------------------------------------------------------------------
    def _observe(self, state: EnvState) -> jnp.ndarray:
        robot_obs = self.robot.observe(state.qpos, state.qvel).astype(self.dtype)
        extras = []
        if self.task.OBSERVE_BALLS:
            for ob in self.ball_runtimes:
                extras.append(self._ball_center3(state.qpos, ob))
        if self.task.OBSERVE_BLOCKS:
            for b in self.block_runtimes:
                extras.append(self._block_center(state.qpos, b))
        tail = [robot_obs[3:]]
        if self.task.TOP_DOWN_VIEW:
            tail.append(self._top_down_view(state).reshape(-1))
        tail.append((state.t.astype(self.dtype) * 0.001)[None])
        return jnp.concatenate([robot_obs[:3], *extras, *tail])

    # ------------------------------------------------------------------
    # pure reset / step
    # ------------------------------------------------------------------
    def reset(self, key: jax.Array) -> Tuple[EnvState, jnp.ndarray]:
        knoise, kstart, knext = jax.random.split(key, 3)
        qpos0 = jnp.asarray(self.init_qpos, self.dtype)
        qvel0 = jnp.asarray(self.init_qvel, self.dtype)
        qpos_noise, qvel_noise = self.robot.reset_noise(knoise, self.nq, self.nv)
        qpos = qpos0 + qpos_noise.astype(self.dtype)
        qvel = qvel0 + qvel_noise.astype(self.dtype)
        if self.robot.ZERO_WORLD_DOFS_ON_RESET:
            rq, rv = self.robot.nq, self.robot.nv
            mask_q = jnp.arange(self.nq) < rq
            mask_v = jnp.arange(self.nv) < rv
            qpos = jnp.where(mask_q, qpos, qpos0)
            qvel = jnp.where(mask_v, qvel, 0.0)
        # multiple ROBOT cells → uniform random start (maze_env.py:378-380,
        # with the reference's np.random.choice-on-tuples bug fixed)
        inits = self.structure.init_positions
        if len(inits) > 1:
            arr = jnp.asarray(np.asarray(inits, dtype=np.float64), self.dtype)
            xy = arr[jax.random.randint(kstart, (), 0, len(inits))]
            qpos = qpos.at[:2].set(xy)
        # per-episode goal resampling (fixed reference hook — see
        # tasks/core.py sample_goal_positions)
        goal_pos = None
        if self.task.sample_goals():
            kgoal, knext = jax.random.split(knext)
            goal_pos = jnp.asarray(
                self.task.sample_goal_positions(kgoal), self.dtype
            )
        state = EnvState(
            qpos=qpos, qvel=qvel, t=jnp.zeros((), jnp.int32), key=knext,
            goal_pos=goal_pos,
        )
        return state, self._observe(state)

    def step(self, state: EnvState, action: jnp.ndarray) -> StepResult:
        if self.robot.MANUAL_COLLISION:
            new_state, inner_reward = self._step_manual(state, action)
            inner_info = {}  # reference Point info is {} (point.py:61)
        else:
            new_state, inner_reward, inner_info = self._step_dynamic(state, action)
        obs = self._observe(new_state)
        reward = (
            self.inner_reward_scaling * inner_reward
            + self.heads.reward(obs, new_state.goal_pos)
        ).astype(self.dtype)
        terminated = self.heads.termination(obs, new_state.goal_pos)
        truncated = new_state.t >= EPISODE_LIMIT
        # info parity: inner-step reward breakdown (ant.py:71-73,
        # swimmer.py:44-47) + position (maze_env.py:480)
        info = {**inner_info, "position": new_state.qpos[:2]}
        return StepResult(new_state, obs, reward, terminated, truncated, info)

    def _step_manual(
        self, state: EnvState, action: jnp.ndarray
    ) -> Tuple[EnvState, jnp.ndarray]:
        """Point path (maze_env.py:450-473)."""
        robot = self.robot
        dt = robot.dt
        qpos, qvel = state.qpos, state.qvel
        old_xy = qpos[:2]
        # robot kinematics + full-state velocity clip (point.py:44-57)
        qpos, qvel = robot.kinematic_step(qpos, qvel, action.astype(self.dtype))
        kin_xy = qpos[:2]
        if self.point_world is not None:
            # fidelity mode: exact mj_step replica (RK4 over smooth dynamics
            # + MuJoCo's soft contact model, physics/point_world.py) — the
            # per-step residual matches MuJoCo 3 bit-exactly on contact-free
            # steps and to solver tolerance on wall presses.
            pwp, pwb = self.point_world
            if (self.point_ball_world is not None
                    or self.point_block_world is not None):
                # coupled robot + object solve (rk4_step_world): ball and
                # XY-block contacts all ride the same Newton solve,
                # matching mj_step bit-for-bit on the strike probes
                # (see physics/point_world.py).
                idx_list = []
                if self.point_ball_world is not None:
                    idx_list += [i for ob in self.ball_runtimes
                                 for i in ob.qpos_idx]
                if self.point_block_world is not None:
                    for b in self.block_runtimes:
                        idx_list += [i for i in b.qpos_idx[:2] if i >= 0]
                idxs = jnp.asarray(idx_list)
                qw = jnp.concatenate([qpos[:3], qpos[idxs]])
                vw = jnp.concatenate([qvel[:3], qvel[idxs]])
                qw, vw = point_world.rk4_step_world(
                    pwp, pwb, self.point_ball_world, qw, vw,
                    self.point_block_world)
                qpos = qpos.at[:3].set(qw[:3]).at[idxs].set(qw[3:])
                qvel = qvel.at[:3].set(vw[:3]).at[idxs].set(vw[3:])
            else:
                q3, v3 = point_world.rk4_step(pwp, pwb, qpos[:3], qvel[:3])
                qpos = qpos.at[:3].set(q3)
                qvel = qvel.at[:3].set(v3)
                if self.ball_runtimes:
                    qpos, qvel = self._step_balls(
                        qpos, qvel, qpos[:2], qpos[:2] - old_xy, dt
                    )
            if self.block_runtimes and self.point_block_world is None:
                qpos, qvel = self._push_blocks(qpos, qvel, qpos[:2], dt)
        else:
            # world objects first, from the post-teleport pre-residual robot
            # state — that is what the engine's mj_step saw (the reduced
            # solve advances the robot kinematically through its RK4
            # stages, physics/point_world.py object_forward).
            if self.object_world is not None:
                owp, owb, oballs, oblocks = self.object_world
                oidx = jnp.asarray(self._object_dof_idx())
                qo, vo = point_world.rk4_object_step(
                    owp, owb, oballs, oblocks,
                    qpos[:3], qvel[:3], qpos[oidx], qvel[oidx],
                    floor_always=True)
                qpos = qpos.at[oidx].set(qo.astype(self.dtype))
                qvel = qvel.at[oidx].set(vo.astype(self.dtype))
            # fast path: closed-form smooth residual + derived impedance maps
            qpos, qvel = robot.residual_step(qpos, qvel)
            # spin blocks (excluded from the reduced solve) keep the
            # quasi-static push at the robot's post-move position
            if self.block_runtimes and (
                    self.object_world is None
                    or self.object_world[3] is None):
                qpos, qvel = self._push_blocks(qpos, qvel, qpos[:2], dt)
            if self.ball_runtimes and (
                    self.object_world is None
                    or self.object_world[2] is None):
                qpos, qvel = self._step_balls(
                    qpos, qvel, qpos[:2], qpos[:2] - old_xy, dt
                )
            # wall-contact ejection: the robot geom radius exceeds the
            # manual detector's inflation, so pressing into a wall overlaps
            # the geoms and mj_step responds with the contact-impedance
            # velocity map — evaluated at the position mj_step saw (pre
            # manual resolution), constants derived (models/point.py).
            margin = getattr(robot, "WALL_CONTACT_MARGIN", 0.0)
            if margin > 0.0:
                qvel = qvel.at[:2].add(
                    segments.impedance_eject(
                        self.walls, qpos[:2], qvel[:2], margin,
                        robot.CONTACT_LAM, robot.timestep, robot.CONTACT_MU,
                        old=old_xy,
                    )
                )
            # arrow-box tip contacts: slide+hinge impedance response when
            # the arrow (reaching 1.1 from the origin) presses into a wall
            for tip_body in getattr(robot, "ARROW_TIPS", ()):
                th = qpos[2]
                ct, st = jnp.cos(th), jnp.sin(th)
                tip = qpos[:2] + jnp.stack(
                    [tip_body[0] * ct - tip_body[1] * st,
                     tip_body[0] * st + tip_body[1] * ct]
                )
                qvel = qvel.at[:3].add(
                    segments.tip_impedance_eject(
                        self.walls, qpos[:2], tip, qvel[:3], th,
                        robot.RADIUS, robot.CONTACT_LAM, robot.timestep,
                        robot.BODY_MASS, robot.COUPLE_ARM,
                        robot.SPIN_INERTIA_PRIME, old=old_xy,
                    )
                )
        if any(b.spin for b in self.block_runtimes):
            qpos, qvel = self._spin_blocks(qpos, qvel, qpos[:2], old_xy, dt)
        new_xy = qpos[:2]
        # robot wall resolution (maze_env.py:457-464).  Ordering note
        # (deliberate divergence from maze_env.py:457-473's robot-first
        # sequence): objects above were stepped from the robot's PRE-
        # resolution position because that is what the reference's mj_step
        # saw — the engine moves balls/blocks during the inner step, which
        # runs before the manual robot resolution; the manual BALL wall
        # resolution is self-contained either way (ball state never reads
        # the robot's resolved position).
        resolved = segments.resolve(self.walls, old_xy, new_xy, self.restitution_coef)
        qpos = qpos.at[:2].set(resolved)
        new_state = EnvState(
            qpos=qpos, qvel=qvel, t=state.t + 1, key=state.key,
            goal_pos=state.goal_pos,
        )
        return new_state, jnp.zeros((), self.dtype)  # point inner reward = 0

    def _step_dynamic(
        self, state: EnvState, action: jnp.ndarray
    ) -> Tuple[EnvState, jnp.ndarray]:
        """Ant/Swimmer/Reacher path — full engine dynamics (installed by the
        robot's ``dynamics_step``)."""
        robot = self.robot
        xy_before = state.qpos[:2]
        qpos, qvel = robot.dynamics_step(self, state.qpos, state.qvel, action)
        xy_after = qpos[:2]
        forward, ctrl_cost = robot.inner_reward_terms(
            xy_before, xy_after, action.astype(self.dtype)
        )
        new_state = EnvState(
            qpos=qpos, qvel=qvel, t=state.t + 1, key=state.key,
            goal_pos=state.goal_pos,
        )
        info = {"reward_forward": forward, "reward_ctrl": -ctrl_cost}
        inner = robot.FORWARD_REWARD_WEIGHT * forward - ctrl_cost
        return new_state, inner, info

    # ------------------------------------------------------------------
    # spaces / metadata (host side)
    # ------------------------------------------------------------------
    def observation_bounds(self) -> Tuple[np.ndarray, np.ndarray]:
        """Parity with MazeEnv._get_obs_space (maze_env.py:235-246), including
        its leading-slots assembly."""
        high = np.full(self.obs_dim, np.inf, dtype=np.float64)
        low = -high
        r_low, r_high = self.robot.obs_bounds()
        n = len(r_high)
        high[:n] = r_high
        low[:n] = r_low
        xmin, xmax, ymin, ymax = self.structure.xy_limits()
        low[0], high[0], low[1], high[1] = xmin, xmax, ymin, ymax
        return low, high

    def action_bounds(self) -> Tuple[np.ndarray, np.ndarray]:
        return self.robot.action_bounds()
