"""Golden-trajectory generator: reference semantics on real MuJoCo.

Reconstructs the reference's composed world (robot + maze geoms + movable
objects, `/root/reference/mujoco_maze/maze_env.py:97-217` semantics) as a
MuJoCo 3 model built from *our* static maze analysis, then rolls out the
reference's step logic (Point: kinematic qpos writes + mj_step + manual
collision with the numpy oracle detector, maze_env.py:448-473 +
point.py:44-61) with seeded numpy RNG.  The saved .npz files are the
behavioral goldens the JAX engine is differentially tested against
(tests/test_point_golden.py etc.).

Run:  python tools/golden_gen.py            # writes tests/goldens/*.npz
"""

from __future__ import annotations

import os
import sys
import xml.etree.ElementTree as ET

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from mujoco_maze_tpu.maze.collision import CollisionDetector
from mujoco_maze_tpu.maze.structure import MazeStructure, analyze_maze, with_ball_size
from mujoco_maze_tpu.registry import entry as reg_entry

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "..", "tests", "goldens")


# ---------------------------------------------------------------------------
# XML synthesis (equivalent content to the reference assets + world builder)
# ---------------------------------------------------------------------------

def _point_skeleton() -> ET.Element:
    """Point robot model (content parity: assets/point.xml)."""
    root = ET.Element("mujoco")
    ET.SubElement(root, "compiler", inertiafromgeom="true", angle="degree",
                  coordinate="local")
    ET.SubElement(root, "option", timestep="0.02", integrator="RK4")
    default = ET.SubElement(root, "default")
    ET.SubElement(default, "joint", limited="false", armature="0", damping="0")
    ET.SubElement(default, "geom", condim="3", conaffinity="0", margin="0",
                  friction="1.0 0.5 0.5", rgba="0.8 0.6 0.4 1", density="100")
    wb = ET.SubElement(root, "worldbody")
    ET.SubElement(wb, "geom", name="floor", pos="0 0 0", size="40 40 40",
                  type="plane", conaffinity="1", rgba="0.8 0.9 0.8 1",
                  condim="3")
    torso = ET.SubElement(wb, "body", name="torso", pos="0 0 0")
    ET.SubElement(torso, "geom", name="pointbody", type="sphere", size="0.5",
                  pos="0 0 0.5", solimp="0.9 0.99 0.001")
    ET.SubElement(torso, "geom", name="pointarrow", type="box",
                  size="0.5 0.1 0.1", pos="0.6 0 0.5",
                  solimp="0.9 0.99 0.001")
    ET.SubElement(torso, "joint", name="ballx", type="slide", axis="1 0 0",
                  pos="0 0 0")
    ET.SubElement(torso, "joint", name="bally", type="slide", axis="0 1 0",
                  pos="0 0 0")
    ET.SubElement(torso, "joint", name="rot", type="hinge", axis="0 0 1",
                  pos="0 0 0", limited="false")
    act = ET.SubElement(root, "actuator")
    ET.SubElement(act, "motor", joint="ballx", ctrlrange="-1 1",
                  ctrllimited="true")
    ET.SubElement(act, "motor", joint="rot", ctrlrange="-0.25 0.25",
                  ctrllimited="true")
    return root


def _add_world_geoms(root: ET.Element, ms: MazeStructure,
                     objball_type: str = "hinge") -> tuple:
    """Maze boxes / platforms / movable blocks / balls (maze_env.py:102-213)."""
    wb = root.find(".//worldbody")
    if ms.elevated:
        torso = root.find(".//body[@name='torso']")
        torso.set("pos", f"0 0 {0.75 + ms.height_offset:.2f}")
    if ms.any_blocks:
        default = root.find(".//default")
        default.find(".//geom").set("solimp", ".995 .995 .01")
    for k, (pos, size) in enumerate(zip(ms.platform_pos, ms.platform_size)):
        ET.SubElement(wb, "geom", name=f"elevated_{k}",
                      pos=f"{pos[0]} {pos[1]} {pos[2]}",
                      size=f"{size[0]} {size[1]} {size[2]}", type="box",
                      contype="1", conaffinity="1", rgba="0.9 0.9 0.9 1")
    for k, (pos, size) in enumerate(zip(ms.block_pos, ms.block_size)):
        ET.SubElement(wb, "geom", name=f"wallblock_{k}",
                      pos=f"{pos[0]} {pos[1]} {pos[2]}",
                      size=f"{size[0]} {size[1]} {size[2]}", type="box",
                      contype="1", conaffinity="1", rgba="0.4 0.4 0.4 1")
    block_bodies = []
    for b in ms.movable_blocks:
        body = ET.SubElement(wb, "body", name=b.name,
                             pos=f"{b.pos[0]} {b.pos[1]} {b.pos[2]}")
        ET.SubElement(body, "geom", name=f"geom_{b.name}", pos="0 0 0",
                      size=f"{b.size[0]} {b.size[1]} {b.size[2]}",
                      type="box", mass=f"{b.mass}", contype="1",
                      conaffinity="1", rgba="0.9 0.1 0.1 1")
        axes = [("1 0 0", "x", b.move_x), ("0 1 0", "y", b.move_y)]
        for axis, nm, present in axes:
            if present:
                ET.SubElement(body, "joint", axis=axis,
                              name=f"{nm}_{b.name}", armature="0",
                              damping="0.0",
                              limited="true" if b.falling else "false",
                              range=f"{-b.xy_range} {b.xy_range}",
                              margin="0.01", pos="0 0 0", type="slide")
        if b.move_z:
            ET.SubElement(body, "joint", armature="0", axis="0 0 1",
                          damping="0.0", limited="true",
                          range=f"{b.z_range[0]} {b.z_range[1]}",
                          margin="0.01", name=f"z_{b.name}", pos="0 0 0",
                          type="slide")
        if b.spin:
            ET.SubElement(body, "joint", armature="0", axis="0 0 1",
                          damping="0.0", limited="false",
                          name=f"spin_{b.name}", pos="0 0 0", type="ball")
        block_bodies.append(b.name)
    ball_bodies = []
    for ob in ms.object_balls:
        body = ET.SubElement(wb, "body", name=ob.name,
                             pos=f"{ob.pos[0]} {ob.pos[1]} 0")
        common = dict(type="sphere", name=f"geom_{ob.name}",
                      size=f"{ob.size}", pos=f"0.0 0.0 {ob.size}",
                      rgba="0.1 0.1 0.7 1", contype="1", conaffinity="1",
                      solimp="0.9 0.99 0.001")
        if objball_type == "hinge":
            mass = 0.0001 * (ob.size ** 3)
            ET.SubElement(body, "geom", mass=f"{mass}", **common)
            ET.SubElement(body, "joint", name=f"{ob.name}_x", axis="1 0 0",
                          pos="0 0 0", type="slide")
            ET.SubElement(body, "joint", name=f"{ob.name}_y", axis="0 1 0",
                          pos="0 0 0", type="slide")
            ET.SubElement(body, "joint", name=f"{ob.name}_rot", axis="0 0 1",
                          pos="0 0 0", type="hinge", limited="false")
        else:
            ET.SubElement(body, "geom", **common)
            ET.SubElement(body, "freejoint", name=f"{ob.name}_root")
        ball_bodies.append(ob.name)
    return block_bodies, ball_bodies


def _ant_skeleton() -> ET.Element:
    """Ant robot model (content parity: assets/ant.xml)."""
    root = ET.Element("mujoco")
    ET.SubElement(root, "compiler", inertiafromgeom="true", angle="degree",
                  coordinate="local")
    ET.SubElement(root, "option", timestep="0.02", integrator="RK4")
    default = ET.SubElement(root, "default")
    ET.SubElement(default, "joint", limited="true", armature="1", damping="1")
    ET.SubElement(default, "geom", condim="3", conaffinity="0", margin="0.01",
                  friction="1 0.5 0.5", solref=".02 1", solimp=".8 .8 .01",
                  rgba="0.8 0.6 0.4 1", density="5.0")
    wb = ET.SubElement(root, "worldbody")
    ET.SubElement(wb, "geom", name="floor", pos="0 0 0", size="40 40 40",
                  type="plane", conaffinity="1", condim="3")
    torso = ET.SubElement(wb, "body", name="torso", pos="0 0 0.75")
    ET.SubElement(torso, "geom", name="torso_geom", type="sphere", size="0.25",
                  pos="0 0 0")
    ET.SubElement(torso, "joint", name="root", type="free", limited="false",
                  pos="0 0 0", axis="0 0 1", margin="0.01", armature="0",
                  damping="0")
    legs = [
        ("1", "0.2 0.2", "-1 1 0", "30 70"),
        ("2", "-0.2 0.2", "1 1 0", "-70 -30"),
        ("3", "-0.2 -0.2", "-1 1 0", "-70 -30"),
        ("4", "0.2 -0.2", "1 1 0", "30 70"),
    ]
    for name, d, ankle_axis, ankle_range in legs:
        dx, dy = (float(v) for v in d.split())
        leg = ET.SubElement(torso, "body", name=f"leg_{name}", pos="0 0 0")
        ET.SubElement(leg, "geom", name=f"aux_{name}_geom", type="capsule",
                      size="0.08", fromto=f"0 0 0 {dx} {dy} 0")
        aux = ET.SubElement(leg, "body", name=f"aux_{name}", pos=f"{dx} {dy} 0")
        ET.SubElement(aux, "joint", name=f"hip_{name}", type="hinge",
                      pos="0 0 0", axis="0 0 1", range="-30 30")
        ET.SubElement(aux, "geom", name=f"leg_{name}_geom", type="capsule",
                      size="0.08", fromto=f"0 0 0 {dx} {dy} 0")
        foot = ET.SubElement(aux, "body", name=f"foot_{name}",
                             pos=f"{dx} {dy} 0")
        ET.SubElement(foot, "joint", name=f"ankle_{name}", type="hinge",
                      pos="0 0 0", axis=ankle_axis, range=ankle_range)
        ET.SubElement(foot, "geom", name=f"ankle_{name}_geom", type="capsule",
                      size="0.08", fromto=f"0 0 0 {2*dx} {2*dy} 0")
    act = ET.SubElement(root, "actuator")
    for name in ("4", "1", "2", "3"):
        ET.SubElement(act, "motor", joint=f"hip_{name}",
                      ctrlrange="-30.0 30.0", ctrllimited="true")
        ET.SubElement(act, "motor", joint=f"ankle_{name}",
                      ctrlrange="-30.0 30.0", ctrllimited="true")
    return root


def build_ant_world(env_id: str):
    """Composed ant maze world on real MuJoCo (reference semantics)."""
    import mujoco

    e = reg_entry(env_id)
    assert e.robot_name == "Ant"
    task = e.task_cls(e.maze_size_scaling)
    ms = analyze_maze(task.create_maze(), e.maze_size_scaling, 0.5,
                      task.PUT_SPIN_NEAR_AGENT)
    ms = with_ball_size(ms, task.OBJECT_BALL_SIZE)
    root = _ant_skeleton()
    _add_world_geoms(root, ms, objball_type="freejoint")
    xml = ET.tostring(root, encoding="unicode")
    model = mujoco.MjModel.from_xml_string(xml)
    return model, ms, task


def build_point_world(env_id: str):
    """(mujoco model, MazeStructure, detector, objball detector, bodies)."""
    import mujoco

    e = reg_entry(env_id)
    assert e.robot_name == "Point"
    task = e.task_cls(e.maze_size_scaling)
    ms = analyze_maze(task.create_maze(), e.maze_size_scaling, 0.5,
                      task.PUT_SPIN_NEAR_AGENT)
    ms = with_ball_size(ms, task.OBJECT_BALL_SIZE)
    root = _point_skeleton()
    blocks, balls = _add_world_geoms(root, ms, objball_type="hinge")
    xml = ET.tostring(root, encoding="unicode")
    model = mujoco.MjModel.from_xml_string(xml)
    structure = task.create_maze()
    det = CollisionDetector(structure, e.maze_size_scaling, ms.torso_x,
                            ms.torso_y, 0.4)
    ball_det = CollisionDetector(structure, e.maze_size_scaling, ms.torso_x,
                                 ms.torso_y, task.OBJECT_BALL_SIZE)
    return model, ms, det, ball_det, task, blocks, balls


def rollout_point(env_id: str, seed: int, n_steps: int, action_fn=None,
                  qpos_nudge=None, qpos_nudge_f32=None):
    """Reference-semantics rollout; returns per-step arrays.

    ``action_fn(t, rng) -> (2,)`` overrides the random-action policy (used
    for directed scenarios like striking the billiard ball).
    ``qpos_nudge=(index, n_ulps)`` perturbs one reset qpos component by
    n_ulps float64 ulps (the chaos-envelope ensemble,
    tools/ball_chaos_envelope.py)."""
    import mujoco

    model, ms, det, ball_det, task, blocks, balls = build_point_world(env_id)
    data = mujoco.MjData(model)
    rng = np.random.RandomState(seed)

    nq, nv = model.nq, model.nv
    init_qpos = data.qpos.copy()  # qpos0
    init_qvel = data.qvel.copy()

    # reference reset (point.py:71-81)
    qpos = init_qpos + rng.uniform(-0.1, 0.1, nq)
    qvel = init_qvel + rng.random(nv) * 0.1
    qpos[3:] = init_qpos[3:]
    qvel[3:] = 0.0
    if qpos_nudge is not None:
        idx, n_ulps = qpos_nudge
        for _ in range(abs(int(n_ulps))):
            qpos[idx] = np.nextafter(
                qpos[idx], np.inf if n_ulps > 0 else -np.inf)
    if qpos_nudge_f32 is not None:
        # one FLOAT32 ulp (the production engine's representation scale);
        # exactly-zero components use the f32 ulp at unit scale
        idx, sgn = qpos_nudge_f32
        x32 = np.float32(qpos[idx])
        scale = max(abs(float(x32)), 1.0)
        qpos[idx] = float(qpos[idx]) + np.sign(sgn) * scale * 2.0 ** -23
    data.qpos[:] = qpos
    data.qvel[:] = qvel
    mujoco.mj_forward(model, data)

    qpos_hist, qvel_hist, act_hist = [], [], []
    ball_xy_hist = []
    restitution = 0.8
    ball_body_ids = [model.body(name).id for name in balls]

    def ball_positions():
        return [data.xpos[i][:2].copy() for i in ball_body_ids]

    for t in range(n_steps):
        if action_fn is not None:
            action = np.asarray(action_fn(t, rng), dtype=np.float64)
        else:
            action = rng.uniform(-1, 1, 2) * np.array([1.0, 0.25])
        old_xy = data.qpos[:2].copy()
        old_balls = ball_positions()
        # PointEnv.step (point.py:44-61)
        q = data.qpos.copy()
        q[2] += action[1]
        if q[2] < -np.pi:
            q[2] += 2 * np.pi
        elif q[2] > np.pi:
            q[2] -= 2 * np.pi
        q[0] += np.cos(q[2]) * action[0]
        q[1] += np.sin(q[2]) * action[0]
        v = np.clip(data.qvel, -10, 10)
        data.qpos[:] = q
        data.qvel[:] = v
        mujoco.mj_step(model, data)
        # manual robot-wall collision (maze_env.py:457-464)
        new_xy = data.qpos[:2].copy()
        col = det.detect(old_xy, new_xy)
        if col is not None:
            pos = col.point + restitution * col.rest()
            if det.detect(old_xy, pos) is not None:
                pos = old_xy
            data.qpos[:2] = pos
            mujoco.mj_forward(model, data)
        # manual ball-wall collision, written to the ball's qpos (the
        # reference's xipos write was a dynamics no-op; SURVEY hard-part #5)
        for k, name in enumerate(balls):
            new_b = ball_positions()[k]
            colb = ball_det.detect(old_balls[k], new_b)
            if colb is not None:
                pos = colb.point + restitution * colb.rest()
                if ball_det.detect(old_balls[k], pos) is not None:
                    pos = old_balls[k]
                jadr = model.joint(f"{name}_x").qposadr[0]
                body_pos = model.body(name).pos[:2]
                data.qpos[jadr:jadr + 2] = pos - body_pos
                mujoco.mj_forward(model, data)
        qpos_hist.append(data.qpos.copy())
        qvel_hist.append(data.qvel.copy())
        act_hist.append(action)
        ball_xy_hist.append(np.asarray(ball_positions()).reshape(-1))

    return dict(
        qpos=np.asarray(qpos_hist),
        qvel=np.asarray(qvel_hist),
        actions=np.asarray(act_hist),
        ball_xy=np.asarray(ball_xy_hist),
        reset_qpos=qpos,
        reset_qvel=qvel,
    )


def main() -> None:
    os.makedirs(GOLDEN_DIR, exist_ok=True)
    cases = [
        ("PointUMaze-v0", 0, 200),
        ("PointUMaze-v0", 7, 200),
        ("Point4Rooms-v1", 3, 200),
        ("PointCorridor-v0", 5, 200),
        ("PointBilliard-v0", 11, 200),
        ("PointFall-v0", 4, 200),
    ]
    for env_id, seed, n in cases:
        out = rollout_point(env_id, seed, n)
        path = os.path.join(GOLDEN_DIR, f"{env_id}_s{seed}.npz")
        np.savez_compressed(path, **out)
        print("wrote", path, out["qpos"].shape)

    # directed scenario: drive north into the billiard ball, then stop —
    # exercises point-ball contact transfer + ball rolling + wall bounce
    def strike(t, rng):
        if t < 3:
            return (0.0, -np.pi / 6)  # turn toward -y
        if t < 40:
            return (1.0, 0.0)
        return (0.0, 0.0)

    out = rollout_point("PointBilliard-v0", 0, 120, action_fn=strike)
    path = os.path.join(GOLDEN_DIR, "PointBilliard-v0_strike.npz")
    np.savez_compressed(path, **out)
    print("wrote", path, out["ball_xy"][-1])

    # directed scenario: drive east, turn north, push the Fall block
    # (y+z slides, mass 0.001) into the chasm until its +y joint limit —
    # exercises robot-block contact on a falling block, the z-dof floor
    # support and the ±size_scaling travel limits (round-5: falling blocks
    # joined the reduced impedance solve)
    def push_fall(t, rng):
        if t < 8:
            return (0.55, 0.0)
        if t < 11:
            return (0.0, np.pi / 6)  # turn to +y
        return (0.7, 0.0)

    out = rollout_point("PointFall-v0", 0, 90, action_fn=push_fall)
    path = os.path.join(GOLDEN_DIR, "PointFall-v0_push.npz")
    np.savez_compressed(path, **out)
    print("wrote", path, out["qpos"][-1][3:])


if __name__ == "__main__":
    main()
