"""Probe harness: dump MuJoCo internals for the composed Point world.

Used to derive (not calibrate) the planar point-world engine
(`mujoco_maze_tpu/physics/point_world.py`): for teacher-forced golden
states we dump the contact set, constraint rows (efc_*), mass matrix and
qacc so each stage of our replication can be validated piecewise.

Run:  python tools/probe_point_mj.py [env_id seed]
"""

from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import mujoco  # noqa: E402

from tools.golden_gen import build_point_world  # noqa: E402

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "..", "tests", "goldens")


def load_case(env_id="PointUMaze-v0", seed=7):
    g = np.load(os.path.join(GOLDEN_DIR, f"{env_id}_s{seed}.npz"))
    model, ms, det, ball_det, task, blocks, balls = build_point_world(env_id)
    data = mujoco.MjData(model)
    return g, model, data


def kinematic_write(model, data, qpos_prev, qvel_prev, action):
    """The reference's pre-mj_step state writes (point.py:44-57)."""
    q = qpos_prev.copy()
    q[2] += action[1]
    if q[2] < -np.pi:
        q[2] += 2 * np.pi
    elif q[2] > np.pi:
        q[2] -= 2 * np.pi
    q[0] += np.cos(q[2]) * action[0]
    q[1] += np.sin(q[2]) * action[0]
    v = np.clip(qvel_prev, -10, 10)
    data.qpos[:] = q
    data.qvel[:] = v
    return q, v


def dump_state(model, data, label=""):
    mujoco.mj_forward(model, data)
    print(f"--- {label} qpos={data.qpos[:3]} qvel={data.qvel[:3]}")
    print(f"  ncon={data.ncon} nefc={data.nefc}")
    for i in range(data.ncon):
        c = data.contact[i]
        g1 = mujoco.mj_id2name(model, mujoco.mjtObj.mjOBJ_GEOM, c.geom1)
        g2 = mujoco.mj_id2name(model, mujoco.mjtObj.mjOBJ_GEOM, c.geom2)
        print(
            f"  con[{i}] {g1}|{g2} dist={c.dist:+.6f} pos={c.pos} "
            f"n={c.frame[:3]} dim={c.dim} mu={c.friction[:2]} "
            f"solref={c.solref} solimp={c.solimp}"
        )
    nefc = data.nefc
    if nefc:
        J = data.efc_J.reshape(nefc, model.nv) if data.efc_J.ndim == 1 else data.efc_J
        print("  efc_type:", data.efc_type[:nefc])
        print("  efc_J[:, :3]:\n", np.array2string(J[:, :3], precision=5))
        print("  efc_aref:", np.array2string(data.efc_aref[:nefc], precision=5))
        print("  efc_R:", np.array2string(data.efc_R[:nefc], precision=6))
        print("  efc_D:", np.array2string(data.efc_D[:nefc], precision=6))
        print("  efc_pos:", np.array2string(data.efc_pos[:nefc], precision=6))
        print("  efc_margin:", data.efc_margin[:nefc])
        print("  efc_force:", np.array2string(data.efc_force[:nefc], precision=5))
    M = np.zeros((model.nv, model.nv))
    try:
        mujoco.mj_fullM(model, M, data.qM)
    except TypeError:  # mujoco >= 3.10 signature
        mujoco.mj_fullM(model, data, M)
    print("  qM[:3,:3]:\n", np.array2string(M[:3, :3], precision=5))
    print("  qacc_smooth[:3]:", data.qacc_smooth[:3])
    print("  qacc[:3]:", data.qacc[:3])
    print("  qfrc_bias[:3]:", data.qfrc_bias[:3])


def main():
    env_id = sys.argv[1] if len(sys.argv) > 1 else "PointUMaze-v0"
    seed = int(sys.argv[2]) if len(sys.argv) > 2 else 7
    steps = [int(s) for s in sys.argv[3:]] or [6, 7]
    g, model, data = load_case(env_id, seed)
    print("model opts: integrator=", model.opt.integrator, "solver=",
          model.opt.solver, "cone=", model.opt.cone, "iter=",
          model.opt.iterations, "tol=", model.opt.tolerance,
          "impratio=", model.opt.impratio)
    for t in steps:
        qp = g["qpos"][t - 1] if t > 0 else g["reset_qpos"]
        qv = g["qvel"][t - 1] if t > 0 else g["reset_qvel"]
        kinematic_write(model, data, qp.copy(), qv.copy(), g["actions"][t])
        data.qacc_warmstart[:] = 0
        dump_state(model, data, label=f"t={t} pre-step")
        mujoco.mj_step(model, data)
        print(f"  post mj_step qpos={data.qpos[:3]} qvel={data.qvel[:3]}")
        print(f"  golden       qpos={g['qpos'][t][:3]} qvel={g['qvel'][t][:3]}")


if __name__ == "__main__":
    main()
