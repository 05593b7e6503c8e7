"""Row-level diff: our point_world constraint rows vs MuJoCo efc_* at a step.

Run:  python tools/debug_point_rows.py [env_id seed t]
"""

from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp  # noqa: E402
import mujoco  # noqa: E402

from mujoco_maze_tpu.physics import point_world as pw  # noqa: E402
from tools.probe_point_mj import kinematic_write, load_case  # noqa: E402
from tools.validate_point_world import build  # noqa: E402


def main():
    env_id = sys.argv[1] if len(sys.argv) > 1 else "Point4Rooms-v1"
    seed = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    t = int(sys.argv[3]) if len(sys.argv) > 3 else 37
    g, model, data = load_case(env_id, seed)
    params, boxes = build(env_id)

    qp = g["qpos"][t - 1] if t > 0 else g["reset_qpos"]
    qv = g["qvel"][t - 1] if t > 0 else g["reset_qvel"]
    q0, v0 = kinematic_write(model, data, qp.copy(), qv.copy(), g["actions"][t])
    mujoco.mj_forward(model, data)

    nefc = data.nefc
    J_mj = data.efc_J.reshape(-1, model.nv)[:nefc, :3] if data.efc_J.ndim == 1 \
        else data.efc_J[:nefc, :3]
    print("MJ ncon:", data.ncon)
    for i in range(data.ncon):
        c = data.contact[i]
        g1 = mujoco.mj_id2name(model, mujoco.mjtObj.mjOBJ_GEOM, c.geom1)
        g2 = mujoco.mj_id2name(model, mujoco.mjtObj.mjOBJ_GEOM, c.geom2)
        print(f"  {g1}|{g2} dist={c.dist:+.6f} pos={c.pos[:2]} n={c.frame[:3]}")
    print("MJ rows: J[:, :3] | aref | R")
    for i in range(nefc):
        print(f"  {J_mj[i]} {data.efc_aref[i]:+10.4f} {data.efc_R[i]:.6f}")
    print("MJ qacc_smooth:", data.qacc_smooth[:3])
    print("MJ qacc:", data.qacc[:3])

    q = jnp.asarray(q0[:3])
    v = jnp.asarray(v0[:3])
    con = pw._gather_contacts(params, boxes, q[:2], q[2])
    print("\nOURS contacts (active):")
    act = np.asarray(con.active)
    for i in range(len(act)):
        if act[i]:
            print(f"  pos={np.asarray(con.pos[i])} n={np.asarray(con.n[i])} "
                  f"nz={float(con.nz[i]):+.3f} pen={float(con.pen[i]):+.6f} "
                  f"zmult={float(con.zmult[i])}")
    J, aref, rinv = pw._rows_from_contacts(params, con, q[:2], v)
    J = np.asarray(J); aref = np.asarray(aref); rinv = np.asarray(rinv)
    print("OUR rows (rinv>0): J | aref | R")
    for i in range(len(aref)):
        if rinv[i] > 0:
            print(f"  {J[i]} {aref[i]:+10.4f} {1.0/rinv[i]:.6f}")
    qacc = pw.forward(params, boxes, q, v)
    print("OUR qacc:", np.asarray(qacc))


if __name__ == "__main__":
    main()
