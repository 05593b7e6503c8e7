"""Validate physics/point_world.py against real MuJoCo, state by state.

For every golden teacher-forced step: apply the reference's kinematic write,
then compare our ``rk4_step`` replica against ``mj_step`` on the same model
(float64).  Reports error percentiles split by contact regime (free flight /
floor-only / wall press) and dumps the worst steps with MuJoCo's stage-level
internals for debugging.

Run:  python tools/validate_point_world.py [env_id seed]
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

from mujoco_maze_tpu.maze.structure import analyze_maze, with_ball_size  # noqa: E402
from mujoco_maze_tpu.physics import point_world as pw  # noqa: E402
from mujoco_maze_tpu.registry import entry as reg_entry  # noqa: E402
from tools.probe_point_mj import kinematic_write, load_case  # noqa: E402


def build(env_id):
    e = reg_entry(env_id)
    task = e.task_cls(e.maze_size_scaling)
    ms = analyze_maze(task.create_maze(), e.maze_size_scaling, 0.5,
                      task.PUT_SPIN_NEAR_AGENT)
    ms = with_ball_size(ms, task.OBJECT_BALL_SIZE)
    boxes = pw.wall_boxes_from_structure(ms, dtype=jnp.float64)
    params = pw.params_for_world(any_blocks=bool(ms.movable_blocks))
    return params, boxes


def main():
    env_id = sys.argv[1] if len(sys.argv) > 1 else "Point4Rooms-v1"
    seed = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    g, model, data = load_case(env_id, seed)
    params, boxes = build(env_id)
    step_fn = jax.jit(lambda q, v: pw.rk4_step(params, boxes, q, v))

    qerr, verr, regime = [], [], []
    worst = []
    for t in range(len(g["actions"])):
        qp = g["qpos"][t - 1] if t > 0 else g["reset_qpos"]
        qv = g["qvel"][t - 1] if t > 0 else g["reset_qvel"]
        q0, v0 = kinematic_write(model, data, qp.copy(), qv.copy(),
                                 g["actions"][t])
        mujoco.mj_forward(model, data)
        has_wall = any(
            data.contact[i].geom1 != 0 and data.contact[i].dist < 0
            for i in range(data.ncon))
        mujoco.mj_step(model, data)
        mq, mv = data.qpos[:3].copy(), data.qvel[:3].copy()
        oq, ov = step_fn(jnp.asarray(q0[:3]), jnp.asarray(v0[:3]))
        eq = np.abs(np.asarray(oq) - mq).max()
        ev = np.abs(np.asarray(ov) - mv).max()
        qerr.append(eq); verr.append(ev)
        regime.append("wall" if has_wall else "floor")
        worst.append((eq, t, has_wall))

    qerr = np.asarray(qerr); verr = np.asarray(verr)
    regime = np.asarray(regime)
    print(f"=== {env_id} s{seed}: {len(qerr)} steps, "
          f"{(regime == 'wall').sum()} wall steps")
    for reg in ("floor", "wall"):
        m = regime == reg
        if not m.any():
            continue
        print(f"  [{reg:5s}] qpos err mean {qerr[m].mean():.2e} "
              f"med {np.median(qerr[m]):.2e} p95 {np.percentile(qerr[m],95):.2e} "
              f"max {qerr[m].max():.2e} | qvel max {verr[m].max():.2e}")
    worst.sort(reverse=True)
    print("  worst:", [(f"t={t}", f"{e:.2e}", "wall" if w else "floor")
                       for e, t, w in worst[:6]])


if __name__ == "__main__":
    main()
