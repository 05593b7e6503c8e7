"""Generate the committed FLOP-count artifact for the bench roofline stage.

``roofline.step_flops`` traces the fused kernel's lane body and reads XLA's
cost model — a trace-time constant for a given source tree, but tracing the
Ant lane program costs minutes, which is why round 4's roofline stage never
fit the driver budget.  This tool computes the counts once per source
fingerprint and writes ``artifacts/ROOFLINE.json``; bench.py's roofline
stage loads it when the fingerprint matches and only measures the (cheap)
VPU peak + implied TFLOP/s live.

Run on the TPU box after any compute-path change::

    python tools/roofline_gen.py
"""

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

CONFIGS = ("PointUMaze-v0", "SwimmerUMaze-v0", "AntUMaze-v0",
           "PointBilliard-v0")
OUT = os.path.join(REPO, "artifacts", "ROOFLINE.json")


def main() -> None:
    import jax

    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(REPO, ".jax_cache"))
    import mujoco_maze_tpu as mmt
    from mujoco_maze_tpu.utils import kernel_cache as kc
    from mujoco_maze_tpu.utils import roofline

    flops = {}
    for eid in CONFIGS:
        env = mmt.make_batched(eid, num_envs=256, fast_step=False)
        f = roofline.step_flops(env)
        print(f"{eid}: {f} flops/env-step", file=sys.stderr, flush=True)
        if f is not None:
            flops[eid] = round(float(f), 1)
    data = {"fingerprint": kc.code_fingerprint(), "flops_per_step": flops}
    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    with open(OUT, "w") as f:
        json.dump(data, f, indent=1)
        f.write("\n")
    print(json.dumps(data["flops_per_step"]))


if __name__ == "__main__":
    main()
