"""Full-registry TPU sweep artifact (round-4 verdict #5).

For every registered env ID: build the batched env, run ONE real step on
the chip through BOTH the fused Pallas step kernel (when the ID has one)
and the XLA path, and record {kernel: bool, stepped: bool,
kernel_vs_xla_max_err} to ``artifacts/REGISTRY_SWEEP.json`` — the
committed, driver-independent proof that exotic worlds (MultiFall,
BlockCarry, Bandit, Billiard) can't silently regress.

Kernel compiles are amortized by the AOT artifact cache + the XLA compile
cache; IDs sharing a world/spec digest reuse the same kernel.  Budget with
``SWEEP_BUDGET_S`` (default 5400); IDs that don't fit are recorded as
``skipped: budget`` rather than lost.

Run on the TPU box: python tools/registry_sweep.py
"""

import json
import os
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

BUDGET_S = float(os.environ.get("SWEEP_BUDGET_S", "5400"))
B = 128
OUT = REPO / "artifacts" / "REGISTRY_SWEEP.json"


def main() -> None:
    import jax

    jax.config.update("jax_compilation_cache_dir", str(REPO / ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    import numpy as np

    import mujoco_maze_tpu as mmt
    from mujoco_maze_tpu import ops

    t0 = time.time()
    results = {}
    # resume: keep completed entries from a previous pass (budget-skipped
    # or errored IDs re-run), so successive passes extend coverage
    if OUT.exists():
        prev = json.loads(OUT.read_text()).get("results", {})
        results.update({k: v for k, v in prev.items()
                        if v.get("stepped") is not None})
    # coverage-first order: the -v0 of every (maze family x robot) before
    # any reward variant, families interleaved across robots — each ID's
    # task heads give the kernel a distinct spec digest (a fresh compile),
    # and Ant compiles cost ~5 min each, so under a budget the exotic
    # worlds must not queue behind v1/v2 re-compiles of proven mazes nor
    # behind an alphabetical all-Ant prefix.
    def order(e):
        name, ver = e.rsplit("-v", 1)
        for robot in ("Point", "Ant", "Swimmer", "Reacher"):
            if name.startswith(robot):
                return (int(ver), name[len(robot):], robot)
        return (int(ver), name, "")

    ids = sorted(mmt.env_ids(), key=order)
    for n, eid in enumerate(ids):
        if results.get(eid, {}).get("stepped") is not None:
            continue  # completed in a previous pass
        left = BUDGET_S - (time.time() - t0)
        if left < 30:
            results[eid] = {"skipped": "budget"}
            continue
        print(f"[{n + 1}/{len(ids)} {time.strftime('%H:%M:%S')} "
              f"left={left:.0f}s] {eid}", file=sys.stderr, flush=True)
        entry = {}
        try:
            env = mmt.make_batched(eid, num_envs=B, auto_reset=False,
                                   fast_step=False)
            state, _ = env.reset(jax.random.PRNGKey(0))
            lo, hi = env.spec.action_bounds()
            rng = np.random.RandomState(0)
            act = jnp.asarray(
                rng.uniform(lo, hi, (B, env.spec.robot.action_dim)),
                env.spec.dtype)
            res = env.step(state, act)
            jax.block_until_ready(res.state.qpos)
            entry["stepped"] = bool(np.isfinite(
                np.asarray(res.state.qpos)).all())
            kern = ops.make_fast_step(env)
            entry["kernel"] = kern is not None
            if kern is not None:
                qp, qv, tt, rew, term = kern(
                    state.qpos, state.qvel, state.t, act)
                err = max(
                    float(jnp.abs(qp - res.state.qpos).max()),
                    float(jnp.abs(qv - res.state.qvel).max()),
                    float(jnp.abs(rew - res.reward).max()),
                )
                entry["kernel_vs_xla_max_err"] = round(err, 9)
        except Exception as e:
            entry["error"] = repr(e)[:200]
        results[eid] = entry
        _write(results, ids, t0, jax, np)

    print(json.dumps(_write(results, ids, t0, jax, np)))


def _write(results, ids, t0, jax, np) -> dict:
    """Incremental artifact write — an interrupted sweep keeps its
    coverage and the next pass resumes from it."""
    import time

    kernels = sum(1 for v in results.values() if v.get("kernel"))
    stepped = sum(1 for v in results.values() if v.get("stepped"))
    errs = [v["kernel_vs_xla_max_err"] for v in results.values()
            if "kernel_vs_xla_max_err" in v]
    summary = {
        "ids": len(ids),
        "stepped_ok": stepped,
        "kernels": kernels,
        "kernel_err_max": max(errs) if errs else None,
        "kernel_err_median": float(np.median(errs)) if errs else None,
        "elapsed_s": round(time.time() - t0, 1),
        "backend": jax.default_backend(),
    }
    OUT.parent.mkdir(exist_ok=True)
    tmp = OUT.with_suffix(".tmp")
    tmp.write_text(json.dumps(
        {"summary": summary, "results": results}, indent=1) + "\n")
    tmp.replace(OUT)
    return summary


if __name__ == "__main__":
    main()
