"""Headline benchmark: PointUMaze env-steps/s/chip at 4096 parallel envs.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", "detail"}.
Baseline: the driver north star of 1M env-steps/s/chip on PointUMaze @4096
envs (BASELINE.json; the reference publishes no perf numbers — BASELINE.md).

The headline value is the best PointUMaze rep across paths; "detail" records
every rep for every measured config/path so run-to-run variance is visible
(round-1 claim/capture discrepancy — VERDICT.md Weak #1):

* PointUMaze-v0: fused Pallas rollout kernel (state resident in VMEM,
  batch-on-lanes, on-core PRNG; bit-exact vs the XLA step), the generic
  XLA `lax.scan` path (fast_step=False), and the public batched step API
  (`BatchedMazeEnv.step` → per-step Pallas kernel inside the scan).
* AntUMaze-v0 / AntPush-v0 (BASELINE.json benchmark configs): the fused
  contact-dynamics ant kernel (AntPush exercises the movable-block world)
  plus the same public step-API path.
* Round-2 coverage stages (budget-gated): PointBilliard-v0 (object-world
  Point kernel), AntSmallBilliard-v0 (free-ball ant kernel), and the
  batch-last XLA engine fallback (physics/engine_batched).
"""

from __future__ import annotations

import json
import os
import sys
import time

# Persistent XLA compilation cache: the Ant contact kernels cost ~3 min of
# XLA/Mosaic compile per fresh process over the axon tunnel, which round 2
# showed eats the wall-clock budget before the later stages run.  Verified
# on this box: the axon backend serves cross-process cache hits (a warmed
# kernel loads in <1 s), so a primed repo-local cache lets every stage fit.
# NB: must go through jax.config.update — the axon site hook pre-imports
# jax at interpreter start, so setting JAX_* env vars here is too late.
_CACHE_DIR = os.path.join(
    os.path.dirname(os.path.abspath(__file__)), ".jax_cache")


def _enable_compile_cache() -> None:
    import jax

    jax.config.update("jax_compilation_cache_dir", _CACHE_DIR)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def _progress(msg: str) -> None:
    print(f"[bench {time.strftime('%H:%M:%S')}] {msg}", file=sys.stderr, flush=True)

NUM_ENVS = 4096
STEPS = 1024
ANT_STEPS = 128
REPS = 5
BASELINE_STEPS_PER_S = 1.0e6
# Wall-clock budget: every stage after the PointUMaze headline is optional
# and skipped once the budget is spent (each Ant kernel costs ~3 min of
# XLA/Mosaic compile over the axon tunnel; the JSON line must always print).
BUDGET_S = float(__import__("os").environ.get("BENCH_BUDGET_S", "420"))
_T0 = time.perf_counter()


def _budget_left() -> float:
    return BUDGET_S - (time.perf_counter() - _T0)


def _time_reps(fn, sync, reps=REPS):
    """Per-rep env-steps/s, warm (first call compiled + discarded)."""
    rates = []
    for rep in range(reps):
        t0 = time.perf_counter()
        sync(fn(rep))
        rates.append(1.0 / (time.perf_counter() - t0))
    return rates


def _bench_xla(env, state, key_base: int, steps: int = STEPS,
               cache_key: str | None = None) -> list:
    import jax

    policy = env.random_policy()

    def build():
        return jax.jit(lambda s, k: env.rollout_metrics(s, policy, steps, k))

    if cache_key is not None:
        from mujoco_maze_tpu.utils import kernel_cache as kc

        roll = (kc.cached_kernel(cache_key, build,
                                 (state, jax.random.PRNGKey(key_base)))
                if kc.enabled() else build())
    else:
        roll = build()
    out = [roll(state, jax.random.PRNGKey(key_base))]
    jax.block_until_ready(out[0][0].qpos)

    def run(rep):
        out[0] = roll(out[0][0], jax.random.PRNGKey(key_base + 1 + rep))
        return out[0]

    rates = _time_reps(run, lambda o: jax.block_until_ready(o[0].qpos))
    return [r * NUM_ENVS * steps for r in rates]


def _bench_pallas_point(env, state) -> list:
    import jax
    import jax.numpy as jnp

    from mujoco_maze_tpu import ops

    roll = ops.make_fast_rollout(env, STEPS)  # artifact-cached on TPU
    carry = [roll(state.qpos, state.qvel, state.t, jnp.asarray(7, jnp.int32))]
    jax.block_until_ready(carry[0][0])
    # second warmup from the carry (computed-output args can trigger one
    # more specialization of the exported call; keep rep 0 honest)
    carry[0] = roll(*carry[0][:3], jnp.asarray(8, jnp.int32))
    jax.block_until_ready(carry[0][0])

    def run(rep):
        qp, qv, t, _, _ = carry[0]
        carry[0] = roll(qp, qv, t, jnp.asarray(rep, jnp.int32))
        return carry[0]

    rates = _time_reps(run, lambda o: jax.block_until_ready(o[0]))
    return [r * NUM_ENVS * STEPS for r in rates]


def _bench_pallas_ant(env_id: str) -> list:
    import jax
    import jax.numpy as jnp

    import mujoco_maze_tpu as mmt
    from mujoco_maze_tpu import ops

    env = mmt.make_batched(env_id, num_envs=NUM_ENVS)
    roll = ops.make_fast_rollout(env, ANT_STEPS)  # artifact-cached on TPU
    state, _ = env.reset(jax.random.PRNGKey(0))
    carry = [roll(state.qpos, state.qvel, state.t, jnp.asarray(7, jnp.int32))]
    jax.block_until_ready(carry[0][0])
    carry[0] = roll(*carry[0][:3], jnp.asarray(8, jnp.int32))
    jax.block_until_ready(carry[0][0])

    def run(rep):
        qp, qv, t, _, _ = carry[0]
        carry[0] = roll(qp, qv, t, jnp.asarray(rep, jnp.int32))
        return carry[0]

    rates = _time_reps(run, lambda o: jax.block_until_ready(o[0]))
    return [r * NUM_ENVS * ANT_STEPS for r in rates]


def main() -> None:
    import jax

    import mujoco_maze_tpu as mmt

    _enable_compile_cache()

    env = mmt.make_batched("PointUMaze-v0", num_envs=NUM_ENVS, fast_step=False)
    state, _ = env.reset(jax.random.PRNGKey(0))

    detail = {}
    _progress("PointUMaze pallas rollout kernel")
    try:
        detail["PointUMaze-v0/pallas"] = _bench_pallas_point(env, state)
    except Exception as e:  # no TPU / kernel unavailable
        detail["PointUMaze-v0/pallas_error"] = repr(e)[:200]
    _progress("PointUMaze XLA scan path")
    detail["PointUMaze-v0/xla"] = _bench_xla(env, state, key_base=1)
    # the public batched API (BatchedMazeEnv.step → per-step Pallas kernel)
    if jax.default_backend() == "tpu" and _budget_left() > 30:
        _progress("PointUMaze public step API (pallas step in scan)")
        fenv = mmt.make_batched(
            "PointUMaze-v0", num_envs=NUM_ENVS, fast_step=True)
        detail["PointUMaze-v0/step_api"] = _bench_xla(
            fenv, state, key_base=11,
            cache_key=f"bench_step_api-PointUMaze-v0-B{NUM_ENVS}-S{STEPS}")
    # batch-axis headroom: the same kernel at 64K envs (the 4096-env
    # headline is the BASELINE benchmark point, not the chip's ceiling)
    if jax.default_backend() == "tpu" and _budget_left() > 90:
        _progress("PointUMaze pallas rollout kernel @65536 envs")
        try:
            import jax.numpy as jnp

            from mujoco_maze_tpu import ops

            B64 = 65536
            env64 = mmt.make_batched(
                "PointUMaze-v0", num_envs=B64, fast_step=False)
            st64, _ = env64.reset(jax.random.PRNGKey(0))
            roll = ops.make_fast_rollout(env64, STEPS, tile=2048)
            carry = [roll(st64.qpos, st64.qvel, st64.t,
                          jnp.asarray(7, jnp.int32))]
            jax.block_until_ready(carry[0][0])

            def run64(rep):
                qp, qv, t, _, _ = carry[0]
                carry[0] = roll(qp, qv, t, jnp.asarray(rep, jnp.int32))
                return carry[0]

            rates = _time_reps(
                run64, lambda o: jax.block_until_ready(o[0]), reps=3)
            detail["PointUMaze-v0/pallas_64k"] = [
                r * B64 * STEPS for r in rates]
        except Exception as e:
            detail["PointUMaze-v0/pallas_64k_error"] = repr(e)[:200]
    elif jax.default_backend() == "tpu":
        detail["PointUMaze-v0/pallas_64k_skipped"] = "bench budget spent"

    # object-world Point kernel (round 2: all 145 env IDs build kernels)
    if _budget_left() > 120:
        _progress("PointBilliard pallas rollout kernel (object world)")
        try:
            benv = mmt.make_batched(
                "PointBilliard-v0", num_envs=NUM_ENVS, fast_step=False)
            bstate, _ = benv.reset(jax.random.PRNGKey(0))
            detail["PointBilliard-v0/pallas"] = _bench_pallas_point(
                benv, bstate)
        except Exception as e:
            detail["PointBilliard-v0/pallas_error"] = repr(e)[:200]
    else:
        detail["PointBilliard-v0/skipped"] = "bench budget spent"
    for env_id in ("AntUMaze-v0", "AntPush-v0", "AntSmallBilliard-v0"):
        if _budget_left() < (200 if env_id != "AntSmallBilliard-v0" else 350):
            detail[f"{env_id}/skipped"] = "bench budget spent"
            continue
        _progress(f"{env_id} pallas rollout kernel")
        try:
            detail[f"{env_id}/pallas"] = _bench_pallas_ant(env_id)
        except Exception as e:
            detail[f"{env_id}/pallas_error"] = repr(e)[:200]
        if jax.default_backend() == "tpu" and _budget_left() > 200:
            _progress(f"{env_id} public step API")
            try:
                aenv = mmt.make_batched(
                    env_id, num_envs=NUM_ENVS, fast_step=True)
                astate, _ = aenv.reset(jax.random.PRNGKey(0))
                detail[f"{env_id}/step_api"] = _bench_xla(
                    aenv, astate, key_base=21, steps=ANT_STEPS,
                    cache_key=(f"bench_step_api-{env_id}-B{NUM_ENVS}"
                               f"-S{ANT_STEPS}"))
            except Exception as e:
                detail[f"{env_id}/step_api_error"] = repr(e)[:200]

    # the batch-last XLA engine fallback (custom-robot path); heavy compile,
    # only with a raised budget (BENCH_BUDGET_S)
    if jax.default_backend() == "tpu" and _budget_left() > 350:
        _progress("AntUMaze batch-last XLA engine (engine_batched)")
        try:
            eenv = mmt.make_batched(
                "AntUMaze-v0", num_envs=NUM_ENVS, fast_step=False,
                engine_batched=True)
            estate, _ = eenv.reset(jax.random.PRNGKey(0))
            detail["AntUMaze-v0/xla_batched"] = _bench_xla(
                eenv, estate, key_base=31, steps=ANT_STEPS,
                cache_key=(f"bench_xla_batched-AntUMaze-v0-B{NUM_ENVS}"
                           f"-S{ANT_STEPS}"))
        except Exception as e:
            detail["AntUMaze-v0/xla_batched_error"] = repr(e)[:200]

    point_rates = [
        r
        for k in ("PointUMaze-v0/pallas", "PointUMaze-v0/xla",
                  "PointUMaze-v0/step_api")
        for r in detail.get(k, [])
    ]
    best = max(point_rates)
    print(
        json.dumps(
            {
                "metric": "PointUMaze-v0 env-steps/s/chip @4096 envs",
                "value": round(best, 0),
                "unit": "env-steps/s",
                "vs_baseline": round(best / BASELINE_STEPS_PER_S, 2),
                "detail": {
                    k: (v if isinstance(v, str) else [round(x, 0) for x in v])
                    for k, v in detail.items()
                },
            }
        )
    )


if __name__ == "__main__":
    main()
