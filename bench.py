"""Headline benchmark: PointUMaze env-steps/s/chip at 4096 parallel envs.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", "detail"}.
Baseline: the driver north star of 1M env-steps/s/chip on PointUMaze @4096
envs (BASELINE.json; the reference publishes no perf numbers — BASELINE.md).

Stage order (round-3 verdict #1c): the BASELINE.md benchmark configs run
FIRST — PointUMaze (pallas + XLA + public step API), AntUMaze, AntPush,
SwimmerUMaze — then the remaining BASELINE-named configs (SwimmerSquareRoom,
Ant4Rooms, AntFall, PointUMaze-v1, Point4Rooms-v2), then optional extras
(object-world kernels, 64K-env headroom, the batch-last XLA engine).  Only
the post-required stages are budget-gated.

Diagnosability (round-3 verdict #1b): "detail" records every rep for every
measured config/path, plus per-stage elapsed seconds ("stage_s") and the
kernel-artifact cache events ("cache": hit / miss / noexport / save_failed
per key), so a budget burn or silent cache failure is visible from the
BENCH_r*.json capture alone.

Warm start: kernel artifacts are committed under kernel_artifacts/ (AOT
jax.export, gzipped) and the XLA compile cache persists in .jax_cache/, so
a fresh clone reaches measurement in seconds per stage instead of minutes.
"""

from __future__ import annotations

import json
import os
import sys
import time

# Persistent XLA compilation cache: the Ant contact kernels cost ~3 min of
# XLA/Mosaic compile per fresh process over the axon tunnel.  Verified on
# this box: the axon backend serves cross-process cache hits (a warmed
# kernel loads in <1 s).  NB: must go through jax.config.update — the axon
# site hook pre-imports jax at interpreter start, so setting JAX_* env vars
# here is too late.
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
# Wall-clock budget: stages after the required BASELINE block are optional
# and skipped once the budget is spent (the JSON line must always print).
# 900 s default: the r3 driver waited ≥19 min, and a cold-cache Ant stage
# can cost ~3 min of XLA/Mosaic compile over the axon tunnel.
BUDGET_S = float(os.environ.get("BENCH_BUDGET_S", "900"))
_T0 = time.perf_counter()

detail: dict = {}
_STAGE_S: dict = {}


def _budget_left() -> float:
    return BUDGET_S - (time.perf_counter() - _T0)


def _stage(name: str, fn, required: bool = False, min_budget: float = 60.0):
    """Run one bench stage with timing + error capture recorded in detail.

    Transient axon remote-compile failures (HTTP tunnel flakes — r4 lost
    an AntSmallBilliard capture to 'response body closed') retry once."""
    if not required and _budget_left() < min_budget:
        detail[f"{name}/skipped"] = "bench budget spent"
        return
    _progress(name)
    t0 = time.perf_counter()
    try:
        try:
            fn()
        except Exception as e:
            msg = repr(e)
            if "remote_compile" in msg or "read body" in msg:
                detail[f"{name}/retried"] = msg[:120]
                fn()
            else:
                raise
    except Exception as e:  # no TPU / kernel unavailable / OOM
        detail[f"{name}/error"] = repr(e)[:200]
    _STAGE_S[name] = round(time.perf_counter() - t0, 1)


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
    return [r * env.num_envs * steps for r in rates]


def _bench_pallas(env, state, steps: int) -> list:
    """Fused rollout kernel (ops.make_fast_rollout) for any env; raises
    LookupError with the fallback reason when the env has no kernel."""
    import jax
    import jax.numpy as jnp

    from mujoco_maze_tpu import ops

    roll = ops.make_fast_rollout(env, steps)  # artifact-cached on TPU
    if roll is None:
        raise LookupError("no fused kernel for this robot/task (XLA fallback)")
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
    return [r * env.num_envs * steps for r in rates]


def _pallas_stage(env_id: str, steps: int, label: str | None = None):
    import jax

    import mujoco_maze_tpu as mmt

    name = label or f"{env_id}/pallas"

    def fn():
        env = mmt.make_batched(env_id, num_envs=NUM_ENVS, fast_step=False)
        state, _ = env.reset(jax.random.PRNGKey(0))
        detail[name] = _bench_pallas(env, state, steps)

    return name, fn


def _step_api_stage(env_id: str, steps: int, key_base: int):
    import jax

    import mujoco_maze_tpu as mmt

    name = f"{env_id}/step_api"

    def fn():
        env = mmt.make_batched(env_id, num_envs=NUM_ENVS, fast_step=True)
        state, _ = env.reset(jax.random.PRNGKey(0))
        detail[name] = _bench_xla(
            env, state, key_base=key_base, steps=steps,
            cache_key=f"bench_step_api-{env_id}-B{NUM_ENVS}-S{steps}")

    return name, fn


def main() -> None:
    import jax

    import mujoco_maze_tpu as mmt
    from mujoco_maze_tpu.utils import kernel_cache as kc

    _enable_compile_cache()
    on_tpu = jax.default_backend() == "tpu"

    # ---- required: the BASELINE.md benchmark configs ----------------------
    env = mmt.make_batched("PointUMaze-v0", num_envs=NUM_ENVS, fast_step=False)
    state, _ = env.reset(jax.random.PRNGKey(0))

    _stage("PointUMaze-v0/pallas",
           lambda: detail.__setitem__(
               "PointUMaze-v0/pallas", _bench_pallas(env, state, STEPS)),
           required=True)
    _stage("PointUMaze-v0/xla",
           lambda: detail.__setitem__(
               "PointUMaze-v0/xla",
               _bench_xla(env, state, key_base=1,
                          cache_key=(f"bench_xla-PointUMaze-v0-B{NUM_ENVS}"
                                     f"-S{STEPS}"))),
           required=True)
    if on_tpu:
        _stage(*_step_api_stage("PointUMaze-v0", STEPS, key_base=11),
               required=True)
    for env_id in ("AntUMaze-v0", "AntPush-v0"):
        _stage(*_pallas_stage(env_id, ANT_STEPS), required=True)
        if on_tpu:
            _stage(*_step_api_stage(env_id, ANT_STEPS, key_base=21),
                   required=True)
    _stage(*_pallas_stage("SwimmerUMaze-v0", STEPS), required=True)
    if on_tpu:
        _stage(*_step_api_stage("SwimmerUMaze-v0", STEPS, key_base=41),
               required=True)

    # ---- remaining BASELINE-named configs (budget-gated) ------------------
    _stage(*_pallas_stage("SwimmerSquareRoom-v0", STEPS))
    _stage(*_pallas_stage("Ant4Rooms-v0", ANT_STEPS), min_budget=200)
    _stage(*_pallas_stage("AntFall-v0", ANT_STEPS), min_budget=200)
    _stage(*_pallas_stage("PointUMaze-v1", STEPS))
    _stage(*_pallas_stage("Point4Rooms-v2", STEPS))

    # ---- optional extras ---------------------------------------------------
    _stage(*_pallas_stage("PointBilliard-v0", STEPS), min_budget=120)
    _stage(*_pallas_stage("AntSmallBilliard-v0", ANT_STEPS), min_budget=350)

    # batch-axis headroom: the same kernel at 64K envs (the 4096-env
    # headline is the BASELINE benchmark point, not the chip's ceiling)
    def pallas_64k():
        import jax.numpy as jnp

        from mujoco_maze_tpu import ops

        B64 = 65536
        env64 = mmt.make_batched(
            "PointUMaze-v0", num_envs=B64, fast_step=False)
        st64, _ = env64.reset(jax.random.PRNGKey(0))
        roll = ops.make_fast_rollout(env64, STEPS, tile=2048)
        carry = [roll(st64.qpos, st64.qvel, st64.t, jnp.asarray(7, jnp.int32))]
        jax.block_until_ready(carry[0][0])

        def run64(rep):
            qp, qv, t, _, _ = carry[0]
            carry[0] = roll(qp, qv, t, jnp.asarray(rep, jnp.int32))
            return carry[0]

        rates = _time_reps(run64, lambda o: jax.block_until_ready(o[0]),
                           reps=3)
        detail["PointUMaze-v0/pallas_64k"] = [r * B64 * STEPS for r in rates]

    if on_tpu:
        _stage("PointUMaze-v0/pallas_64k", pallas_64k, min_budget=90)

    # the batch-last XLA engine fallback (custom-robot path); heavy compile,
    # only with a raised budget (BENCH_BUDGET_S)
    def xla_batched():
        eenv = mmt.make_batched(
            "AntUMaze-v0", num_envs=NUM_ENVS, fast_step=False,
            engine_batched=True)
        estate, _ = eenv.reset(jax.random.PRNGKey(0))
        detail["AntUMaze-v0/xla_batched"] = _bench_xla(
            eenv, estate, key_base=31, steps=ANT_STEPS,
            cache_key=(f"bench_xla_batched-AntUMaze-v0-B{NUM_ENVS}"
                       f"-S{ANT_STEPS}"))

    if on_tpu:
        _stage("AntUMaze-v0/xla_batched", xla_batched, min_budget=350)

    # roofline/MFU accounting: measured VPU peak + per-kernel FLOPs/step
    # (trace-time cost analysis) + MFU vs the rates measured above
    def roofline_stage():
        from mujoco_maze_tpu.utils import roofline

        peak = roofline.vpu_peak_flops()
        rl = {
            # forced-sync serial-FMA-chain sustain on this chip; the
            # theoretical v5e VPU f32 FMA peak (4 ALUs x 8x128 lanes x
            # ~940 MHz x 2) brackets it from above — see utils/roofline.py
            "vpu_sustained_serial_flops_s": round(peak, 0),
            "vpu_theoretical_fma_flops_s": 7.7e12,
        }
        for eid, steps_key in (("PointUMaze-v0", "PointUMaze-v0/pallas"),
                               ("SwimmerUMaze-v0", "SwimmerUMaze-v0/pallas"),
                               ("AntUMaze-v0", "AntUMaze-v0/pallas"),
                               ("PointBilliard-v0", "PointBilliard-v0/pallas")):
            renv = mmt.make_batched(eid, num_envs=256, fast_step=False)
            f = roofline.step_flops(renv)
            if f is None:
                continue
            rates = detail.get(steps_key)
            entry = {"flops_per_step": round(f, 0)}
            if isinstance(rates, list) and rates:
                # pre-optimization flop count x measured rate: an UPPER
                # bound on the executed TFLOP/s (XLA folds some of it)
                entry["implied_tflops_s"] = round(
                    max(rates) * f / 1e12, 3)
            rl[eid] = entry
        detail["roofline"] = rl

    if on_tpu:
        _stage("roofline", roofline_stage, min_budget=150)

    point_rates = [
        r
        for k in ("PointUMaze-v0/pallas", "PointUMaze-v0/xla",
                  "PointUMaze-v0/step_api")
        for r in detail.get(k, [])
    ]
    best = max(point_rates)
    out = {
        k: (v if isinstance(v, (str, dict))
            else [round(x, 0) for x in v])
        for k, v in detail.items()
    }
    out["stage_s"] = _STAGE_S
    out["cache"] = dict(kc.LAST_EVENTS)
    out["fingerprint"] = kc.code_fingerprint() if on_tpu else "cpu"
    print(
        json.dumps(
            {
                "metric": "PointUMaze-v0 env-steps/s/chip @4096 envs",
                "value": round(best, 0),
                "unit": "env-steps/s",
                "vs_baseline": round(best / BASELINE_STEPS_PER_S, 2),
                "detail": out,
            }
        )
    )


if __name__ == "__main__":
    main()
