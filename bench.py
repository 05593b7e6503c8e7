"""Headline benchmark: PointUMaze env-steps/s/chip at 4096 parallel envs.

Prints ONE SHORT JSON line: {"metric", "value", "unit", "vs_baseline",
"summary": {config: best_rate}, "detail_file": "artifacts/BENCH_DETAIL.json"}.
The full diagnostics (every rep, per-stage seconds, per-stage phase split,
kernel-cache events, roofline) go to the detail artifact, NOT stdout — the
driver's capture keeps only a ~2000-char tail of stdout, and round 4 lost
its headline to one giant JSON line truncated mid-detail (round-4 verdict,
Weak #1).  The final line stays well under 2000 chars by construction.

Baseline: the driver north star of 1M env-steps/s/chip on PointUMaze @4096
envs (BASELINE.json; the reference publishes no perf numbers — BASELINE.md).

Stage order: ALL NINE BASELINE.md benchmark configs run first and are
required (never budget-gated) — PointUMaze-v0 (pallas + XLA + public step
API), AntUMaze, AntPush, SwimmerUMaze, SwimmerSquareRoom, AntFall (before
Ant4Rooms — AntFall had zero driver captures in rounds 1-4 because it
queued behind Ant4Rooms's compile), Ant4Rooms, PointUMaze-v1,
Point4Rooms-v2 — then the budget-gated extras (object-world kernels,
64K-env headroom, the batch-last XLA engine, roofline).

Per-stage phase split (round-4 verdict, Weak #2): each kernel stage records
build_s (artifact load or trace), compile_s (first call = backend/Mosaic
compile or persistent-cache hit), warmup_s and per-rep rates, so a slow
stage is attributable to artifact-load vs backend-compile vs run from the
detail artifact alone.

Warm start: two committed cache layers. kernel_artifacts/*.jaxexp.gz are
AOT jax.export artifacts (skip tracing); kernel_artifacts/xla_seed/*.gz
are gzipped XLA persistent-compile-cache entries for the bench kernels
(skip the Mosaic backend compile a fresh clone otherwise pays on first
call — the 625s Ant4Rooms stage of round 4).  Both are seeded into
.jax_cache/ at startup; tools/harvest_xla_seed.py refreshes the seed.
"""

from __future__ import annotations

import glob
import gzip
import json
import os
import shutil
import sys
import time

_REPO = os.path.dirname(os.path.abspath(__file__))
# Persistent XLA compilation cache: the Ant contact kernels cost ~3 min of
# XLA/Mosaic compile per fresh process over the axon tunnel.  Verified on
# this box: the axon backend serves cross-process cache hits (a warmed
# kernel loads in <1 s).  NB: must go through jax.config.update — the axon
# site hook pre-imports jax at interpreter start, so setting JAX_* env vars
# here is too late.  BENCH_CACHE_DIR overrides (harvest runs point it at an
# empty dir to isolate exactly the bench working set).
_CACHE_DIR = os.environ.get(
    "BENCH_CACHE_DIR", os.path.join(_REPO, ".jax_cache"))
_SEED_DIR = os.path.join(_REPO, "kernel_artifacts", "xla_seed")
DETAIL_FILE = "artifacts/BENCH_DETAIL.json"


def _enable_compile_cache() -> None:
    import jax

    jax.config.update("jax_compilation_cache_dir", _CACHE_DIR)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def _seed_xla_cache() -> dict:
    """Decompress committed compile-cache entries into the live cache dir.

    Entries are content-keyed by XLA (filename = cache key), so copying
    never corrupts: a mismatched key is simply never requested."""
    stats = {"seeded": 0, "present": 0}
    if not os.path.isdir(_SEED_DIR):
        return stats
    os.makedirs(_CACHE_DIR, exist_ok=True)
    for src in glob.glob(os.path.join(_SEED_DIR, "*.gz")):
        dst = os.path.join(_CACHE_DIR, os.path.basename(src)[:-3])
        if os.path.exists(dst):
            stats["present"] += 1
            continue
        try:
            tmp = dst + f".tmp{os.getpid()}"
            with gzip.open(src, "rb") as f, open(tmp, "wb") as g:
                shutil.copyfileobj(f, g)
            os.replace(tmp, dst)
            stats["seeded"] += 1
        except (OSError, gzip.BadGzipFile) as e:
            stats[os.path.basename(src)] = f"seed failed: {e!r}"[:120]
    return stats


def _progress(msg: str) -> None:
    print(f"[bench {time.strftime('%H:%M:%S')}] {msg}", file=sys.stderr, flush=True)

NUM_ENVS = 4096
STEPS = 1024
ANT_STEPS = 128
REPS = 5
BASELINE_STEPS_PER_S = 1.0e6
# Wall-clock budget: stages after the required BASELINE block are optional
# and skipped once the budget is spent (the JSON line must always print).
# 900 s default: the r3 driver waited >=19 min, and a cold-cache Ant stage
# can cost ~3 min of XLA/Mosaic compile over the axon tunnel.
BUDGET_S = float(os.environ.get("BENCH_BUDGET_S", "900"))
_T0 = time.perf_counter()

detail: dict = {}
_STAGE_S: dict = {}

# transient axon-tunnel flake signatures (one retry per stage): the HTTP
# remote-compile channel drops mid-flight with "response body closed" /
# "failed to read body" / remote_compile errors (CLAUDE.md, observed r4)
_FLAKY_SUBSTRINGS = ("remote_compile", "read body", "body closed",
                     "response body")


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
            if any(s in msg for s in _FLAKY_SUBSTRINGS):
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
               cache_key: str | None = None, phases: dict | None = None) -> list:
    import jax

    policy = env.random_policy()

    def build():
        return jax.jit(lambda s, k: env.rollout_metrics(s, policy, steps, k))

    t0 = time.perf_counter()
    if cache_key is not None:
        from mujoco_maze_tpu.utils import kernel_cache as kc

        roll = (kc.cached_kernel(cache_key, build,
                                 (state, jax.random.PRNGKey(key_base)))
                if kc.enabled() else build())
    else:
        roll = build()
    t1 = time.perf_counter()
    out = [roll(state, jax.random.PRNGKey(key_base))]
    jax.block_until_ready(out[0][0].qpos)
    t2 = time.perf_counter()
    if phases is not None:
        phases["build_s"] = round(t1 - t0, 2)
        phases["compile_s"] = round(t2 - t1, 2)

    def run(rep):
        out[0] = roll(out[0][0], jax.random.PRNGKey(key_base + 1 + rep))
        return out[0]

    rates = _time_reps(run, lambda o: jax.block_until_ready(o[0].qpos))
    return [r * env.num_envs * steps for r in rates]


def _bench_pallas(env, state, steps: int, phases: dict | None = None) -> list:
    """Fused rollout kernel (ops.make_fast_rollout) for any env; raises
    LookupError with the fallback reason when the env has no kernel."""
    import jax
    import jax.numpy as jnp

    from mujoco_maze_tpu import ops

    t0 = time.perf_counter()
    roll = ops.make_fast_rollout(env, steps)  # artifact-cached on TPU
    if roll is None:
        raise LookupError("no fused kernel for this robot/task (XLA fallback)")
    t1 = time.perf_counter()
    carry = [roll(state.qpos, state.qvel, state.t, jnp.asarray(7, jnp.int32))]
    jax.block_until_ready(carry[0][0])
    t2 = time.perf_counter()
    # second warmup from the carry (computed-output args can trigger one
    # more specialization of the exported call; keep rep 0 honest)
    carry[0] = roll(*carry[0][:3], jnp.asarray(8, jnp.int32))
    jax.block_until_ready(carry[0][0])
    t3 = time.perf_counter()
    if phases is not None:
        # build = artifact load (~30ms hit) or full retrace (minutes);
        # compile = first call: Mosaic/XLA backend compile, or persistent-
        # cache executable load (seconds); warmup2 = exported-call respec.
        phases["build_s"] = round(t1 - t0, 2)
        phases["compile_s"] = round(t2 - t1, 2)
        phases["warmup2_s"] = round(t3 - t2, 2)

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
        phases: dict = {}
        detail[f"{name}/phases"] = phases
        detail[name] = _bench_pallas(env, state, steps, phases=phases)

    return name, fn


def _step_api_stage(env_id: str, steps: int, key_base: int):
    import jax

    import mujoco_maze_tpu as mmt

    name = f"{env_id}/step_api"

    def fn():
        env = mmt.make_batched(env_id, num_envs=NUM_ENVS, fast_step=True)
        state, _ = env.reset(jax.random.PRNGKey(0))
        phases: dict = {}
        detail[f"{name}/phases"] = phases
        detail[name] = _bench_xla(
            env, state, key_base=key_base, steps=steps,
            cache_key=f"bench_step_api-{env_id}-B{NUM_ENVS}-S{steps}",
            phases=phases)

    return name, fn


def main() -> None:
    import jax

    import mujoco_maze_tpu as mmt
    from mujoco_maze_tpu.utils import kernel_cache as kc

    _enable_compile_cache()
    detail["xla_seed"] = _seed_xla_cache()
    on_tpu = jax.default_backend() == "tpu"

    # ---- required: ALL NINE BASELINE.md benchmark configs ------------------
    env = mmt.make_batched("PointUMaze-v0", num_envs=NUM_ENVS, fast_step=False)
    state, _ = env.reset(jax.random.PRNGKey(0))

    def point_pallas():
        phases: dict = {}
        detail["PointUMaze-v0/pallas/phases"] = phases
        detail["PointUMaze-v0/pallas"] = _bench_pallas(
            env, state, STEPS, phases=phases)

    def point_xla():
        phases: dict = {}
        detail["PointUMaze-v0/xla/phases"] = phases
        detail["PointUMaze-v0/xla"] = _bench_xla(
            env, state, key_base=1,
            cache_key=f"bench_xla-PointUMaze-v0-B{NUM_ENVS}-S{STEPS}",
            phases=phases)

    _stage("PointUMaze-v0/pallas", point_pallas, required=True)
    _stage("PointUMaze-v0/xla", point_xla, required=True)
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
    _stage(*_pallas_stage("SwimmerSquareRoom-v0", STEPS), required=True)
    # AntFall BEFORE Ant4Rooms: both are BASELINE configs, but AntFall went
    # four rounds uncaptured because it queued behind Ant4Rooms's compile
    _stage(*_pallas_stage("AntFall-v0", ANT_STEPS), required=True)
    _stage(*_pallas_stage("Ant4Rooms-v0", ANT_STEPS), required=True)
    _stage(*_pallas_stage("PointUMaze-v1", STEPS), required=True)
    _stage(*_pallas_stage("Point4Rooms-v2", STEPS), required=True)

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

    # roofline/MFU accounting: measured VPU peak + per-kernel FLOPs/step.
    # FLOP counts come from the committed artifacts/ROOFLINE.json when its
    # source fingerprint matches (tracing the Ant lane body costs minutes;
    # the counts are trace-time constants) — else they are recomputed for
    # the cheap kernels only.  The VPU peak is always measured fresh.
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
        fp = kc.code_fingerprint()
        stored: dict = {}
        art = os.path.join(_REPO, "artifacts", "ROOFLINE.json")
        try:
            with open(art) as f:
                data = json.load(f)
            if data.get("fingerprint") == fp:
                stored = data.get("flops_per_step", {})
                rl["flops_source"] = "artifact"
            else:
                rl["flops_source"] = "artifact stale (fingerprint mismatch)"
        except (OSError, json.JSONDecodeError):
            rl["flops_source"] = "no artifact"
        configs = (("PointUMaze-v0", "PointUMaze-v0/pallas", True),
                   ("SwimmerUMaze-v0", "SwimmerUMaze-v0/pallas", True),
                   ("AntUMaze-v0", "AntUMaze-v0/pallas", False),
                   ("PointBilliard-v0", "PointBilliard-v0/pallas", True))
        for eid, steps_key, cheap in configs:
            f = stored.get(eid)
            if f is None:
                # Ant lane tracing costs minutes; only recompute it with
                # generous budget left
                if not cheap and _budget_left() < 400:
                    rl[eid] = {"flops_per_step": None,
                               "skipped": "stale artifact + budget"}
                    continue
                renv = mmt.make_batched(eid, num_envs=256, fast_step=False)
                f = roofline.step_flops(renv)
                if f is None:
                    continue
            rates = detail.get(steps_key)
            entry = {"flops_per_step": round(float(f), 0)}
            if isinstance(rates, list) and rates:
                # pre-optimization flop count x measured rate: an UPPER
                # bound on the executed TFLOP/s (XLA folds some of it)
                entry["implied_tflops_s"] = round(
                    max(rates) * float(f) / 1e12, 3)
            rl[eid] = entry
        detail["roofline"] = rl

    if on_tpu:
        # required: the VPU-peak measurement is seconds and the FLOP table
        # rides the committed artifact — r4's roofline never got captured
        # because it queued last behind budget-gating
        _stage("roofline", roofline_stage, required=True)

    point_rates = [
        r
        for k in ("PointUMaze-v0/pallas", "PointUMaze-v0/xla",
                  "PointUMaze-v0/step_api")
        for r in detail.get(k, [])
    ]
    # default=0.0: even a total stage failure must still print the line
    # (ADVICE r4) — the detail artifact then carries the error entries
    best = max(point_rates, default=0.0)

    from mujoco_maze_tpu.physics import contact

    full = {
        k: (v if isinstance(v, (str, dict))
            else [round(x, 0) for x in v])
        for k, v in detail.items()
    }
    full["stage_s"] = _STAGE_S
    full["cache"] = dict(kc.LAST_EVENTS)
    full["fingerprint"] = kc.code_fingerprint() if on_tpu else "cpu"
    # solver sweep count flows into spec digests, but record it explicitly
    # so perf captures are attributable to a solver setting (ADVICE r4)
    full["contact_solver_iters"] = int(contact.CONTACT_SOLVER_ITERS)
    full["num_envs"] = NUM_ENVS
    full["budget_s"] = BUDGET_S
    full["total_s"] = round(time.perf_counter() - _T0, 1)

    detail_path = os.path.join(_REPO, DETAIL_FILE)
    os.makedirs(os.path.dirname(detail_path), exist_ok=True)
    with open(detail_path, "w") as f:
        json.dump(full, f, indent=1)
        f.write("\n")

    # the short driver-facing line: headline + best-rate per config only
    summary = {}
    for k, v in detail.items():
        if k.endswith("/phases") or not isinstance(v, (list, str)):
            continue
        if isinstance(v, list) and v and isinstance(v[0], float):
            summary[k] = round(max(v), 0)
        elif k.endswith("/skipped"):
            summary[k] = "skipped"
        elif k.endswith("/error"):
            summary[k] = str(v)[:60]
    print(
        json.dumps(
            {
                "metric": "PointUMaze-v0 env-steps/s/chip @4096 envs",
                "value": round(best, 0),
                "unit": "env-steps/s",
                "vs_baseline": round(best / BASELINE_STEPS_PER_S, 2),
                "summary": summary,
                "detail_file": DETAIL_FILE,
            }
        )
    )


if __name__ == "__main__":
    main()
