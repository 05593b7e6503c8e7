"""Fused Pallas TPU kernels for the hot rollout paths.

Per-robot kernels keep the batch on VPU lanes and run the entire
frame_skip x integrator x env-head step (plus auto-reset and on-core PRNG
for random-policy rollouts) in a single ``pallas_call``:

- :mod:`.point_pallas`   — kinematic point robot (bit-exact vs XLA)
- :mod:`.swimmer_pallas` — closed-form 3-link swimmer dynamics
- :mod:`.ant_pallas`     — full contact dynamics ant (FK / CRB / RNE /
  impedance contacts + projected Jacobi, scalar-component form)

:func:`make_fast_rollout` dispatches on the env's robot.
"""

from __future__ import annotations

_KERNEL_MODULES = {
    "Point": "point_pallas",
    "Swimmer": "swimmer_pallas",
    "Reacher": "swimmer_pallas",  # closed form is generic over link count
    "Ant": "ant_pallas",
}


def make_fast_rollout(env, num_steps: int, tile: int | None = None):
    """Build the fused random-policy rollout kernel for a batched env.

    Returns ``rollout(qpos, qvel, t, seed) -> (qpos, qvel, t, reward_sum,
    episodes)`` jitted over one ``pallas_call``, or ``None`` when the
    env's robot/task combination has no fused kernel (caller falls back
    to the XLA `BatchedMazeEnv.rollout_metrics` path).  A bad ``tile``
    (not dividing ``num_envs``) raises — only *unsupported-env*
    conditions map to ``None``.
    """
    import importlib

    spec = env.spec
    mod_name = _KERNEL_MODULES.get(spec.robot.NAME)
    if mod_name is None:
        return None
    k = importlib.import_module(f".{mod_name}", __package__)
    try:
        ks = k.spec_from_env(spec)
    except AssertionError:
        return None  # object worlds / unsupported task heads
    return k.build_rollout_kernel(
        ks, env.num_envs, num_steps, **({"tile": tile} if tile else {})
    )
