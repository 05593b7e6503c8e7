"""Fused Pallas TPU kernels for the hot rollout paths.

Per-robot kernels keep the batch on VPU lanes and run the entire
frame_skip x integrator x env-head step (plus auto-reset and on-core PRNG
for random-policy rollouts) in a single ``pallas_call``:

- :mod:`.point_pallas`   — kinematic point robot (bit-exact vs XLA), incl.
  object worlds (quasi-static blocks, kick/roll/bounce balls,
  object-position task heads)
- :mod:`.swimmer_pallas` — closed-form 3-link swimmer dynamics, incl.
  object worlds (pass-through world lanes)
- :mod:`.ant_pallas`     — full contact dynamics ant (FK / CRB / RNE /
  impedance contacts + projected Jacobi, scalar-component form), incl.
  movable-block worlds

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
    # per-episode goal resampling lives in the XLA reset path; the rollout
    # kernel's in-kernel auto-reset cannot run a task's arbitrary
    # sample_goal_positions law — those tasks ride make_fast_step (which
    # carries a per-env goal operand) with resets folded in XLA
    if spec.task.sample_goals():
        return None
    mod_name = _KERNEL_MODULES.get(spec.robot.NAME)
    if mod_name is None:
        return None
    k = importlib.import_module(f".{mod_name}", __package__)
    try:
        ks = k.spec_from_env(spec)
    except AssertionError:
        return None  # object worlds / unsupported task heads

    def build():
        return k.build_rollout_kernel(
            ks, env.num_envs, num_steps, **({"tile": tile} if tile else {})
        )

    from ..utils import kernel_cache as kc
    import jax.numpy as jnp

    # artifact cache is keyed on float32 example avals — a non-f32 spec
    # would export artifacts that mismatch the real calls at load time
    if not kc.enabled() or spec.dtype != jnp.float32:
        return build()

    B = env.num_envs
    example = (
        jnp.zeros((B, int(spec.nq)), jnp.float32),
        jnp.zeros((B, int(spec.nv)), jnp.float32),
        jnp.zeros((B,), jnp.int32),
        jnp.zeros((), jnp.int32),
    )
    key = (f"rollout-{spec.robot.NAME}-B{B}-S{num_steps}-T{tile}-f32-"
           f"{kc.spec_digest(ks)}")
    return kc.cached_kernel(key, build, example)


def make_fast_step(env, tile: int | None = None,
                   num_envs: int | None = None):
    """Build the fused per-step kernel for a batched env.

    Returns ``step(qpos, qvel, t, actions) -> (qpos, qvel, t, reward,
    terminated)`` over one ``pallas_call`` (no auto-reset — the caller
    folds resets in XLA), or ``None`` when the robot/task combination has
    no fused kernel.  For ``sample_goals()`` tasks (the resampling hook
    the reference left latent, maze_task.py:375-376) the returned step
    takes a fifth ``goal (B, G, 3)`` operand — per-env goal positions
    carried as lane rows — so goal-resampling tasks ride the fast path
    too (callers pass ``state.goal_pos``; extended observations are fine
    either way — the wrapper derives them from qpos via spec._observe).
    ``num_envs`` overrides the env's batch size — the shard_map rollout
    uses this to build per-device-shard kernels."""
    import importlib

    spec = env.spec
    mod_name = _KERNEL_MODULES.get(spec.robot.NAME)
    if mod_name is None:
        # custom robots composed through the extension API: the generic
        # scalar-lane engine kernel (ops/engine_pallas) fuses their
        # frame_skip x RK4 contact dynamics the same way
        if not getattr(spec.robot, "USES_WORLD_ENGINE", False):
            return None
        from . import engine_pallas as k
    else:
        k = importlib.import_module(f".{mod_name}", __package__)
    if not hasattr(k, "build_step_kernel"):
        return None
    try:
        ks = k.spec_from_env(spec)
    except AssertionError:
        return None  # object worlds / unsupported task heads
    B = num_envs if num_envs is not None else env.num_envs

    def build():
        return k.build_step_kernel(
            ks, B, **({"tile": tile} if tile else {})
        )

    from ..utils import kernel_cache as kc
    import jax.numpy as jnp

    if not kc.enabled() or spec.dtype != jnp.float32:
        return build()

    example = (
        jnp.zeros((B, int(spec.nq)), jnp.float32),
        jnp.zeros((B, int(spec.nv)), jnp.float32),
        jnp.zeros((B,), jnp.int32),
        jnp.zeros((B, int(spec.robot.action_dim)), jnp.float32),
    )
    if spec.task.sample_goals():
        import numpy as np

        G = int(np.asarray(ks.goal_valid).shape[0])
        example = example + (jnp.zeros((B, G, 3), jnp.float32),)
    key = (f"step-{spec.robot.NAME}-B{B}-T{tile}-f32-{kc.spec_digest(ks)}")
    return kc.cached_kernel(key, build, example)
