"""AOT kernel-artifact cache: serialize lowered kernels, skip retracing.

The fused rollout kernels are huge scalar-lane programs: an Ant contact
kernel costs ~110 s of *Python tracing + MLIR lowering* and ~20 s of XLA
compile per fresh process (measured on v5e over the axon tunnel).  JAX's
persistent compilation cache cannot help with the tracing part (the cache
key is the lowered module), so this module adds the layer above it: the
lowered StableHLO artifact is serialized with :mod:`jax.export` and keyed
by a fingerprint of the package source + jax version + device kind.  A
warm process deserializes in ~30 ms and reaches full-throughput execution
in ~1 s — verified bit-identical to the freshly traced kernel.

This is the framework analog of the engine/plan caches native runtimes
keep (the reference leans on MuJoCo's compiled mjModel the same way); here
the artifact is the whole fused env-step/rollout program.

Usage::

    roll = cached_kernel(
        f"ant_rollout-{env_id}-B{B}-S{S}",
        build=lambda: ap.build_rollout_kernel(es, B, S),
        example_args=(qpos, qvel, t, seed),
    )

Cache location: ``$MMT_KERNEL_CACHE`` or ``<repo>/.jax_cache/exports``.
Stale artifacts (any source change, jax upgrade, different accelerator)
miss on the fingerprint and are rebuilt; failures at any stage fall back
to the plain build.
"""

from __future__ import annotations

import hashlib
import os
from typing import Callable, Optional, Sequence

_PKG_DIR = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_FINGERPRINT: Optional[str] = None


def cache_dir() -> str:
    return os.environ.get(
        "MMT_KERNEL_CACHE",
        os.path.join(os.path.dirname(_PKG_DIR), ".jax_cache", "exports"),
    )


def code_fingerprint() -> str:
    """Hash of every package source file + jax version + device kind.

    Conservative by design: any source edit anywhere in the package
    invalidates all artifacts (a rebuild costs minutes; a stale kernel
    would silently compute the wrong physics).
    """
    global _FINGERPRINT
    if _FINGERPRINT is not None:
        return _FINGERPRINT
    import jax

    h = hashlib.sha256()
    h.update(jax.__version__.encode())
    try:
        h.update(jax.devices()[0].device_kind.encode())
        h.update(jax.default_backend().encode())
    except Exception:
        h.update(b"no-backend")
    for root, dirs, files in sorted(os.walk(_PKG_DIR)):
        dirs[:] = sorted(d for d in dirs if d != "__pycache__")
        for fname in sorted(files):
            if not fname.endswith(".py"):
                continue
            path = os.path.join(root, fname)
            h.update(os.path.relpath(path, _PKG_DIR).encode())
            with open(path, "rb") as f:
                h.update(f.read())
    _FINGERPRINT = h.hexdigest()[:20]
    return _FINGERPRINT


def spec_digest(obj) -> str:
    """Deterministic digest of a kernel-spec pytree (NamedTuples of numpy
    arrays / scalars / strings) — the uniqueness part of an artifact key.
    Correctness against code changes is covered by :func:`code_fingerprint`;
    this distinguishes worlds (walls, goals, block layouts, batch shapes)."""
    import numpy as np

    h = hashlib.sha256()

    def walk(x):
        if isinstance(x, (str, bytes)):
            h.update(str(x).encode())
        elif isinstance(x, (bool, int, float, type(None), np.generic)):
            h.update(repr(x).encode())
        elif isinstance(x, np.ndarray):
            h.update(x.dtype.str.encode())
            h.update(str(x.shape).encode())
            h.update(np.ascontiguousarray(x).tobytes())
        elif hasattr(x, "_fields"):  # NamedTuple
            for name, v in zip(x._fields, x):
                h.update(name.encode())
                walk(v)
        elif isinstance(x, (tuple, list)):
            for v in x:
                walk(v)
        elif isinstance(x, dict):
            for k in sorted(x):
                h.update(str(k).encode())
                walk(x[k])
        elif hasattr(x, "__array__"):  # jax arrays and friends
            walk(np.asarray(x))
        else:
            h.update(repr(x).encode())

    walk(obj)
    return h.hexdigest()[:16]


def enabled() -> bool:
    """Artifact caching is TPU-only (interpret-mode kernels don't export)
    and can be disabled with ``MMT_KERNEL_CACHE=0``."""
    if os.environ.get("MMT_KERNEL_CACHE", "") == "0":
        return False
    import jax

    try:
        return jax.default_backend() == "tpu"
    except Exception:
        return False


def _artifact_path(key: str) -> str:
    safe = "".join(c if (c.isalnum() or c in "-_.") else "_" for c in key)
    return os.path.join(cache_dir(), f"{safe}-{code_fingerprint()}.jaxexp")


def cached_kernel(
    key: str,
    build: Callable[[], Callable],
    example_args: Sequence,
    save: bool = True,
):
    """Return a callable for ``key``, loading the serialized artifact when
    present and valid, else building (tracing) and saving it.

    ``build()`` must return a jit-compatible function of ``example_args``
    (arbitrary pytrees of arrays / scalars).  The loaded artifact executes
    bit-identically to the built kernel (same lowered module).
    """
    import jax

    path = _artifact_path(key)
    if os.path.exists(path):
        try:
            from jax import export as jexport

            with open(path, "rb") as f:
                exp = jexport.deserialize(f.read())
            return jax.jit(exp.call)
        except Exception:
            pass  # stale/corrupt artifact: rebuild below
    fn = build()
    jfn = fn if hasattr(fn, "lower") else jax.jit(fn)
    if save:
        try:
            from jax import export as jexport

            exp = jexport.export(jfn)(*example_args)
            os.makedirs(cache_dir(), exist_ok=True)
            tmp = path + f".tmp{os.getpid()}"
            with open(tmp, "wb") as f:
                f.write(exp.serialize())
            os.replace(tmp, path)
        except Exception:
            pass  # export unsupported (e.g. interpret-mode kernels): skip
    return jfn
