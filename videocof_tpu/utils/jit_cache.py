"""Persistent XLA compilation cache.

Compiles of the production-size DiT graphs take 8-20 minutes through this
environment's remote compile service; the persistent cache turns every
process restart from a recompile into a ~seconds deserialize. The reference
has no analogue (torch eager + CUDA kernels don't pay a compile); under
XLA's compile-once model this is the difference between a usable CLI and a
20-minute cold start.

Called from `factory.load_pipeline` and `bench.py`; tests configure the same
directory themselves (`tests/conftest.py:26-28`).
"""

from __future__ import annotations

import os

_enabled_path: str | None = None


def enable_persistent_compilation_cache(path: str | None = None) -> str:
    """Idempotent; returns the ACTIVE cache dir. Default:
    `$VIDEOCOF_JIT_CACHE` or `<repo>/.jax_cache` (falling back to
    `~/.cache/videocof_tpu/jax` outside a checkout). A later call with a
    DIFFERENT explicit path reconfigures JAX to it (last writer wins) so the
    returned path is always the one in effect."""
    global _enabled_path
    import jax
    if path is None:
        path = os.environ.get("VIDEOCOF_JIT_CACHE")
    if path is None:
        repo = os.path.dirname(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))))
        # .git is a FILE in worktrees — existence, not isdir, marks a checkout
        path = (os.path.join(repo, ".jax_cache")
                if os.path.exists(os.path.join(repo, ".git"))
                else os.path.join(os.path.expanduser("~"), ".cache",
                                  "videocof_tpu", "jax"))
    path = os.path.abspath(path)
    if _enabled_path == path:
        return path
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    # cache EVERYTHING: on this environment every compile — even an eager
    # reshape — is a 2-7 s remote-compile-service round trip (measured via
    # VIDEOCOF_JIT_CACHE_DEBUG=1: ~180 sub-10s eager-op compiles made every
    # fresh process pay minutes before this went to 0)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    if os.environ.get("VIDEOCOF_JIT_CACHE_DEBUG") == "1":
        # log WHY a lookup missed (first-seen key vs backend/version drift)
        jax.config.update("jax_explain_cache_misses", True)
    _enabled_path = path
    return path
