"""Persistent XLA compilation cache.

The flagship decode program takes minutes to compile cold (one 48-layer
body traced under prefill + a fori_loop); the reference never pays this
because torch is eager, so an interactive user of the rebuild would see a
~3 min first-query stall every process start.  Enabling JAX's persistent
compilation cache amortizes that to one compile per (program, shape,
jaxlib) ever: warm starts deserialize the executable in seconds.

Note the residual warm-start variance on the tunneled runtime: with a
fully warm cache (zero persistent misses logged), the first CALL of the
decode program still measures anywhere from ~30s to ~520s — the remote
runtime pays its own one-time program load/link on first execution, and
that cost depends on its internal state, not on this cache.  Steady-state
throughput is unaffected.

Call sites: bench.py and every CLI entry point (generate/serve/pretrain/
fid).  Tests do NOT enable it — they intentionally exercise fresh traces.

CPU backends are excluded: on the tunneled runtime the cache may hold
XLA:CPU AOT artifacts compiled on a DIFFERENT machine (the remote compile
helper), and loading them locally warns "machine type ... doesn't match
... could lead to execution errors such as SIGILL".  TPU executables are
target-hardware-keyed, so only those are cached.
"""

from __future__ import annotations

import os

import jax

DEFAULT_DIR = os.path.expanduser("~/.cache/cogview_tpu/xla")


def enable_persistent_cache(path: str | None = None) -> str:
    """Idempotently enable the on-disk compilation cache and return its
    directory.  Override the location with $COGVIEW_COMPILE_CACHE (an
    empty value disables caching entirely)."""
    env = os.environ.get("COGVIEW_COMPILE_CACHE")
    if env == "":
        return ""
    # CPU-only processes skip the cache (module docstring).  Decide from
    # the platforms CONFIG, not jax.default_backend(): initializing the
    # backend this early detaches the persistent cache on the tunneled
    # runtime (measured: compile_seconds stayed ~250s across runs).
    # When jax_platforms is unset (no axon sitecustomize pinning it), fall
    # back to the resolved default backend so a CPU-only process is still
    # excluded — jax.default_backend() is safe to call here because without
    # a tunneled runtime there is no remote-compile path to detach.
    platforms = (jax.config.jax_platforms or "").split(",")[0]
    if not platforms:
        platforms = jax.default_backend()
    if platforms == "cpu":
        return ""
    path = path or env or DEFAULT_DIR
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    # cache EVERYTHING: on the tunneled runtime even a jit_multiply costs
    # a ~0.4s remote-compile round trip, and a CLI start runs ~27 such
    # tiny dispatch ops before the big program
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    # pallas/custom-call lowerings can embed process-local pointers in the
    # serialized HLO, making keys nondeterministic across processes (the
    # decode program's intermittent misses); strip them from the key, and
    # log the key component that differs whenever a miss still happens
    jax.config.update("jax_remove_custom_partitioning_ptr_from_cache_key", True)
    jax.config.update("jax_explain_cache_misses", True)
    return path
