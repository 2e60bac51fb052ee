"""Opt-in persistent XLA compilation cache.

The production train configs compile in minutes (ETNet/Hyper/flow:
10-20 min on the axon relay, docs/PERF.md), and several workflows pay
that cost repeatedly in FRESH processes: the ckpt_paths kill+resume
protocol, the segmented soak (scripts/soak_train.py --segment-epochs,
which restarts the train child every N epochs to bound the relay
client's host-RSS retention), the release acceptance kit (one process
per family), and "test all checkpoints" sweeps. JAX's persistent
compilation cache serializes compiled executables to disk keyed by
(HLO, compile options, backend version), so every restart after the
first is a cache hit instead of a recompile.

Off by default (matches stock JAX). Enable by setting

    V2V_COMPILE_CACHE=/path/to/cache/dir

before launching any CLI entry point (v2v-train / v2v-test-e2vid /
v2v-test-flow / v2v-validate-release). Requires a PJRT backend that
supports executable serialization; if the backend refuses, JAX warns
and falls back to compiling — behavior is unchanged, just slower.

Reference counterpart: none — torch caches kernels per-process only;
this is a JAX/XLA capability the TPU rebuild gets for free.
"""
import os


def maybe_enable() -> str | None:
    """Configure the persistent cache if V2V_COMPILE_CACHE is set.

    Returns the cache dir when enabled, else None. Safe to call
    multiple times and before/after other jax.config updates; must run
    before the first jit compilation to catch it.
    """
    cache_dir = os.environ.get("V2V_COMPILE_CACHE")
    if not cache_dir:
        return None
    import jax

    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    # cache every entry: the long-pole executables are exactly the
    # ones a restart re-pays, and small entries are cheap to store
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    return cache_dir
