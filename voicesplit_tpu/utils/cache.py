"""Persistent XLA compilation cache.

TPU compiles of the full train/eval programs take tens of seconds
(minutes over a tunneled chip); enabling JAX's persistent cache makes
every CLI invocation after the first reuse them.  Called by every CLI
entry point; opt out with VOICESPLIT_NO_COMPILE_CACHE=1 or override the
location with VOICESPLIT_COMPILE_CACHE_DIR.
"""

from __future__ import annotations

import os

_DEFAULT_DIR = os.path.expanduser("~/.cache/voicesplit_tpu/xla")


def enable_compile_cache() -> None:
    if os.environ.get("VOICESPLIT_NO_COMPILE_CACHE") == "1":
        return
    # The axon PJRT plugin (tunneled single-chip dev platform) compiles
    # remotely; the persistent cache deadlocks its compile RPC. Skip it
    # there — real TPU runtimes keep the cache.
    if os.environ.get("JAX_PLATFORMS", "") == "axon":
        return
    import jax

    cache_dir = os.environ.get("VOICESPLIT_COMPILE_CACHE_DIR", _DEFAULT_DIR)
    os.makedirs(cache_dir, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    except Exception as e:  # pragma: no cover - older jax
        print(f" ! compile cache unavailable: {e}")
