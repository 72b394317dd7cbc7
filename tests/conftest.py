"""Test harness: force CPU with 8 virtual devices so mesh collectives
(sharded index all-gather, global top-k merge) are exercised without a TPU
slice.

The host interpreter may pre-import jax and register a TPU backend via
sitecustomize with JAX_PLATFORMS pinned in the env; backend *initialization*
is lazy, so overriding jax_platforms + XLA_FLAGS here (before any jax.devices()
call) reliably lands the suite on the virtual CPU mesh."""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)

# Persistent XLA compilation cache: the quick tier spends ~2/3 of its wall
# clock compiling (the 15 slowest tests are all first-compile dominated —
# 25 min cold vs minutes warm). Cache survives across runs in the repo's
# .pytest_cache; delete it to force cold compiles.
jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(__file__), ".xla_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
