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
_CACHE_DIR = os.path.join(os.path.dirname(__file__), ".xla_cache")


def _evict_corrupt_cache_entries(cache_dir: str) -> None:
    """jax's file-system cache writes entries NON-atomically
    (lru_cache.put -> Path.write_bytes, no temp+rename), so a run killed
    mid-write leaves a truncated file — and XLA's executable deserializer
    ABORTS the whole interpreter on first use of such an entry (observed
    once at 85% of a full suite run: fatal abort inside
    compilation_cache.get_executable_and_time). Validate each entry's
    compressed container up front with jax's own decompressor and evict
    failures, so a bad entry costs one recompile instead of the run."""
    import pathlib

    try:
        from jax._src.compilation_cache import decompress_executable
    except ImportError:  # private API moved: fall back to no validation
        return
    for p in pathlib.Path(cache_dir).glob("*cache*"):
        if not p.is_file():
            continue
        try:
            decompress_executable(p.read_bytes())
        except Exception:
            p.unlink(missing_ok=True)


_evict_corrupt_cache_entries(_CACHE_DIR)
jax.config.update("jax_compilation_cache_dir", _CACHE_DIR)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
# Belt-and-braces: cache read/write errors that DO surface as Python
# exceptions should log-and-recompile, never raise (default in jax 0.9,
# pinned here so a version bump can't flip it).
jax.config.update("jax_raise_persistent_cache_errors", False)
