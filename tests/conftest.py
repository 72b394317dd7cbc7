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

try:
    # One observed full-suite crash was a SIGSEGV *inside*
    # backend_compile_and_load late in the run (XLA:CPU/LLVM compile of a
    # large scan program; the file passes standalone). LLVM's recursive
    # passes are the classic way to blow the default 8 MB main-thread
    # stack, so lift the rlimit for the suite process — free if that
    # wasn't the cause, prevents the crash class if it was.
    import resource

    _soft, _hard = resource.getrlimit(resource.RLIMIT_STACK)
    resource.setrlimit(resource.RLIMIT_STACK, (_hard, _hard))
except (ImportError, ValueError, OSError):
    pass

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)

# Persistent XLA compilation cache: the quick tier spends ~2/3 of its wall
# clock compiling (the 15 slowest tests are all first-compile dominated —
# 25 min cold vs minutes warm). Cache survives across runs in the repo's
# .pytest_cache; delete it to force cold compiles.
_CACHE_DIR = os.path.join(os.path.dirname(__file__), ".xla_cache")


def _install_cache_checksums() -> None:
    """jax's file-system cache writes entries NON-atomically
    (lru_cache.put -> Path.write_bytes, no temp+rename), so a run killed
    mid-write leaves a corrupt file — and XLA's executable deserializer
    ABORTS the whole interpreter on first use of such an entry (observed
    twice at ~85% of a full suite run: fatal abort inside
    compilation_cache.get_executable_and_time). Validating the zstd
    container is NOT enough — the second abort came from an entry that
    decompressed cleanly but fed backend.deserialize_executable garbage.
    So: wrap LRUCache.put to also write a sha256 sidecar (after the entry,
    atomically), and LRUCache.get to verify it — an entry with a missing
    or mismatched sidecar is evicted and reported as a miss, costing one
    recompile instead of the run. Pre-sidecar entries are evicted the
    first time they're read (one-time cold rebuild)."""
    import hashlib

    try:
        from jax._src.lru_cache import LRUCache
    except ImportError:  # private API moved: fall back to no validation
        return
    if getattr(LRUCache, "_sha_sidecars", False):
        return
    orig_get, orig_put = LRUCache.get, LRUCache.put

    def safe_put(self, key, val):
        orig_put(self, key, val)
        # Sidecar lands strictly AFTER the entry bytes: a crash in between
        # leaves entry-without-sidecar, which safe_get treats as corrupt.
        tmp = self.path / f".{key}.sha.tmp"
        tmp.write_bytes(hashlib.sha256(val).hexdigest().encode())
        os.replace(tmp, self.path / f"{key}-sha256")

    def safe_get(self, key):
        val = orig_get(self, key)
        if val is None:
            return None
        sidecar = self.path / f"{key}-sha256"
        try:
            ok = sidecar.read_bytes().decode() == hashlib.sha256(val).hexdigest()
        except OSError:
            ok = False
        if not ok:
            (self.path / f"{key}-cache").unlink(missing_ok=True)
            sidecar.unlink(missing_ok=True)
            return None
        return val

    LRUCache.get, LRUCache.put = safe_get, safe_put
    LRUCache._sha_sidecars = True


_install_cache_checksums()
jax.config.update("jax_compilation_cache_dir", _CACHE_DIR)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
# Belt-and-braces: cache read/write errors that DO surface as Python
# exceptions should log-and-recompile, never raise (default in jax 0.9,
# pinned here so a version bump can't flip it).
jax.config.update("jax_raise_persistent_cache_errors", False)
