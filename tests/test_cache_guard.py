"""Poisoned-compile-cache guard: a truncated/garbage persistent-cache entry
must be evicted by conftest's validate-or-evict pass instead of aborting the
interpreter when XLA deserializes it (jax's lru_cache writes entries
non-atomically, so a killed run can leave truncated files)."""

import os

import conftest


def test_corrupt_entries_evicted_valid_kept(tmp_path):
    from jax._src.compilation_cache import compress_executable

    good = tmp_path / "jit_f-aaaa-cache"
    good.write_bytes(compress_executable(b"\x00" * 256))
    truncated = tmp_path / "jit_g-bbbb-cache"
    truncated.write_bytes(compress_executable(b"\x01" * 4096)[:17])
    garbage = tmp_path / "jit_h-cccc-cache"
    garbage.write_bytes(os.urandom(64))

    conftest._evict_corrupt_cache_entries(str(tmp_path))

    assert good.exists(), "valid entry must survive validation"
    assert not truncated.exists(), "truncated entry must be evicted"
    assert not garbage.exists(), "garbage entry must be evicted"


def test_missing_dir_is_noop(tmp_path):
    conftest._evict_corrupt_cache_entries(str(tmp_path / "nope"))
