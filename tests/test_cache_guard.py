"""Poisoned-compile-cache guard: jax's lru_cache writes entries
non-atomically, and XLA's executable deserializer ABORTS the interpreter on
a corrupt entry — including entries whose zstd container decompresses
cleanly (observed in a full-suite run). conftest therefore wraps
LRUCache.put/get with sha256 sidecars: put writes the hash after the entry,
get verifies it and evicts on any mismatch/missing sidecar, so corruption
costs one recompile instead of the run."""

import hashlib

import conftest  # noqa: F401  (installs the sidecar wrapper on import)
from jax._src.lru_cache import LRUCache


def _mk(tmp_path):
    return LRUCache(str(tmp_path), max_size=-1)


def test_put_writes_sidecar_and_roundtrips(tmp_path):
    c = _mk(tmp_path)
    c.put("jit_f-aaaa", b"\x00" * 256)
    assert (tmp_path / "jit_f-aaaa-cache").exists()
    sidecar = tmp_path / "jit_f-aaaa-sha256"
    assert sidecar.read_bytes().decode() == hashlib.sha256(b"\x00" * 256).hexdigest()
    assert c.get("jit_f-aaaa") == b"\x00" * 256


def test_truncated_entry_evicted_on_get(tmp_path):
    c = _mk(tmp_path)
    c.put("jit_g-bbbb", b"\x01" * 4096)
    # simulate a mid-write kill: entry truncated AFTER the sidecar landed
    (tmp_path / "jit_g-bbbb-cache").write_bytes(b"\x01" * 17)
    assert c.get("jit_g-bbbb") is None, "corrupt entry must read as a miss"
    assert not (tmp_path / "jit_g-bbbb-cache").exists(), "and be evicted"
    assert not (tmp_path / "jit_g-bbbb-sha256").exists()


def test_entry_without_sidecar_evicted(tmp_path):
    # pre-sidecar-era entry, or a crash between entry write and sidecar write
    c = _mk(tmp_path)
    (tmp_path / "jit_h-cccc-cache").write_bytes(b"\x02" * 64)
    assert c.get("jit_h-cccc") is None
    assert not (tmp_path / "jit_h-cccc-cache").exists()


def test_garbage_content_valid_container_evicted(tmp_path):
    # the failure mode zstd validation cannot catch: bytes that differ from
    # what put() recorded, regardless of whether they decompress
    c = _mk(tmp_path)
    c.put("jit_i-dddd", b"\x03" * 512)
    (tmp_path / "jit_i-dddd-cache").write_bytes(b"\x04" * 512)
    assert c.get("jit_i-dddd") is None
    assert not (tmp_path / "jit_i-dddd-cache").exists()


def test_miss_stays_miss(tmp_path):
    assert _mk(tmp_path).get("jit_nope-eeee") is None
