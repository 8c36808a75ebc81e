"""utils/compile_cache.py — fingerprinted cache dir + AOT-spam quarantine.

The quarantine keeps XLA:CPU AOT-rejection C++ log lines (fd-2 writes that
bypass sys.stderr) out of the driver-recorded artifacts and clears the
poisoned cache dir so the next run recompiles cleanly (VERDICT r3 next #8).
"""

import os
import sys

from transductive_clip_tpu.utils import compile_cache as cc

SPAM = (b"E0000 00:00:1787111111.111111 1 cpu_aot_loader.cc:66] "
        b"Feature mismatch: compiled for +avx512f\n")


def _run_quarantined(write_fn, tmp_path, monkeypatch):
    """Run write_fn inside the quarantine while capturing REAL fd 2."""
    cache = tmp_path / "cache"
    cache.mkdir()
    (cache / "entry.bin").write_bytes(b"aot")
    monkeypatch.setattr(cc, "compile_cache_dir",
                        lambda prefix=None: str(cache))
    outer = os.dup(2)
    cap = open(tmp_path / "captured.log", "w+b")
    os.dup2(cap.fileno(), 2)
    try:
        with cc.quarantine_aot_spam():
            write_fn()
    finally:
        sys.stderr.flush()
        os.dup2(outer, 2)
        os.close(outer)
    cap.seek(0)
    data = cap.read()
    cap.close()
    return data, cache


def test_spam_dropped_real_lines_reemitted_cache_cleared(tmp_path,
                                                         monkeypatch):
    def write():
        os.write(2, SPAM)                      # C++-style direct fd write
        os.write(2, b"a real error line\n")
        os.write(2, SPAM)
        print("python-level stderr", file=sys.stderr, flush=True)

    data, cache = _run_quarantined(write, tmp_path, monkeypatch)
    assert b"cpu_aot_loader" not in data
    assert b"a real error line\n" in data
    assert b"python-level stderr\n" in data
    assert b"dropped 2 XLA:CPU AOT-rejection" in data
    # the poisoned ENTRIES must be gone, but the dir itself must be
    # recreated: jax's cache writer never re-creates a missing dir and
    # silently loses persistence for the rest of the run otherwise
    assert cache.exists(), "cache dir must be recreated after clearing"
    assert list(cache.iterdir()) == [], "poisoned entries must be cleared"


def _fake_jax():
    class FakeConfig:
        def __init__(self):
            self.updates = {}

        def update(self, k, v):
            self.updates[k] = v

    class FakeJax:
        config = FakeConfig()

    return FakeJax


def test_enable_compile_cache_creates_missing_dir(tmp_path, monkeypatch):
    """jax never mkdir's the cache dir itself; enable must, or every cache
    write for the rest of the process fails with FileNotFoundError."""
    cache = tmp_path / "cache_gone"
    monkeypatch.setattr(cc, "compile_cache_dir",
                        lambda prefix=None: str(cache))
    monkeypatch.delenv("JAX_PLATFORM_NAME", raising=False)  # TPU-flavored

    fake = _fake_jax()
    path = cc.enable_compile_cache(fake)
    assert path == str(cache)
    assert cache.is_dir()
    assert fake.config.updates["jax_compilation_cache_dir"] == str(cache)


def test_enable_compile_cache_noop_on_forced_cpu(tmp_path, monkeypatch):
    """XLA:CPU AOT entries are self-incompatible in this jax (the loader
    never reports the compile side's prefer-no-* pseudo-features), so
    forced-CPU processes must not enable the persistent cache at all."""
    cache = tmp_path / "cache_cpu"
    monkeypatch.setattr(cc, "compile_cache_dir",
                        lambda prefix=None: str(cache))
    monkeypatch.setenv("JAX_PLATFORM_NAME", "cpu")

    fake = _fake_jax()
    assert cc.enable_compile_cache(fake) is None
    assert fake.config.updates == {}
    assert not cache.exists()


def test_no_spam_is_a_noop(tmp_path, monkeypatch):
    def write():
        os.write(2, b"ordinary warning\n")

    data, cache = _run_quarantined(write, tmp_path, monkeypatch)
    assert b"ordinary warning\n" in data
    assert b"AOT-rejection" not in data
    assert cache.exists(), "clean cache must be kept"


def test_exception_inside_block_still_restores_and_reemits(tmp_path,
                                                           monkeypatch):
    def write():
        os.write(2, SPAM)
        raise RuntimeError("boom")

    import pytest

    outer = os.dup(2)
    cap = open(tmp_path / "captured.log", "w+b")
    cache = tmp_path / "cache"
    cache.mkdir()
    monkeypatch.setattr(cc, "compile_cache_dir",
                        lambda prefix=None: str(cache))
    os.dup2(cap.fileno(), 2)
    try:
        with pytest.raises(RuntimeError, match="boom"):
            with cc.quarantine_aot_spam():
                write()
    finally:
        sys.stderr.flush()
        os.dup2(outer, 2)
        os.close(outer)
    cap.seek(0)
    data = cap.read()
    cap.close()
    assert b"cpu_aot_loader" not in data
    assert b"dropped 1 XLA:CPU AOT-rejection" in data


def test_tpu_attached_process_keeps_cache_on_rejection(tmp_path, monkeypatch):
    """A TPU-attached process (no JAX_PLATFORM_NAME=cpu) must NOT rmtree its
    cache dir on a CPU-AOT rejection: the dir also holds its expensive TPU
    executables, which _cpu_fingerprint deliberately preserves — one stale
    CPU entry only costs quarantined re-rejection spam."""
    monkeypatch.delenv("JAX_PLATFORM_NAME", raising=False)

    def write():
        os.write(2, SPAM)

    data, cache = _run_quarantined(write, tmp_path, monkeypatch)
    assert b"dropped 1 XLA:CPU AOT-rejection" in data
    assert b"kept cache dir" in data
    assert cache.exists(), "TPU-attached cache must survive CPU-AOT spam"
