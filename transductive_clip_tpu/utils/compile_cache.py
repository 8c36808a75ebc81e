"""Persistent XLA compile-cache location, keyed by a CPU-feature fingerprint.

XLA:CPU AOT artifacts embed the compile machine's CPU features; loading them
on a host with different features is rejected with noisy errors (and XLA
warns SIGILL is possible). Hostname alone is not a sufficient key — this
workspace has observed two different CPU microarchitectures behind one
hostname — so the cache directory is keyed by a hash of the host's cpuinfo
flags (plus the hostname for readability).
"""

from __future__ import annotations

import contextlib
import hashlib
import os
import platform
import socket


def _is_forced_cpu() -> bool:
    """True for processes that actually run on XLA:CPU.

    Only JAX_PLATFORM_NAME forces CPU here (the axon plugin ignores
    JAX_PLATFORMS): a JAX_PLATFORMS=cpu process with the plugin registered
    still runs on the TPU.
    """
    return os.environ.get("JAX_PLATFORM_NAME", "").strip().lower() == "cpu"


def _cpu_fingerprint() -> str:
    bits = [platform.machine(), platform.processor() or ""]
    try:
        import jaxlib

        # XLA:CPU AOT artifacts are tied to the compiling jaxlib's LLVM
        # feature set as well as the CPU
        bits.append(jaxlib.__version__)
    except Exception:
        pass
    # model name + microcode distinguish microarchitectures whose feature
    # flags line happens to match; take the first occurrence of each
    wanted = ("flags", "Features", "model name", "microcode", "cpu family",
              "model\t")
    seen = set()
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                key = line.split(":")[0].strip()
                if line.startswith(wanted) and key not in seen:
                    seen.add(key)
                    bits.append(line.strip())
    except OSError:
        pass
    # boot id, for forced-CPU processes only: this workspace's VM migrates
    # between microarchitectures, and a migration-with-reboot can land on a
    # host whose *virtualized* cpuinfo matches an earlier fingerprint while
    # LLVM's cpuid-based detection differs (observed as cpu_aot_loader
    # feature-mismatch rejections). Only XLA:CPU AOT artifacts carry that
    # hazard — TPU executables are device-keyed — so TPU-plugin processes
    # keep their (expensive, minutes-of-warmup) cache across reboots rather
    # than flushing it for a CPU-only failure mode. A live migration under a
    # running kernel can still slip through either way — XLA rejects those
    # artifacts gracefully at load.
    if _is_forced_cpu():
        try:
            with open("/proc/sys/kernel/random/boot_id") as f:
                bits.append(f.read().strip())
        except OSError:
            pass
    # platform config: XLA:CPU target options (e.g. +prefer-no-scatter /
    # +prefer-no-gather) differ between processes initialized with a device
    # plugin (JAX_PLATFORMS=<plugin>) and pure-CPU processes on the SAME
    # host+boot; sharing one cache dir across them produces feature-mismatch
    # rejections at AOT load. Key the dir by the platform selection too.
    bits.append(os.environ.get("JAX_PLATFORMS", ""))
    bits.append(os.environ.get("JAX_PLATFORM_NAME", ""))
    return hashlib.sha256("|".join(bits).encode()).hexdigest()[:10]


def compile_cache_dir(prefix: str = "/tmp/tclip_jax_cache") -> str:
    return f"{prefix}_{socket.gethostname()}_{_cpu_fingerprint()}"


def enable_compile_cache(jax, min_compile_secs: float = 1.0):
    """Point jax at the fingerprinted persistent cache; returns the dir.

    **Forced-CPU processes get no persistent cache** (returns None): this
    jax/jaxlib's XLA:CPU AOT loader rejects every entry the SAME process
    configuration wrote — the compile side records pseudo-features
    ``+prefer-no-scatter,+prefer-no-gather`` in the artifact's target
    machine, and the load side's host-feature detection never reports
    them, so each load fails the feature check and recompiles (measured:
    write + immediate reload of a trivial jit in one fixed env rejects
    with "Target machine feature +prefer-no-scatter is not supported on
    the host machine"). Enabling the cache there is pure overhead: wasted
    serialization per compile, cpu_aot_loader error spam per load, and
    zero warm-start. The TPU path is unaffected and demonstrably works
    (194.8 s cold -> 5.1 s warm for the EM-Dirichlet protocol drive).
    """
    if _is_forced_cpu():
        return None
    path = compile_cache_dir()
    # jax's cache writer does NOT create the directory and fails every
    # entry write with FileNotFoundError if it is missing (observed when a
    # concurrent quarantine_aot_spam cleared the dir mid-run: the whole
    # remainder of the run silently lost persistence)
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update(
        "jax_persistent_cache_min_compile_time_secs", min_compile_secs
    )
    return path


@contextlib.contextmanager
def quarantine_aot_spam(clear_cache_on_rejection: bool = True):
    """Keep XLA:CPU AOT-rejection log spam out of recorded artifacts.

    Despite the fingerprinted cache dir, live migrations and stale
    pre-fingerprint entries can still hand XLA an AOT artifact compiled for
    different CPU features; XLA rejects each one gracefully but logs a C++
    ``cpu_aot_loader.cc`` E-line per entry — hundreds of lines that bury the
    one ok/summary line the driver records (bench.py JSON,
    ``dryrun_multichip ok``). This context manager redirects stderr at the
    FD level (C++ glog writes to fd 2 directly, bypassing sys.stderr)
    through a filtering pipe for the wrapped compile-heavy section: spam
    lines are counted and dropped, everything else is re-emitted
    immediately, and a one-line count of what was dropped is printed at
    exit. A rejection also
    means the cache dir is poisoned for this host, so it is cleared
    (``clear_cache_on_rejection``) — the next run recompiles once and
    re-caches cleanly instead of re-spamming forever.

    Callers print their summary line AFTER the with-block so it is the last
    thing in the artifact.

    Implemented as a LIVE filtering tee (pipe + background pump thread), not
    a buffer-then-replay: non-spam diagnostics reach the real stderr the
    moment they are written, so an abnormal death inside the block (OOM,
    SIGKILL, TPU wedge) loses at most one partial line, and long compiles
    stay observable while they run.
    """
    import os
    import sys
    import threading

    sys.stderr.flush()
    saved = os.dup(2)
    r_fd, w_fd = os.pipe()
    n_dropped = [0]

    def _pump():
        buf = b""
        while True:
            try:
                chunk = os.read(r_fd, 65536)
            except OSError:
                break
            if not chunk:
                break
            buf += chunk
            while True:
                nl = buf.find(b"\n")
                if nl < 0:
                    break
                line, buf = buf[:nl + 1], buf[nl + 1:]
                if b"cpu_aot_loader" in line:
                    n_dropped[0] += 1
                else:
                    try:
                        os.write(saved, line)
                    except OSError:
                        pass
        if buf:                                   # trailing partial line
            if b"cpu_aot_loader" in buf:
                n_dropped[0] += 1
            else:
                try:
                    os.write(saved, buf)
                except OSError:
                    pass
        os.close(r_fd)

    pump = threading.Thread(target=_pump, name="aot-spam-tee", daemon=True)
    pump.start()
    os.dup2(w_fd, 2)
    os.close(w_fd)                # fd 2 now holds the only write end
    try:
        yield
    finally:
        sys.stderr.flush()
        os.dup2(saved, 2)         # closes the pipe write end -> pump EOF
        # a subprocess spawned inside the block could still hold an
        # inherited write end open; bound the wait (pump is a daemon)
        pump.join(timeout=10)
        if pump.is_alive():
            pass          # leak `saved` rather than let a late write hit a
            #               reused fd number; the daemon dies with the process
        else:
            os.close(saved)
        dropped = n_dropped[0]
        if dropped:
            msg = (f"[compile-cache] dropped {dropped} XLA:CPU AOT-rejection "
                   f"log lines")
            # clear only for forced-CPU processes: every entry in their
            # fingerprinted dir is an XLA:CPU artifact, so a rejection
            # means the whole dir is poisoned for this host. A TPU-attached
            # process's dir also holds its (expensive, minutes-of-warmup)
            # TPU executables, which _cpu_fingerprint deliberately
            # preserves across reboots — one stale CPU-AOT entry must not
            # flush those, so it keeps the dir and relies on the
            # quarantine to keep the re-rejection spam out of artifacts.
            if clear_cache_on_rejection and _is_forced_cpu():
                import shutil

                path = compile_cache_dir()
                shutil.rmtree(path, ignore_errors=True)
                # recreate immediately: any live process pointed at this dir
                # (this one, or a parent pytest run that spawned us) writes
                # entries WITHOUT creating the dir — a missing dir breaks
                # persistence for the rest of its run
                os.makedirs(path, exist_ok=True)
                msg += f"; cleared poisoned cache dir {path}"
            elif clear_cache_on_rejection:
                msg += ("; kept cache dir (TPU-attached process — its TPU "
                        "executables outvalue the stale CPU entries)")
            print(msg, file=sys.stderr, flush=True)
