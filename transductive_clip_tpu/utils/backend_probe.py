"""Bounded out-of-process probe of the default JAX backend.

The tunneled TPU backend has an outage mode where PJRT plugin/backend init
HANGS rather than errors, so an in-process ``jax.devices()`` can wedge the
caller forever. Probing in a subprocess bounds the wait. Shared by
``bench.py``, ``__graft_entry__.py``, and ``scripts/bench_suite.py`` so the
outage-handling knobs cannot drift apart.

The child is terminated GENTLY on timeout (SIGTERM, a grace period, then
SIGKILL): a slow-but-alive init may be mid-acquisition of the remote TPU
grant, and hard-killing a grant-holding process wedges all TPU ops for
~20+ minutes (see CLAUDE.md). SIGTERM lets the PJRT client release the
grant on its way out.

Importing this module must never import jax (the probe exists precisely so
callers can avoid touching jax before knowing the backend is alive).
"""

from __future__ import annotations

import os
import subprocess
import sys

# one env knob for every probe call site
_TIMEOUT_ENV = "TCLIP_PROBE_TIMEOUT"


def probe_device_count(timeout_s: float | None = None,
                       grace_s: float = 30.0) -> int:
    """How many devices the default backend has; 0 = unreachable/hung.

    ``timeout_s`` defaults to ``$TCLIP_PROBE_TIMEOUT`` or 300 s.
    """
    if timeout_s is None:
        timeout_s = float(os.environ.get(_TIMEOUT_ENV, "300"))
    proc = subprocess.Popen(
        [sys.executable, "-c", "import jax; print(len(jax.devices()))"],
        stdout=subprocess.PIPE, stderr=subprocess.DEVNULL, text=True,
    )
    try:
        out, _ = proc.communicate(timeout=timeout_s)
    except subprocess.TimeoutExpired:
        proc.terminate()                      # gentle: let the grant release
        try:
            proc.wait(timeout=grace_s)
        except subprocess.TimeoutExpired:
            proc.kill()
            proc.wait()
        return 0
    if proc.returncode != 0:
        return 0
    try:
        return int(out.strip().splitlines()[-1])
    except (ValueError, IndexError):
        return 0


def backend_reachable(timeout_s: float | None = None) -> bool:
    return probe_device_count(timeout_s=timeout_s) > 0
