"""One-shot, on-demand build of the native C++ helpers.

The repo does not commit binaries (they are host-specific: -march=native),
so a fresh checkout has no libcider.so / libfeatstore.so and the metric /
feature-store layers would silently fall back to their (much slower)
Python twins. The loaders call ensure_native_built() before giving up:
one quiet `make -C native` per process, disabled with
CAPTIONKIT_NO_NATIVE_BUILD=1 (e.g. sandboxed CI without a toolchain).
"""

from __future__ import annotations

import os
import subprocess

_attempted = False

NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "native")


def ensure_native_built() -> bool:
    """Run `make -C native` once per process if allowed. Returns True if a
    build was attempted and succeeded (the caller should re-probe paths)."""
    global _attempted
    if _attempted or os.environ.get("CAPTIONKIT_NO_NATIVE_BUILD"):
        return False
    _attempted = True
    makefile = os.path.join(NATIVE_DIR, "Makefile")
    if not os.path.exists(makefile):
        return False
    try:
        proc = subprocess.run(
            ["make", "-C", os.path.abspath(NATIVE_DIR)],
            capture_output=True, timeout=120,
        )
        return proc.returncode == 0
    except (OSError, subprocess.TimeoutExpired):
        return False
