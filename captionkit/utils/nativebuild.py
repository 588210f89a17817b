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
import warnings

_attempted = False

NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "native")


def ensure_native_built() -> bool:
    """Run `make -C native` once per process if allowed. Returns True if a
    build was attempted and succeeded (the caller should re-probe paths).

    Cross-process safe: concurrent builders serialize on an flock'd
    lockfile, and the Makefile links each .so to a temp name and mv's it
    into place (rename(2) is atomic), so a loader probing mid-build sees
    either no library or a complete one — never a half-linked file.

    The build is an implicit side effect of first using the metrics /
    feature-store layers; it warns once when attempted and loudly when it
    fails, so a missing toolchain doesn't silently strand users on the
    slow Python fallbacks. Opt out with CAPTIONKIT_NO_NATIVE_BUILD=1."""
    global _attempted
    if _attempted or os.environ.get("CAPTIONKIT_NO_NATIVE_BUILD"):
        return False
    _attempted = True
    native = os.path.abspath(NATIVE_DIR)
    if not os.path.exists(os.path.join(native, "Makefile")):
        return False
    try:
        import fcntl

        with open(os.path.join(native, ".build.lock"), "w") as lock:
            fcntl.flock(lock, fcntl.LOCK_EX)  # released on close
            warnings.warn(
                "captionkit: building native helpers (one-time "
                f"`make -C {native}`; set CAPTIONKIT_NO_NATIVE_BUILD=1 "
                "to disable)",
                stacklevel=2,
            )
            proc = subprocess.run(
                ["make", "-C", native],
                capture_output=True, timeout=120,
            )
            if proc.returncode != 0:
                tail = proc.stderr.decode(errors="replace")[-500:]
                warnings.warn(
                    "captionkit: native build FAILED (falling back to the "
                    f"slower Python implementations). make stderr tail:\n"
                    f"{tail}",
                    stacklevel=2,
                )
            return proc.returncode == 0
    except (OSError, subprocess.TimeoutExpired) as e:
        warnings.warn(
            f"captionkit: native build could not run ({e!r}); using the "
            "slower Python implementations",
            stacklevel=2,
        )
        return False
