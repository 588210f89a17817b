"""Thin shim kept for discoverability — the caption-edit server is a
first-class CLI subsystem now (captionkit.serve + `captionkit serve`).

    python -m captionkit.cli serve --config editnet_beam5 \
        --params params.npz --wordmap WORDMAP.json --batch 256

Protocol, batching, and error semantics: captionkit/serve.py docstring.
This shim forwards its argv (plus --cpu for dev hosts whose sitecustomize
latches a TPU platform)."""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> int:
    argv = sys.argv[1:]
    platform = []
    if "--cpu" in argv:
        argv = [a for a in argv if a != "--cpu"]
        platform = ["--platform", "cpu"]
    from captionkit.cli import main as cli_main

    return cli_main([*platform, "serve", *argv])


if __name__ == "__main__":
    sys.exit(main())
