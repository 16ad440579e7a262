"""Completeness check for queue outputs (ADVICE r4 medium fix).

``[ -s out ]`` is NOT a valid skip test for restartable queues:
``quality_run.py`` rewrites ``--out`` after every epoch, so a job killed by
timeout or a round snapshot leaves a non-empty partial JSON that a naive
skip-if-exists queue then permanently treats as final (round 4 shipped
wgan_ema cut at 25/30 epochs exactly this way). Queue scripts call this
instead: exit 0 only when the artifact is COMPLETE for its kind.

Kinds:
  quality <out> <epochs>            len(history) >= epochs
  quality_ckpt <out> <epochs> <ckpt>  ...and the bundle file exists
  keys <out> <k1,k2,...>            all top-level keys present
  exists <out>                      non-empty file (write-once artifacts)

Usage: python tools/run_complete.py <kind> <out> [args...]
"""

import json
import os
import sys


def main(argv):
    kind, out = argv[1], argv[2]
    if not (os.path.exists(out) and os.path.getsize(out) > 0):
        return 1
    if kind == "exists":
        return 0
    try:
        with open(out) as f:
            d = json.load(f)
    except Exception:
        return 1
    if kind in ("quality", "quality_ckpt"):
        if len(d.get("history", [])) < int(argv[3]):
            return 1
        if kind == "quality_ckpt" and not os.path.exists(argv[4]):
            return 1
        return 0
    if kind == "keys":
        return 0 if all(k in d for k in argv[3].split(",")) else 1
    raise SystemExit(f"unknown kind {kind}")


if __name__ == "__main__":
    sys.exit(main(sys.argv))
