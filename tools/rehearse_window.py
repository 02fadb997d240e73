"""Rehearse the driver's next correctness window.

Resolves the exact window the driver will check (the first N names of
``DRIVER_PRIORITY`` — every pending entry first, then green entries in
rotation order) and runs ``tools/check_oracle.py`` over those names
under ``SPARK_GRAFT_PLAIN_SESSION=1`` (an unconfigured default
session, exactly what the harness hands the entries). The rule this
encodes (round-6 verdict): any new entry must be added to
``rotation.PENDING_ORDER`` BEFORE the final rehearsal of a round — a
name that never rehearsed under the plain session is the class of
thing that reddens a driver window.

Usage: PYTHONPATH=/root/repo python tools/rehearse_window.py [N]
(N defaults to 50, the driver's window size.)
"""

from __future__ import annotations

import os
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 50

    import warpdb_spark.inventory as inv

    inv.load_all()
    window = inv.DRIVER_PRIORITY[:n]
    from warpdb_spark.inventory import rotation

    n_pending = sum(1 for name in window if name in rotation.PENDING_ORDER)
    print(
        f"window: {len(window)} names ({n_pending} pending, "
        f"{len(window) - n_pending} green re-checks)"
    )

    env = dict(os.environ, SPARK_GRAFT_PLAIN_SESSION="1")
    rc = subprocess.call(
        [sys.executable, os.path.join(os.path.dirname(__file__), "check_oracle.py")]
        + window,
        env=env,
    )
    return rc


if __name__ == "__main__":
    raise SystemExit(main())
