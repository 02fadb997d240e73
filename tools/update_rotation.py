#!/usr/bin/env python3
"""Apply a driver correctness artifact to the rotation bookkeeping.

Usage: python tools/update_rotation.py CORRECTNESS_r04.json 4 [--write]

Reads the artifact, finds entries whose row is fully green
(rows/schema/hash all matching, no err) and that are still listed in
``rotation.PENDING_ORDER``, and rewrites
``warpdb_spark/inventory/rotation.py`` moving them into
``DRIVER_GREEN`` with the given round number. Without --write it only
prints the planned moves. Entries that came back red stay pending (and
should be fixed, then keep their front-of-window slot).
"""

from __future__ import annotations

import json
import re
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
ROTATION = REPO / "warpdb_spark" / "inventory" / "rotation.py"


def fully_green(row: dict) -> bool:
    # hash_match must be an EXPLICIT pass: True, or the 'skipped'
    # sentinel the driver writes for hash-exempt (rows-only) entries. A
    # missing/None hash field means the check never ran — not green.
    return bool(
        row.get("rows_match")
        and row.get("schema_match")
        and row.get("hash_match") in (True, "skipped")
        and not row.get("err")
    )


def main() -> int:
    if len(sys.argv) < 3:
        print(__doc__)
        return 2
    artifact, rnd = Path(sys.argv[1]), int(sys.argv[2])
    write = "--write" in sys.argv[3:]
    data = json.loads(artifact.read_text())

    src = ROTATION.read_text()
    # anchor on the list ASSIGNMENT, not the word (which the module
    # docstring also uses repeatedly)
    pending_block = src.split("PENDING_ORDER: list[str] = [", 1)[1].split("]", 1)[0]
    pending = re.findall(r'^    "([a-z0-9_]+)",$', pending_block, re.M)
    if not pending:
        raise SystemExit("could not parse PENDING_ORDER from rotation.py")
    newly_green = [n for n in pending if n in data and fully_green(data[n])]
    red = [n for n in pending if n in data and not fully_green(data[n])]

    print(f"window rows: {len(data)}; newly green pending: {len(newly_green)}; red: {len(red)}")
    for n in newly_green:
        print(f"  green -> r{rnd}: {n}")
    for n in red:
        print(f"  STILL RED (keep pending, fix): {n} :: {data[n].get('err') or 'mismatch'}")

    if not write:
        print("(dry run; pass --write to apply)")
        return 0

    for n in newly_green:
        src = src.replace(f'    "{n}",\n', "", 1)  # drop from PENDING_ORDER
    insert = "".join(f'    "{n}": {rnd},\n' for n in newly_green)
    src = src.replace("}\n\n# Never-driver-checked", insert + "}\n\n# Never-driver-checked", 1)
    ROTATION.write_text(src)
    print(f"rotation.py updated: moved {len(newly_green)} entries to DRIVER_GREEN (r{rnd})")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
