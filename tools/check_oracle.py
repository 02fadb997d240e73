"""Local replica of the driver's t2 correctness gate.

Runs every ``__spark_entry__.queries()`` entry at sf0.01 and compares
against ``oracle_sql()`` via DuckDB: row count, column names, and an
order-insensitive value hash (floats rounded to 6 significant-ish
decimals to absorb engine-level float noise — the driver's compare is
assumed at least this strict, so passing here is necessary, not
sufficient).

Usage: PYTHONPATH=/root/repo python tools/check_oracle.py [name ...]
"""

from __future__ import annotations

import decimal as _decimal
import math
import os
import sys
import time

import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_ORACLE_SF_DIR", "/root/testdata/sf0.01")
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def _norm_cell(v):
    import numpy as np

    if v is None:
        return "NULL"
    if isinstance(v, (bool, np.bool_)):
        return "true" if v else "false"
    if isinstance(v, np.integer):
        v = int(v)
    if isinstance(v, np.floating):
        v = float(v)
    if isinstance(v, np.ndarray):
        v = v.tolist()
    if isinstance(v, _decimal.Decimal):
        v = float(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # Keep an integral float distinct from an int cell: the driver's
        # comparator renders 11221 and 11221.0 differently (r1
        # expr_math_functions hash fail), so the local gate must too.
        s = f"{v:.6g}"
        if "." not in s and "e" not in s and "inf" not in s:
            s += ".0"
        return s
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_norm_cell(x) for x in v) + "]"
    if hasattr(v, "isoformat"):
        return v.isoformat()
    if isinstance(v, (bytes, bytearray)):
        return v.hex()
    return str(v)


def _fingerprint(columns, rows):
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    lines = sorted("|".join(_norm_cell(r[i]) for i in order) for r in rows)
    import hashlib

    h = hashlib.sha256()
    for line in lines:
        h.update(line.encode())
        h.update(b"\n")
    return h.hexdigest()


def main(selected: list[str]) -> int:
    import duckdb

    import __spark_entry__ as entry

    if os.environ.get("SPARK_GRAFT_PLAIN_SESSION"):
        # driver rehearsal: an unconfigured default session, exactly
        # what the harness hands the entries (no Kryo/AQE/UTC pinning —
        # entries must self-configure what they need)
        from pyspark.sql import SparkSession

        spark = (
            SparkSession.builder.master("local[8]")
            .appName("oracle-check-plain")
            .getOrCreate()
        )
        spark.sparkContext.setLogLevel("ERROR")
    else:
        from warpdb_spark.session import get_spark

        spark = get_spark("oracle-check")
    con = duckdb.connect()
    for t in TABLES:
        p = f"{SF_DIR}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    queries = entry.queries()
    oracles = entry.oracle_sql()
    names = selected or list(queries)
    failures = []
    for name in names:
        t0 = time.time()
        try:
            sdf = queries[name](spark, SF_DIR)
            srows = [tuple(r) for r in sdf.collect()]
            scols = list(sdf.columns)
            # a few entries persist() a shared frame for the duration
            # of their own job; drop those caches between entries so a
            # full 255-entry sweep doesn't accumulate stale storage
            spark.catalog.clearCache()
        except Exception as e:  # noqa: BLE001
            failures.append(name)
            print(f"FAIL  {name}: spark error: {type(e).__name__}: {e}")
            continue
        if name not in oracles:
            print(f"rows  {name}: {len(srows)} rows (no oracle — rows-only check) [{time.time()-t0:.1f}s]")
            continue
        try:
            # go through fetchdf() like the driver does: DuckDB HUGEINT
            # (integer sum()) becomes pandas float64 there, so fetchall()
            # would hide an int-vs-float hash mismatch the driver sees
            odf = con.execute(oracles[name]).fetchdf()
            ocols = list(odf.columns)
            orows = [
                tuple(None if (isinstance(v, float) and math.isnan(v)) or v is pd.NaT else v for v in r)
                for r in odf.itertuples(index=False, name=None)
            ]
        except Exception as e:  # noqa: BLE001
            failures.append(name)
            print(f"FAIL  {name}: duckdb error: {e}")
            continue
        problems = []
        if len(srows) != len(orows):
            problems.append(f"rowcount spark={len(srows)} duckdb={len(orows)}")
        if sorted(scols) != sorted(ocols):
            problems.append(f"columns spark={sorted(scols)} duckdb={sorted(ocols)}")
        if not problems and _fingerprint(scols, srows) != _fingerprint(ocols, orows):
            problems.append("value hash mismatch")
            for a, b in list(zip(sorted(srows), sorted(orows)))[:3]:
                if _norm_cell(a) != _norm_cell(b):
                    problems.append(f"  first diff: spark={a!r} duckdb={b!r}")
                    break
        if problems:
            failures.append(name)
            print(f"FAIL  {name}: " + "; ".join(problems))
        else:
            print(f"ok    {name}: {len(srows)} rows [{time.time()-t0:.1f}s]")
    print(f"\n{len(names) - len(failures)}/{len(names)} passed")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
