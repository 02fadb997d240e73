"""Inventory-wide audit: window (per-group sort) partitioned by a
bounded-domain key.

The headline contract test (tests/test_inventory_contract.py::
test_headline_has_no_window_sort_on_low_cardinality_key) fail-closes
the FROZEN 15-query bench suite against this scale-killer; this tool
sweeps the OPTIMIZED plan of every inventory entry (265 at round 8) so
the next one cannot be added silently anywhere in the inventory — the
companion contract test pins the audit's findings to the known
exceptions list below.

Why it matters at 100 TB: a window partitioned by a key whose domain
does not grow with the data (lang, returnflag, segment — distinct
count <= 10 at every sf) puts ~1/|domain| of the CORPUS into ONE task.
An aggregation over the same key is fine (partial aggregation combines
map-side); the window is not, because a window is a per-group SORT of
all member rows.

Not every bounded-key window is a killer — the tool classifies each
Window node by the STRUCTURE of its input (read from the optimized
plan tree), because the sort cost is the input's size, not the key's:

- ``groups_limited``: Spark placed a ``WindowGroupLimit`` below the
  Window (a ``row_number() <= k`` filter) — a map-side partial top-k
  that ships at most k rows per group per task before the window's
  shuffle, exactly like partial aggregation. Safe at any scale
  (window_rank_topn, sample_reservoir_per_key, ...).
- ``agg_input``: the Window's immediate child is an Aggregate — the
  window sorts GROUPS, not corpus rows. Safe when the grouping keys
  bound the frame (the binned order-statistic entries: |domain| x
  n_buckets rows); the pinned contract test makes each such entry a
  reviewed, named exception rather than a silent pass.
- ``raw``: the window consumes corpus-scale rows partitioned ONLY by
  bounded-domain keys — the genuine scale-killer tier (one task holds
  ~1/|domain| of the corpus). Must be either fixed or documented as
  an sf-bounded exact diagnostic with a scale-safe sibling.
- ``opaque``: a partition key the regex cannot resolve to a plain
  column (a nested expression — contains "("). The headline lint
  fails closed on these; inventory-wide, many are LEGITIMATE
  (pmod()-salted windows, band-hash buckets: expressions that
  manufacture cardinality). Reported so a NEW opaque-key window is a
  visible, reviewed change.

A ``bounded`` finding = a window whose partition keys are ALL
low-cardinality plain columns; its tier then decides severity.
KNOWN_RAW is the reviewed exception list for the ``raw`` tier;
KNOWN_AGG_INPUT pins the reviewed ``agg_input`` entries.

Usage: python tools/audit_window_plans.py [sf_dir]
Exits 1 if any ``raw``-tier bounded-key window falls outside KNOWN_RAW.
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Reviewed ``raw``-tier exceptions: window sorts on a bounded key
# whose input the classifier reads as raw rows. Keyed by entry name ->
# offending partition key set; each hit REVIEWED with the reason it is
# tolerated (documented diagnostic, pre-bounded input, or a planned
# two-pass rewrite tracked in COVERAGE.md). The r8 audit's initial
# sweep found 15; anything new fails the contract test until reviewed
# here.
KNOWN_RAW: dict[str, set[str]] = {
    # Input is pre-filtered to a constant slice (l_orderkey < 100, ~25
    # orders at any sf) — a rank-family SEMANTICS demo over a bounded
    # frame, not a corpus sort; the classifier can't see through the
    # Filter.
    "window_rank_family": {"l_returnflag"},
    # Window over the RESAMPLE GRID (one row per (type, bucket), rows =
    # time-span / resolution), not over raw events — span-bounded, not
    # corpus-bounded; the LOCF carry across grid rows is the two-pass
    # candidate if spans ever outgrow a task.
    "events_resample_locf": {"event_type"},
    "events_resample_interpolate": {"event_type"},
}

# Reviewed ``agg_input`` entries: window over an Aggregate whose
# grouping bounds the frame. Reviewed once; pinned so new ones are
# visible.
KNOWN_AGG_INPUT: dict[str, set[str]] = {
    # Window over Aggregate[(key, bucket)]: |domain| x n_buckets rows.
    "agg_gini_binned": {"o_orderpriority"},
    "window_distribution_binned": {"o_orderpriority"},
    # The two-pass prefix-sum pattern itself: offsets window runs over
    # Aggregate[(lang, salt_bucket)] — 16 rows per lang.
    "sample_token_budget": {"lang"},
    # All five share _user_edges, rewritten r8 to the two-pass chunked
    # lead (operators/sequence.py): the only event_type-partitioned
    # window left is the boundary stitch over one aggregated row per
    # (type, hour chunk) — span-bounded, map-side combined.
    "graph_adamic_adar": {"event_type"},
    "graph_degree_distribution": {"event_type"},
    "graph_neighbor_jaccard": {"event_type"},
    "graph_pagerank_users": {"event_type"},
    "graph_triangle_count": {"event_type"},
    # r8 rewrites of the per-group sequential/order-statistic scans:
    # chunked prefix decomposition (cusum, weighted median) and
    # grouped_global_rank (equidepth + distribution-function ntile,
    # winsorize cutpoints, interarrival gap quantiles, gini rank
    # moment) — the only bounded-key windows left are prefix-offset
    # chains over one aggregated row per chunk / value bucket.
    "events_cusum_changepoints": {"event_type"},
    "events_equidepth_quantiles": {"event_type"},
    "events_interarrival_profile": {"event_type"},
    "events_value_winsorize": {"event_type"},
    "agg_gini_by_segment": {"o_orderpriority"},
    "agg_weighted_median": {"event_type"},
    "window_distribution_functions": {"o_orderpriority"},
}

LOW_CARD_MAX = 10
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def low_cardinality_columns(sf_dir: str) -> set[str]:
    """Column names whose distinct count is <= LOW_CARD_MAX, measured
    from the data with DuckDB (bounded categorical domains stay bounded
    at every sf; key/id/value domains grow past the threshold even at
    sf0.001)."""
    import duckdb

    con = duckdb.connect()
    low: set[str] = set()
    for t in TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        rel = con.sql(f"SELECT * FROM '{path}' LIMIT 0")
        for col, typ in zip(rel.columns, rel.types):
            if str(typ).startswith(("BLOB", "STRUCT", "LIST", "FLOAT[]")):
                continue
            n = con.sql(f'SELECT count(DISTINCT "{col}") FROM \'{path}\'').fetchone()[0]
            if n <= LOW_CARD_MAX:
                low.add(col)
    return low


def _node_depth(line: str) -> int:
    """Tree depth of a plan line = offset of the node name past the
    ``:  +- `` scaffolding toString() draws."""
    return len(line) - len(line.lstrip(" :+-"))


# Nodes that merely arrange rows for their parent (no row-count or
# grouping change): skip them when classifying a Window's input. They
# appear when a persisted frame embeds its PHYSICAL plan inside
# InMemoryRelation — there a Window's child is mechanically
# Sort <- Exchange <- <real input>.
_PASS_THROUGH = (
    "Sort ", "Sort[", "Exchange", "ShuffleQueryStage", "AQEShuffleRead",
    "InputAdapter", "WholeStageCodegen", "ColumnarToRow", "ReusedExchange",
    "Project", "Filter", "InMemoryRelation", "InMemoryTableScan",
    # a stacked Window preserves row count — the sort-input question is
    # about what ultimately feeds the stack (e.g. prefix-offset chains
    # compute O then P over the same per-chunk aggregate)
    "Window [",
)


def _strip_codegen(body: str) -> str:
    """Drop the ``*(3) `` whole-stage-codegen prefix physical nodes carry."""
    if body.startswith("*(") and ") " in body:
        return body.split(") ", 1)[1]
    return body


def _meaningful_child(lines: list[str], i: int) -> str:
    """The first non-pass-through descendant of the node at line i,
    following the first-child chain (a plan's first child prints on
    the next line, one depth deeper). Project/Filter are pass-through
    for THIS audit: they don't change row counts enough to matter for
    the sort-input question (a selective Filter CAN bound the input —
    window_rank_family — but that stays a human review call in
    KNOWN_RAW, not an automatic pass)."""
    depth = _node_depth(lines[i])
    for nxt in lines[i + 1 :]:
        if not nxt.strip():
            continue
        d = _node_depth(nxt)
        if d <= depth:
            return ""
        body = _strip_codegen(nxt.lstrip(" :+-"))
        # Filter is pass-through only while hunting the input; an
        # Aggregate/WindowGroupLimit behind filters still classifies.
        # (InMemoryRelation/InMemoryTableScan are in _PASS_THROUGH too:
        # the cached plan prints inside them, so we walk straight in.)
        if body.startswith(_PASS_THROUGH):
            depth = d
            continue
        return body
    return ""


def parse_windows(plan: str) -> list[dict]:
    """Window nodes from an optimized-plan string, each with its
    partition columns and the node type of its IMMEDIATE child (the
    window's input). Window's toString is
    ``Window [funcs], [partitionCols], [orderCols]`` — the funcs list
    nests windowspecdefinition(...) brackets, so the partition/order
    lists are taken from the right."""
    lines = plan.splitlines()
    out: list[dict] = []
    for i, line in enumerate(lines):
        body = line.lstrip(" :+-")
        if not body.startswith("Window ["):
            continue
        parts = body.rstrip("]").rsplit("], [", 2)
        part_cols: list[str] = []
        if len(parts) == 3 and parts[1].strip():
            part_cols = [a.split("#")[0] for a in parts[1].split(", ")]
        child = _meaningful_child(lines, i)
        if child.startswith("WindowGroupLimit"):
            tier = "groups_limited"
        elif child.startswith(
            ("Aggregate", "HashAggregate", "SortAggregate", "ObjectHashAggregate")
        ):
            tier = "agg_input"
        else:
            tier = "raw"
        out.append({"partition": part_cols, "tier": tier, "child": child[:60]})
    return out


def window_partition_findings(df, low_card: set[str]):
    """Per-tier findings for one DataFrame's optimized plan. A window
    counts as ``bounded`` only when it HAS a partition spec and every
    partition column is a known low-cardinality plain column (a single
    high-cardinality or manufactured key gives the shuffle real
    parallelism). Opaque expression keys are reported separately.
    Global windows (empty partition) are a different audit — the
    optimizer resolves the safe ones to TakeOrderedAndProject and the
    headline plan pins cover those."""
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    findings: dict[str, list[str]] = {"raw": [], "agg_input": [], "groups_limited": [], "opaque": []}
    for w in parse_windows(plan):
        cols = w["partition"]
        if not cols:
            continue
        opaque = [c for c in cols if "(" in c]
        if opaque:
            findings["opaque"].extend(opaque)
            continue
        if all(c in low_card for c in cols):
            findings[w["tier"]].extend(cols)
    return findings


def audit(spark, sf_dir: str):
    """Sweep every inventory entry. Returns (findings, errors):
    findings maps tier -> {entry name -> sorted unique key list}.
    Construction-only: each entry's DataFrame is built (lazy) and its
    optimized plan read — no execution beyond what an entry's own
    construction triggers (a few entries run bounded jobs to derive
    centroids/caches; sf0.001 keeps that cheap)."""
    from warpdb_spark import inventory

    q, _ = inventory.load_all()
    low_card = low_cardinality_columns(sf_dir)
    tiers = ("raw", "agg_input", "groups_limited", "opaque")
    findings: dict[str, dict[str, list[str]]] = {t: {} for t in tiers}
    errors: dict[str, str] = {}
    try:
        for name, fn in q.items():
            try:
                f = window_partition_findings(fn(spark, sf_dir), low_card)
            except Exception as e:  # noqa: BLE001 — report, don't abort the sweep
                errors[name] = f"{type(e).__name__}: {e}"[:200]
                continue
            for t in tiers:
                if f[t]:
                    findings[t][name] = sorted(set(f[t]))
    finally:
        spark.catalog.clearCache()
    return findings, errors


def main() -> int:
    from warpdb_spark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("audit-window-plans", shuffle_partitions=8)
    findings, errors = audit(spark, sf_dir)

    print(f"# audited inventory at {sf_dir}")
    for tier in ("raw", "agg_input", "groups_limited", "opaque"):
        hits = findings[tier]
        print(f"# {tier}: {len(hits)} entries")
        for name, cols in sorted(hits.items()):
            known = (
                "reviewed"
                if (tier == "raw" and name in KNOWN_RAW)
                or (tier == "agg_input" and name in KNOWN_AGG_INPUT)
                or tier in ("groups_limited", "opaque")
                else "NEW"
            )
            print(f"  [{known}] {name}: {cols}")
    if errors:
        print(f"# construction errors: {len(errors)}")
        for name, err in sorted(errors.items()):
            print(f"  [error] {name}: {err}")

    new_raw = {
        n: cols
        for n, cols in findings["raw"].items()
        if n not in KNOWN_RAW or not set(cols) <= KNOWN_RAW[n]
    }
    if new_raw:
        print(f"FAIL: raw-tier bounded-key window sorts outside KNOWN_RAW: {new_raw}")
        return 1
    fixed = sorted(set(KNOWN_RAW) - set(findings["raw"]))
    if fixed:
        print(f"NOTE: KNOWN_RAW entries no longer raw (fixed? prune the list): {fixed}")
    print("OK: no undocumented raw-tier bounded-key window sorts in the inventory")
    return 0


if __name__ == "__main__":
    sys.exit(main())
