"""Scale-safe sequential scans over grouped, ordered data.

The naive Spark spelling of "next/previous row within a group" —
``F.lead(x).over(Window.partitionBy(group).orderBy(order))`` — is a
per-group SORT: every row of a group lands in ONE task. When the group
key is a bounded categorical domain (event_type: 5 values at every
scale factor), one task holds ~1/|domain| of the corpus at 100 TB.
The r8 inventory-wide plan audit (tools/audit_window_plans.py) found
this exact shape under five graph entries and several events
time-series entries.

This module re-expresses those scans with the two-pass chunk
decomposition (the pattern ``sample_token_budget`` pioneered for
prefix sums): CHUNK the group's order domain (e.g. hour buckets of a
timestamp), do the sequential work inside (group, chunk) partitions —
cardinality |domain| x n_chunks grows WITH the data, so the shuffle
has real parallelism — then stitch chunk boundaries with a second,
tiny pass over ONE AGGREGATED ROW PER (group, chunk). The
boundary-pass window is partitioned by the bare group key, but its
input is the per-chunk aggregate (span-bounded, map-side combined),
not corpus rows — the safe ``agg_input`` tier in the audit's terms.

Reference tie-in: the reference engine has no window executor at all
(include/expression.hpp:112-121 parses OVER and leaves execution
unimplemented); these operators are part of the executing superset,
designed for the multi-executor layout the reference's multi-GPU range
partitioning (src/multi_gpu_utils.cpp:23-60) only sketches.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def grouped_lead_pairs(
    df: DataFrame,
    group_col: str,
    order_cols: list[str],
    value_col: str,
    chunk_expr: Column,
) -> DataFrame:
    """(group, src, dst) pairs where ``dst`` is ``value_col`` of the
    NEXT row in ``order_cols`` order within ``group_col`` — equivalent
    to ``lead(value) OVER (PARTITION BY group ORDER BY order)`` pairs
    with every NULL-dst pair dropped: the final row of each group AND
    any pair whose successor row has a NULL ``value_col`` (the
    interior filter cannot tell "no next row" from "next row's value
    is NULL"). Callers needing NULL values to survive as dst should
    pass a row marker (e.g. a non-null struct of the value) instead of
    the raw value.

    ``chunk_expr`` must be a deterministic, order-monotone function of
    the leading order column(s) (rows that compare earlier get a <=
    chunk id; e.g. an hour bucket of the timestamp the order starts
    with). Two passes:

    1. interior: lead within (group, chunk) — the only corpus-scale
       window, partitioned by a key whose cardinality grows with the
       data span.
    2. boundary: one aggregated row per (group, chunk) carrying the
       chunk's first/last value under the full order (min_by/max_by on
       the order-struct — partial-aggregates map-side); a lead over
       (group ORDER BY chunk) on that small frame links each chunk's
       last row to the NEXT NON-EMPTY chunk's first row.

    Union(interior-without-chunk-tails, boundaries) is exactly the
    global consecutive-pair set: a group's global order is the
    concatenation of its chunk-local orders.
    """
    _assert_no_reserved(df, ("__chunk", "src", "dst", "__v"))
    # The group column keeps its real name so plan audits see the true
    # partition key (an alias would launder a bounded-domain key past
    # name-based lints); internal columns are __-prefixed. The window
    # orders by the PLAIN columns — packing them into a struct order
    # key costs 2.6x in the sort (20M-row replay: 12.7s vs 4.9s;
    # struct comparators don't codegen as tightly as column
    # lexicographic sort). The struct appears only inside
    # min_by/max_by, where an ordering VALUE must be a single
    # expression.
    b = df.select(
        F.col(group_col),
        chunk_expr.alias("__chunk"),
        *[F.col(c) for c in order_cols],
        F.col(value_col).alias("__v"),
    )
    w_in = Window.partitionBy(group_col, "__chunk").orderBy(*order_cols)
    interior = b.select(
        group_col,
        F.col("__v").alias("src"),
        F.lead("__v").over(w_in).alias("dst"),
    ).where(F.col("dst").isNotNull())
    ordkey = F.struct(*[F.col(c) for c in order_cols])
    bounds = b.groupBy(group_col, "__chunk").agg(
        F.min_by("__v", ordkey).alias("__first"),
        F.max_by("__v", ordkey).alias("__last"),
    )
    w_b = Window.partitionBy(group_col).orderBy("__chunk")
    boundary = bounds.select(
        group_col,
        F.col("__last").alias("src"),
        F.lead("__first").over(w_b).alias("dst"),
    ).where(F.col("dst").isNotNull())
    return interior.unionByName(boundary)


def _assert_no_reserved(df: DataFrame, names: tuple[str, ...]) -> None:
    """Fail fast if the input already carries one of the internal
    column names a primitive is about to inject — silent corruption
    otherwise (schema-only check, no job)."""
    clash = [c for c in df.columns if c in names]
    if clash:
        raise ValueError(
            f"input columns collide with reserved internal names {clash}; "
            "rename them before calling the sequence primitives"
        )


def hour_chunk(ts_col: str | Column) -> Column:
    """Hour bucket of a timestamp — the default chunk for event-time
    sequences (order-monotone in ts). At 100 TB the chunk width is the
    parallelism knob: width x per-group event rate = rows per task.

    Hot chunks: a burst that lands most of one group in one hour
    re-creates the hot-task problem INSIDE the primitive that exists
    to prevent it. ``chunk_skew_stats`` measures it (one
    map-side-combined aggregate); the fix is a finer chunk (minutes:
    ``/ 60``) — and when the burst is a run of IDENTICAL leading
    order values, no function of that value alone can split it: the
    chunk must then extend to the tiebreaker column, which is legal
    whenever the chunk stays monotone under the FULL lexicographic
    order (e.g. ``hour * 2^20 + floor(id / W)`` only where ts is
    constant — see tools/replay_chunk_skew.py for a worked burst)."""
    col = F.col(ts_col) if isinstance(ts_col, str) else ts_col
    return (F.unix_timestamp(col) / 3600).cast("long")


def chunk_skew_stats(
    df: DataFrame,
    group_col: str,
    chunk_expr: Column,
    advisory_rows: int = 5_000_000,
) -> DataFrame:
    """Per-group chunk-skew diagnostic for a planned chunked scan:
    (group, n_chunks, total_rows, max_chunk_rows, hot_share,
    hot_chunk_advisory). One map-side-combined aggregate over (group,
    chunk) then a tiny per-group rollup — run it once per new (data,
    chunk) pairing, not inline per query. ``hot_chunk_advisory`` fires
    when any single (group, chunk) exceeds ``advisory_rows`` rows
    (default sized to a comfortable single-task sort at ~100 bytes/row
    ≈ 500 MB): the chunk width is too coarse for this data's burst
    structure — narrow it or extend it to the tiebreaker."""
    per = df.groupBy(
        F.col(group_col).alias("group"), chunk_expr.alias("chunk")
    ).agg(F.count(F.lit(1)).alias("rows"))
    return per.groupBy("group").agg(
        F.count(F.lit(1)).alias("n_chunks"),
        F.sum("rows").alias("total_rows"),
        F.max("rows").alias("max_chunk_rows"),
        F.round(F.max("rows") / F.sum("rows"), 6).alias("hot_share"),
        (F.max("rows") > advisory_rows).alias("hot_chunk_advisory"),
    )


def grouped_lag(
    df: DataFrame,
    group_col: str,
    order_cols: list[str],
    value_col: str,
    chunk_expr: Column,
    out_col: str = "__prev",
) -> DataFrame:
    """Append ``lag(value) OVER (PARTITION BY group ORDER BY order)``
    — each row's PREVIOUS row's value — without the per-group corpus
    sort, and without the row-volume rank self-join the first
    sessionize spelling paid (measured 2x the naive cost at 20M rows;
    this spelling replaces it). Two passes:

    1. local: lag within (group, chunk) — fills every row except each
       chunk's first.
    2. boundary: one aggregated row per (group, chunk) carrying the
       chunk's last value under the full order (max_by, map-side
       combined); a lag over (group ORDER BY chunk) on that small
       frame gives each chunk the PREVIOUS NON-EMPTY chunk's last
       value, broadcast-joined back and taken where the local lag is
       NULL.

    NULL caveat (same contract as grouped_lead_pairs): a NULL
    ``value_col`` is indistinguishable from "no previous row" — both
    surface as NULL ``out_col``. Pass a non-null marker (struct) if
    the distinction matters. ``chunk_expr`` rules are
    grouped_global_rank's (order-monotone, equal leading values share
    a chunk; NULL chunks legal via the null-safe stitch join)."""
    _assert_no_reserved(
        df, ("__chunk", "__g2", "__c2", "__pl", "__last", out_col)
    )
    b = df.withColumn("__chunk", chunk_expr)
    w_loc = Window.partitionBy(group_col, "__chunk").orderBy(*order_cols)
    local = b.withColumn(out_col, F.lag(value_col).over(w_loc))
    ordkey = F.struct(*[F.col(c) for c in order_cols])
    bounds = b.groupBy(group_col, "__chunk").agg(
        F.max_by(value_col, ordkey).alias("__last")
    )
    w_b = Window.partitionBy(group_col).orderBy("__chunk")
    prevlast = bounds.select(
        F.col(group_col).alias("__g2"),
        F.col("__chunk").alias("__c2"),
        F.lag("__last").over(w_b).alias("__pl"),
    )
    return (
        local.join(
            prevlast,
            F.col(group_col).eqNullSafe(F.col("__g2"))
            & F.col("__chunk").eqNullSafe(F.col("__c2")),
        )
        .withColumn(out_col, F.coalesce(F.col(out_col), F.col("__pl")))
        .drop("__chunk", "__g2", "__c2", "__pl")
    )


def refine_hot_chunks(
    df: DataFrame,
    group_col: str,
    base_chunk: Column,
    fine_chunk: Column,
    tiebreak_col: str,
    advisory_rows: int = 5_000_000,
    width: int = 65_536,
) -> DataFrame:
    """Auto-split hot chunks: returns ``df`` plus a ``__rchunk`` struct
    column usable as the primitives' ``chunk_expr``. One aggregate pass
    counts rows per (group, base chunk); pairs above ``advisory_rows``
    get their chunk EXTENDED by (fine_chunk, floor(tiebreak / width))
    — a burst of identical leading values splits into ~rows/width
    sub-chunks — while quiet pairs keep (base, 0, 0), so the offsets
    frame stays ~n_base_chunks instead of exploding to the fine
    resolution everywhere (a global fine chunk costs a corpus-sized
    offsets frame; measured 3x slower at 20M rows in
    tools/replay_chunk_skew.py).

    Legality (the chunk must partition the full (order, tiebreak)
    lexicographic order): ``base_chunk`` monotone in the leading order
    column; ``fine_chunk`` monotone within equal base values AND fine
    enough that rows sharing (base, fine) are ordered by
    ``tiebreak_col`` ALONE — i.e. fine_chunk must separate every
    distinct leading-order value, not merely refine the base (r9
    review: a TRUNCATION like unix seconds over sub-second timestamps
    satisfies "monotone within base" yet leaves two distinct ts in one
    fine chunk, where the id-bucket field can order them against the
    real (ts, id) order and silently corrupt the stitch — for
    timestamp orders pass the exact value, e.g.
    ``F.col("ts").cast("double")`` or microsecond epoch); and
    ``tiebreak_col`` the unique final order column. Two same-group
    rows with equal base chunk are both hot or both cold (the flag is
    per (group, base)), so the struct compares consistently; the hot
    set rides a broadcast join (it is at most
    |flagged pairs| rows — if THAT outgrows broadcast, the data has
    more hot chunks than tasks and the advisory threshold is wrong).

    The split is within-partition only — callers' window ORDER stays
    (order_cols); results are bit-identical to any other legal chunk
    (integer stitches reassociate exactly)."""
    _assert_no_reserved(df, ("__rchunk", "__bc", "__hot"))
    b = df.withColumn("__bc", base_chunk)
    hot = (
        b.groupBy(group_col, "__bc")
        .agg(F.count(F.lit(1)).alias("__rows"))
        .filter(F.col("__rows") > advisory_rows)
        .select(group_col, "__bc", F.lit(True).alias("__hot"))
    )
    out = b.join(F.broadcast(hot), [group_col, "__bc"], "left")
    zero = F.lit(0).cast("long")
    is_hot = F.col("__hot").isNotNull()
    # the fine field keeps ITS OWN type — casting to long here would
    # re-introduce the truncation trap the legality note warns about
    # (an exact double timestamp silently floored back to seconds; r9
    # review + regression test). Cold rows take NULL, which compares
    # equal across the whole cold chunk in the struct ordering.
    return out.withColumn(
        "__rchunk",
        F.struct(
            F.col("__bc").alias("b"),
            F.when(is_hot, fine_chunk).alias("f"),
            F.when(is_hot, F.floor(F.col(tiebreak_col) / width)).otherwise(zero).alias("t"),
        ),
    ).drop("__bc", "__hot")


def grouped_global_rank(
    df: DataFrame,
    group_col: str,
    order_cols: list,
    chunk_expr: Column,
    rank_col: str = "__rank",
    n_col: str = "__n",
    max_chunk_rows_col: str | None = None,
) -> DataFrame:
    """Append each row's group-wide 1-based ``row_number`` under
    ``order_cols`` plus the group size — WITHOUT the corpus-scale
    per-group sort of ``row_number() OVER (PARTITION BY group ORDER BY
    order)``. This is the primitive behind exact rank-selected
    quantiles (winsorize cutpoints, interarrival p50/p90) and exact
    ntile assignment on bounded group keys.

    Two independent passes over the input (neither consumes the
    other's window output, so nothing recomputes):

    1. local: ``row_number`` within (group, chunk) — parallel in the
       chunk count.
    2. offsets: plain counts per (group, chunk) — map-side combined —
       then a prefix sum over ONE ROW PER CHUNK (window partitioned by
       the group key over an Aggregate: the safe ``agg_input`` tier).

    global rank = local row_number + count of rows in earlier chunks.

    ``chunk_expr`` must be order-monotone in the LEADING order column
    and map equal leading values to the same chunk (a floor/bucket of
    the value satisfies both); ranks among order-ties are then
    assigned arbitrarily WITHIN a chunk, which is exact for
    value-at-rank selection (equal values are interchangeable) — pass
    a full unique order and a finer chunk if tie order itself matters.

    The offsets frame has (groups x chunks) rows; the join back is on
    (group, chunk), which AQE resolves to a broadcast join at any
    realistic chunk count. The join is NULL-SAFE on both keys: a NULL
    chunk (e.g. floor() of a NULL value) is a legal chunk that sorts
    first in the offsets walk — matching Spark's default NULLS FIRST
    for a plain-asc leading order column — rather than a row silently
    dropped by a null-rejecting equi-join; callers ordering
    asc_nulls_last must map NULL to a +inf chunk themselves (the
    winsorize/weighted-median pattern). Pass ``n_col=None`` to skip
    the group-total column (and its window) when the caller doesn't
    need it."""
    return _chunked_scan(
        df, group_col, order_cols, chunk_expr,
        loc_fn=lambda b, w_loc: F.row_number().over(w_loc),
        agg_fn=lambda: F.count(F.lit(1)),
        out_col=rank_col, tot_col=n_col, running=False,
        max_rows_col=max_chunk_rows_col,
    )


def _chunked_scan(df, group_col, order_cols, chunk_expr, loc_fn, agg_fn,
                  out_col, tot_col, running, max_rows_col=None):
    """Shared two-pass engine for grouped_global_rank /
    grouped_prefix_sum: local window value per (group, chunk) +
    exclusive per-chunk-aggregate prefix offsets, stitched with a
    null-safe join so no chunk value — NULL included — can drop rows.
    ``max_rows_col`` (optional) appends the group's max rows-per-chunk
    — the hot-chunk skew signal — riding the aggregate the offsets
    pass already computes (no extra job)."""
    _assert_no_reserved(
        df, ("__chunk", "__loc", "__off", "__g2", "__c2", "__t", "__rows",
             *(c for c in (out_col, tot_col, max_rows_col) if c)),
    )
    b = df.withColumn("__chunk", chunk_expr)
    w_loc = Window.partitionBy(group_col, "__chunk").orderBy(*order_cols)
    if running:
        w_loc = w_loc.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    local = b.withColumn("__loc", loc_fn(b, w_loc))
    aggs = [agg_fn().alias("__t")]
    if max_rows_col is not None:
        aggs.append(F.count(F.lit(1)).alias("__rows"))
    totals = b.groupBy(group_col, "__chunk").agg(*aggs)
    w_off = (
        Window.partitionBy(group_col)
        .orderBy("__chunk")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    off_cols = [
        F.col(group_col).alias("__g2"),
        F.col("__chunk").alias("__c2"),
        F.coalesce(F.sum("__t").over(w_off), F.lit(0)).alias("__off"),
    ]
    if tot_col is not None:
        off_cols.append(F.sum("__t").over(Window.partitionBy(group_col)).alias(tot_col))
    if max_rows_col is not None:
        off_cols.append(
            F.max("__rows").over(Window.partitionBy(group_col)).alias(max_rows_col)
        )
    offs = totals.select(*off_cols)
    return (
        local.join(
            offs,
            F.col(group_col).eqNullSafe(F.col("__g2"))
            & F.col("__chunk").eqNullSafe(F.col("__c2")),
        )
        .withColumn(out_col, F.col("__loc") + F.col("__off"))
        .drop("__loc", "__off", "__chunk", "__g2", "__c2")
    )


def grouped_carry(
    df: DataFrame,
    group_col: str,
    order_cols: list,
    value: Column | str,
    chunk_expr: Column,
    out_col: str = "__carry",
    backward: bool = False,
    broadcast_offsets: bool = False,
) -> DataFrame:
    """Append the last non-null ``value`` at-or-before each row in
    ``order_cols`` order within ``group_col`` — LOCF (last observation
    carried forward), or NOCB (next observation carried backward) with
    ``backward=True`` — WITHOUT the corpus-scale per-group sort of
    ``last(value, ignorenulls) OVER (PARTITION BY group ORDER BY ...
    ROWS UNBOUNDED PRECEDING)``. Same two-pass chunk decomposition as
    grouped_global_rank (r11, retiring the last two KNOWN_RAW audit
    exceptions — events_resample_locf/_interpolate):

    1. local: carry within (group, chunk) — parallel in the chunk
       count, the only pass that touches every row.
    2. boundary: ONE aggregated row per (group, chunk) holding the
       chunk's last (first, if backward) observation — picked by
       ``max_by``/``min_by`` over the leading order column, observed
       rows only — then the carry-in per chunk via the same
       ignorenulls scan over prior (following) chunks: the safe
       ``agg_input`` tier, |groups| x |chunks| rows.

    Row value = COALESCE(local carry, chunk carry-in). ``value`` may
    be any column/expression (a struct carries (order, value) pairs —
    the interpolation pattern); NULL marks "no observation".
    ``chunk_expr`` must be order-monotone in the LEADING order column
    and map equal leading values to the same chunk; the carry pick
    among order-TIES within a chunk is arbitrary (pass a unique
    leading order when tie identity matters — a resample grid key is
    unique by construction). NULL-chunk join semantics are
    grouped_global_rank's (null-safe join; NULL chunk sorts first).
    ``broadcast_offsets=True`` forces the carry-in frame (one row per
    (group, chunk)) to broadcast — right when the caller KNOWS the
    chunk count is span-bounded (resample grids); leave False when
    chunks scale with the corpus and AQE should decide."""
    v = F.col(value) if isinstance(value, str) else value
    _assert_no_reserved(
        df, ("__chunk", "__loc", "__t", "__g2", "__c2", "__in", "__v", out_col)
    )
    b = df.withColumn("__chunk", chunk_expr).withColumn("__v", v)
    lead_ord = order_cols[0]
    w_loc = Window.partitionBy(group_col, "__chunk").orderBy(*order_cols)
    if backward:
        local = b.withColumn(
            "__loc",
            F.first("__v", ignorenulls=True).over(
                w_loc.rowsBetween(Window.currentRow, Window.unboundedFollowing)
            ),
        )
        pick = F.min_by("__v", F.when(F.col("__v").isNotNull(), F.col(lead_ord)))
        w_in = (
            Window.partitionBy(group_col)
            .orderBy("__chunk")
            .rowsBetween(1, Window.unboundedFollowing)
        )
        carry_in = F.first("__t", ignorenulls=True).over(w_in)
    else:
        local = b.withColumn(
            "__loc",
            F.last("__v", ignorenulls=True).over(
                w_loc.rowsBetween(Window.unboundedPreceding, Window.currentRow)
            ),
        )
        pick = F.max_by("__v", F.when(F.col("__v").isNotNull(), F.col(lead_ord)))
        w_in = (
            Window.partitionBy(group_col)
            .orderBy("__chunk")
            .rowsBetween(Window.unboundedPreceding, -1)
        )
        carry_in = F.last("__t", ignorenulls=True).over(w_in)
    offs = (
        b.groupBy(group_col, "__chunk")
        .agg(pick.alias("__t"))
        .select(
            F.col(group_col).alias("__g2"),
            F.col("__chunk").alias("__c2"),
            carry_in.alias("__in"),
        )
    )
    if broadcast_offsets:
        offs = F.broadcast(offs)
    return (
        local.join(
            offs,
            F.col(group_col).eqNullSafe(F.col("__g2"))
            & F.col("__chunk").eqNullSafe(F.col("__c2")),
        )
        .withColumn(out_col, F.coalesce(F.col("__loc"), F.col("__in")))
        .drop("__loc", "__chunk", "__g2", "__c2", "__in", "__v")
    )


def grouped_prefix_sum(
    df: DataFrame,
    group_col: str,
    order_cols: list,
    chunk_expr: Column,
    sum_col: str,
    prefix_col: str = "__cum",
    total_col: str = "__tot",
    max_chunk_rows_col: str | None = None,
) -> DataFrame:
    """Append each row's group-wide INCLUSIVE running sum of
    ``sum_col`` under ``order_cols`` plus the group total — the
    weighted generalization of ``grouped_global_rank`` (a rank is the
    prefix sum of weight 1). Same two independent passes: a local
    running sum within (group, chunk), and per-chunk PLAIN totals
    (map-side combined — unlike a running min, a chunk total needs no
    window output, so nothing recomputes) whose exclusive prefix over
    one row per chunk gives the offset. Exactness: the caller picks an
    integer/decimal ``sum_col`` when cross-engine hash equality
    matters (float prefix sums are association-sensitive). NULL-chunk
    and ``total_col=None`` semantics are grouped_global_rank's;
    ``max_chunk_rows_col`` exposes the group's hot-chunk row count
    (see chunk_skew_stats) at no extra job."""
    return _chunked_scan(
        df, group_col, order_cols, chunk_expr,
        loc_fn=lambda b, w_loc: F.sum(sum_col).over(w_loc),
        agg_fn=lambda: F.sum(sum_col),
        out_col=prefix_col, tot_col=total_col, running=True,
        max_rows_col=max_chunk_rows_col,
    )
