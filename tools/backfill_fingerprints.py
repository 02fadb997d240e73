"""One-shot r11 backfill after the fingerprint-metric fix.

The r11 walk fix (warpdb_spark/inventory/fingerprint.py::_referenced)
made function-LOCAL ``from warpdb_spark.x import y`` imports visible to
the changed-since-green tier — previously entries using that pattern
(the analytics_ext similarity family, among others) never floated when
their operators changed. Fixing the metric changes EVERY fingerprint
value, which would spuriously float all ~290 entries at once and drown
the driver window.

This backfill re-records each green entry's fingerprint under the NEW
metric, with one guard so genuinely-stale evidence stays flagged: an
entry is blessed (record rewritten to the new-metric value) ONLY when
its new-metric fingerprint is IDENTICAL computed on the current tree
and on the r10 closing tree (a worktree at the base commit with the
fixed fingerprint module copied in — /tmp/r10base_newmetric.json) —
i.e. nothing in its now-fully-visible closure changed since the last
driver window. Everything else (the old-metric changed tier plus the
blind-spot entries whose operators were edited this round without the
old metric noticing, e.g. the PQ/IVFPQ family after the r11 refactor)
keeps its old record and stays floated for driver re-check.

Usage:
  python tools/backfill_fingerprints.py <base-newmetric.json> [--write]
  python tools/backfill_fingerprints.py --derive-base <commit> --out <path>

The second form derives the base snapshot REPRODUCIBLY (r11 advice: the
original run used an ad-hoc uncommitted /tmp artifact): it creates a
temporary git worktree at <commit>, copies the CURRENT fingerprint
metric module into it, computes every entry's new-metric fingerprint in
a subprocess bound to that tree, and writes them (plus a ``__meta__``
record carrying the base commit) to <path>. The r11 backfill's base is
committed at tools/data/r10base_newmetric.json, derived from ed65656
(the r10 closing tree) — re-derive with this flag to audit it.
"""

from __future__ import annotations

import importlib
import os
import re
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def module_file(mod_name: str) -> str | None:
    try:
        mod = importlib.import_module(mod_name)
    except ImportError:
        return None
    f = getattr(mod, "__file__", None)
    return os.path.relpath(f, REPO) if f else None


def derive_base(commit: str, out_path: str) -> int:
    """Compute the new-metric fingerprints of the inventory AS OF
    ``commit``, reproducibly: temp worktree + current metric module +
    subprocess. The snapshot carries its provenance in ``__meta__``."""
    import json
    import shutil
    import tempfile

    wt = tempfile.mkdtemp(prefix="fpbase_")
    subprocess.run(
        ["git", "worktree", "add", "--detach", wt, commit],
        cwd=REPO, check=True, capture_output=True,
    )
    try:
        # the CURRENT metric, evaluated against the base tree's sources
        shutil.copy(
            os.path.join(REPO, "warpdb_spark", "inventory", "fingerprint.py"),
            os.path.join(wt, "warpdb_spark", "inventory", "fingerprint.py"),
        )
        script = (
            "import json, sys\n"
            "from warpdb_spark import inventory\n"
            "from warpdb_spark.inventory import fingerprint as FP\n"
            "q, o = inventory.load_all()\n"
            "print(json.dumps({n: FP.entry_fingerprint(f, o.get(n))"
            " for n, f in q.items()}))\n"
        )
        env = dict(os.environ, PYTHONPATH=wt)
        res = subprocess.run(
            [sys.executable, "-c", script], cwd=wt, env=env,
            capture_output=True, text=True, check=True,
        )
        fps = json.loads(res.stdout.strip().splitlines()[-1])
    finally:
        subprocess.run(
            ["git", "worktree", "remove", "--force", wt],
            cwd=REPO, capture_output=True,
        )
    fps["__meta__"] = {
        "base_commit": commit,
        "derived_by": "tools/backfill_fingerprints.py --derive-base",
    }
    with open(out_path, "w") as f:
        json.dump(fps, f, indent=1, sort_keys=True)
    print(f"{out_path}: {len(fps) - 1} fingerprints at {commit}")
    return 0


def main() -> int:
    import json

    if "--derive-base" in sys.argv:
        commit = sys.argv[sys.argv.index("--derive-base") + 1]
        out = sys.argv[sys.argv.index("--out") + 1]
        return derive_base(commit, out)

    base_fps = json.load(open(sys.argv[1]))
    base_fps.pop("__meta__", None)
    write = "--write" in sys.argv

    from warpdb_spark import inventory
    from warpdb_spark.inventory import fingerprint as FP
    from warpdb_spark.inventory import fingerprints

    q, o = inventory.load_all()

    kept_changed, kept_blind, blessed = [], [], []
    new_records: dict[str, str] = {}
    for name, rec in sorted(fingerprints.GREEN_FINGERPRINTS.items()):
        fn = q.get(name)
        if fn is None:
            continue
        new_fp = FP.entry_fingerprint(fn, o.get(name))
        if new_fp == rec:
            continue  # metric change didn't touch this entry's closure
        if name in OLD_CHANGED:
            kept_changed.append(name)  # stale under BOTH metrics
        elif new_fp != base_fps.get(name):
            kept_blind.append(name)  # closure changed since base: float
        else:
            blessed.append(name)
            new_records[name] = new_fp

    print(f"old-metric changed (stay floated): {len(kept_changed)}")
    print(f"blind-spot floated (closure changed since base): {len(kept_blind)}")
    for n in kept_blind:
        print(f"  {n}")
    print(f"blessed (record rewritten to new metric): {len(blessed)}")

    if write and new_records:
        path = os.path.join(REPO, "warpdb_spark", "inventory", "fingerprints.py")
        src = open(path).read()
        for name, fp in new_records.items():
            src, n = re.subn(
                rf'("{re.escape(name)}": )"[0-9a-f]{{16}}"', rf'\1"{fp}"', src
            )
            if n != 1:
                print(f"WARN: {name} record not rewritten ({n} matches)")
        open(path, "w").write(src)
        print(f"fingerprints.py: {len(new_records)} records rewritten")
    return 0


# Names changed under the OLD metric on this tree (computed before the
# walk fix; frozen here so the backfill is reproducible).
OLD_CHANGED = set("""
agg_distinct dedup_cluster_components dedup_cross_modal_planted
dedup_cross_modal_verdict dedup_keeper_by_quality dedup_minhash_lsh
dedup_minhash_survivors dialect_agg_filter dialect_ansi_fetch_bool
dialect_array_agg dialect_broadcast_hint dialect_cte_scalar_in
dialect_derived_table_q18 dialect_distinct_on dialect_event_time
dialect_exists_theta dialect_explain dialect_expression_projection
dialect_group_by_all dialect_groupby_having dialect_ilike
dialect_json_arrow dialect_offset_limit dialect_pivot
dialect_predicates dialect_qualify_pivot dialect_range_interval_frame
dialect_recursive_cte dialect_select_star dialect_self_join
dialect_setops dialect_star_modifiers dialect_string_agg
dialect_tpch_q1 dialect_tpch_q12 dialect_tpch_q3 dialect_tpch_q6
dialect_try_cast dialect_udtf_ngrams dialect_udtf_sentences
dialect_unnest dialect_unpivot dialect_unpivot_multi
dialect_values_table dialect_with_ties events_resample_interpolate
events_resample_locf expr_math_functions flagship_filter_project
graph_label_propagation join_inner_rowlevel table_zorder_layout
window_ignore_nulls window_qualify window_rank_family
window_running_sum
""".split())


if __name__ == "__main__":
    sys.exit(main())
