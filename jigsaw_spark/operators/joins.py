"""Join-shaped operators.

Reference semantics (SURVEY §2.3):
  - J1 file-convention equi-join: image ⋈ mask ⋈ labels ⋈ meta on image_id
    (jigsaw/model_utils/base/mask.py:83-101, jigsaw/data_interface.py:68-112)
  - J2 left-semi join: keep files whose id ∈ selected ids
    (jigsaw/model_utils/filters.py:258-262; io_utils.py:278-355)
  - J3 union-distinct "join_sets": concat + dedupe by image_id keep-first
    (jigsaw/model_utils/filters.py:115-144)
  - J4 broadcast dimension join: label→int registry applied at export
    (jigsaw/model_utils/types.py:24-26)

Scale: the construct join shuffles both fact sides on the key unless one is
broadcast-able; dims are hinted broadcast. Semi/anti joins against a small
id set broadcast automatically under AQE.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def semi_join(df: DataFrame, keys: DataFrame, on: list[str] | str) -> DataFrame:
    """EXISTS — J2. Catalyst broadcasts ``keys`` when small."""
    return df.join(keys, on=on, how="left_semi")


def anti_join(df: DataFrame, keys: DataFrame, on: list[str] | str) -> DataFrame:
    """NOT EXISTS — the skip-existing incremental pattern (F8,
    io_utils.py:89,150): new = incoming anti-join already-ingested."""
    return df.join(keys, on=on, how="left_anti")


def union_distinct(dfs: list[DataFrame], key_cols: list[str]) -> DataFrame:
    """J3: union by name (missing columns null-filled) then dedupe on the
    key. The reference keeps the *first* occurrence; rows for the same key
    are identical in its corpus, so keep-any is equivalent — documented
    deviation (SURVEY §2.3 J3)."""
    if not dfs:
        raise ValueError("union_distinct of zero DataFrames")
    unioned = reduce(
        lambda a, b: a.unionByName(b, allowMissingColumns=True), dfs
    )
    return unioned.dropDuplicates(key_cols)


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    ts: str = "ts",
    right_prefix: str = "r_",
    direction: str = "backward",
    tolerance_us: int | None = None,
) -> DataFrame:
    """As-of join: attach to every left row its nearest right row in the
    same ``on`` group (left outer — unmatched rows keep NULL right
    columns). ``direction="backward"`` (default) matches the LATEST right
    row with ``right.ts <= left.ts``; ``"forward"`` the EARLIEST with
    ``right.ts >= left.ts`` (both inclusive — pandas merge_asof
    semantics). ``tolerance_us`` nulls out matches farther than that many
    microseconds of event time (the merge_asof ``tolerance`` contract:
    the row survives, the match does not).

    Spark lacks a native as-of join; the scalable formulation is the
    union-tag trick: merge both sides into one stream, sort within each
    group by (ts, side) with right rows sorted toward the match direction
    at equal ts, and carry the nearest non-null right payload across with
    a running window (last/preceding for backward, first/following for
    forward). ONE shuffle on the group key and a partition-local sort —
    the same cost profile as a sort-merge join, with no range-explosion or
    per-row probing. This is how as-of joins are done at 100 TB; a
    right-side broadcast variant only helps when the right side is a
    dimension. Tolerance is a post-window projection — no extra pass.

    ``right`` must be unique per (on, ts) — pre-aggregate if not, or the
    matched payload is pick-any among ties."""
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    on = list(on)
    payload_cols = [c for c in right.columns if c not in {*on, ts}]
    # matched right ts rides inside the payload struct: exposed as
    # <prefix><ts> and needed for the tolerance gate
    r_payload = F.struct(F.col(ts).alias("_rts"), *payload_cols)
    left_cols = [c for c in left.columns if c not in {*on, ts}]
    l_payload = F.struct(*left_cols)

    # union with properly typed null payloads on each side; at equal ts the
    # right row must fall INSIDE the left row's window frame, so right
    # sorts first for backward ([-inf, current]) and last for forward
    # ([current, +inf])
    r_side, l_side = (0, 1) if direction == "backward" else (1, 0)
    r = right.select(
        *on,
        F.col(ts).alias("_ats"),
        F.lit(r_side).alias("_side"),
        r_payload.alias("_rp"),
        F.lit(None).cast(left.select(l_payload.alias("x")).schema["x"].dataType).alias("_lp"),
    )
    l = left.select(
        *on,
        F.col(ts).alias("_ats"),
        F.lit(l_side).alias("_side"),
        F.lit(None).cast(right.select(r_payload.alias("x")).schema["x"].dataType).alias("_rp"),
        l_payload.alias("_lp"),
    )
    base = Window.partitionBy(*on).orderBy("_ats", "_side")
    if direction == "backward":
        w = base.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        nearest = F.last("_rp", ignorenulls=True).over(w)
    else:
        w = base.rowsBetween(Window.currentRow, Window.unboundedFollowing)
        nearest = F.first("_rp", ignorenulls=True).over(w)
    merged = l.unionByName(r).withColumn("_match", nearest)
    if tolerance_us is not None:
        gap = F.abs(
            F.unix_micros(F.col("_ats")) - F.unix_micros(F.col("_match._rts"))
        )
        merged = merged.withColumn(
            "_match", F.when(gap <= F.lit(tolerance_us), F.col("_match"))
        )
    matched_ts = f"{right_prefix}{ts}"
    out = merged.filter(F.col("_side") == F.lit(l_side)).select(
        *on,
        F.col("_ats").alias(ts),
        *[F.col(f"_lp.{c}").alias(c) for c in left_cols],
        # matched right ts — omitted when an empty prefix would shadow the
        # left ts column (back-compat with prefix="" callers)
        *([F.col("_match._rts").alias(matched_ts)] if matched_ts != ts else []),
        *[F.col(f"_match.{c}").alias(f"{right_prefix}{c}") for c in payload_cols],
    )
    return out


def range_join(
    left: DataFrame,
    right: DataFrame,
    point_col: str,
    lo_col: str,
    hi_col: str,
    how: str = "inner",
    broadcast_right: bool = True,
) -> DataFrame:
    """Interval join: left rows matched to right rows whose
    ``[lo, hi)`` contains ``point_col``. With a small right side (band
    dimensions, calendars) the broadcast turns this into a map-side
    nested-loop over a handful of intervals — no shuffle at all. For
    large×large range joins, bucket both sides by epoch/bin first so the
    theta-condition only runs within co-partitioned buckets."""
    cond = (F.col(point_col) >= F.col(lo_col)) & (F.col(point_col) < F.col(hi_col))
    rhs = F.broadcast(right) if broadcast_right else right
    return left.join(rhs, cond, how)


def construct(
    sources: dict[str, DataFrame],
    on: str | list[str] = "image_id",
    how: str = "inner",
    broadcast: set[str] | None = None,
) -> DataFrame:
    """J1: assemble the wide example row by equi-joining every source on the
    key. ``broadcast`` names sources to hint broadcast (label palettes,
    registries — the J4 pattern)."""
    broadcast = broadcast or set()
    items = list(sources.items())
    if not items:
        raise ValueError("construct of zero sources")
    name0, out = items[0]
    if name0 in broadcast:
        out = F.broadcast(out)
    for name, df in items[1:]:
        rhs = F.broadcast(df) if name in broadcast else df
        out = out.join(rhs, on=on, how=how)
    return out


def merge_into(
    target: DataFrame,
    source: DataFrame,
    key_cols: list[str],
    delete_col: str | None = None,
) -> DataFrame:
    """Functional MERGE (upsert): source rows replace matching target rows
    on the key; unmatched source rows are inserted; with ``delete_col``
    set, source rows carrying true in that boolean column delete the match
    instead. Returns the new target (immutable-output semantics — the lake
    pattern, vs the reference's in-place file rewrites, base/mask.py:218-252).

    Shape: ONE shuffle — union the tagged inputs and keep the
    highest-priority row per key (window on the key). Equivalent to the
    full-outer-join formulation but with a single exchange and no wide
    coalesce list; at 100 TB prefer targets bucketed on the key
    (sinks.write_bucketed) so the exchange disappears entirely."""
    from pyspark.sql.window import Window

    cols = target.columns
    if set(cols) - set(source.columns + ([delete_col] if delete_col else [])):
        raise ValueError("source must cover target columns")
    tagged = target.select(*cols).withColumn("_pri", F.lit(0)).unionByName(
        source.select(
            *cols,
            *( [F.col(delete_col)] if delete_col else [] ),
        ).withColumn("_pri", F.lit(1)),
        allowMissingColumns=True,
    )
    if delete_col is None:
        tagged = tagged.withColumn("_del", F.lit(False))
    else:
        tagged = tagged.withColumn("_del", F.coalesce(F.col(delete_col), F.lit(False)))
    w = Window.partitionBy(*key_cols).orderBy(F.desc("_pri"))
    return (
        tagged.withColumn("_rn", F.row_number().over(w))
        .filter((F.col("_rn") == 1) & ~F.col("_del"))
        .select(*cols)
    )


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    keys: list[str],
    compare_cols: list[str] | None = None,
) -> DataFrame:
    """Change-data derivation between two table snapshots (the lake-diff
    that feeds a MERGE when no CDC log exists): one full-outer join on
    the key, change detection via an md5 row-hash over the compared
    columns — one shuffle per side on the join key, the hash collapses
    wide-row comparison to one string equality.

    Returns key columns + ``change ∈ {added, removed, changed}`` —
    unchanged rows are dropped (at 100 TB they are ~all the rows; never
    materialize them).

    NULL-safe AND injective: each compared column serializes as a
    self-delimiting token — ``N`` for NULL, ``V<len>:<value>`` for a
    value — so no string value can alias NULL (the r2 ``\\x00``
    sentinel collided with a genuine ``'\\x00'`` value) and no value
    containing the separator can alias a column boundary (the length
    prefix makes the concatenation uniquely parseable; advisor
    findings, r2+r3).
    """
    cmp_cols = compare_cols or [c for c in new.columns if c not in keys]

    def tok(c: str) -> F.Column:
        s = F.col(c).cast("string")
        return F.when(s.isNull(), F.lit("N")).otherwise(
            F.concat(F.lit("V"), F.length(s).cast("string"), F.lit(":"), s)
        )

    def rh(df: DataFrame) -> F.Column:
        return F.md5(F.concat(*[tok(c) for c in cmp_cols]))

    o = old.select(*keys, rh(old).alias("_oh"))
    n = new.select(*keys, rh(new).alias("_nh"))
    j = o.join(n, keys, "full")
    change = (
        F.when(F.col("_oh").isNull(), F.lit("added"))
        .when(F.col("_nh").isNull(), F.lit("removed"))
        .when(F.col("_oh") != F.col("_nh"), F.lit("changed"))
    )
    return (
        j.select(*keys, change.alias("change"))
        .filter(F.col("change").isNotNull())
    )


def scd2_intervals(
    df: DataFrame,
    key: str,
    state_col: str,
    ts_col: str = "ts",
    tiebreak_col: str | None = None,
) -> DataFrame:
    """Slowly-changing-dimension type-2 history from a change log: one
    validity interval per (key, state run) — consecutive identical
    states collapse (true SCD2, not one row per event). Island
    detection via the lag-change running sum, intervals via lead() over
    the collapsed runs; NULL valid_to marks the current state.

    One shuffle on the key; both windows share the same partitioning,
    so Catalyst plans a single Exchange."""
    from pyspark.sql.window import Window

    order = [ts_col] + ([tiebreak_col] if tiebreak_col else [])
    w = Window.partitionBy(key).orderBy(*order)
    runs = (
        df.select(key, state_col, *order)
        .withColumn(
            "_chg",
            (
                F.coalesce(
                    F.lag(state_col).over(w) != F.col(state_col), F.lit(True)
                )
            ).cast("int"),
        )
        .withColumn("_run", F.sum("_chg").over(w))
    )
    collapsed = runs.groupBy(key, "_run").agg(
        F.min_by(state_col, F.col(ts_col)).alias("state"),
        F.min(ts_col).alias("valid_from"),
    )
    w2 = Window.partitionBy(key).orderBy("valid_from")
    return collapsed.select(
        F.col(key),
        "state",
        "valid_from",
        F.lead("valid_from").over(w2).alias("valid_to"),
    )
