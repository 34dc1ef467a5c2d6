"""Temporal operators Spark lacks as built-ins: backward as-of join
and gap-based sessionization.

Both are classic event-stream primitives the reference's marker/event
domain needs (the time-bucketed cache answers "was this marker seen in
[t0, t1)?"; the as-of join answers "what was the latest state at t?"),
and both reduce to ONE keyed shuffle + window functions — no per-key
loops, no range cross-join:

* as-of join — the union+window trick: tag reference rows 0 and probe
  rows 1, union them, sort each key partition by (ts, tag), and carry
  the reference payload forward with ``last(..., ignorenulls=True)``.
  Cost is a single hash shuffle on the key for |L|+|R| rows, vs. the
  naive range join's per-probe scan.  This is the same plan DuckDB /
  kdb execute natively for ASOF JOIN — which makes DuckDB's built-in
  ``ASOF JOIN`` the exact oracle for ours.
* sessionization — gaps-and-islands: a new session starts where the
  in-key gap exceeds ``gap_s``; session ids are the running sum of
  those starts.  One shuffle, two window passes, then an aggregation.

At 10^12-event scale both plans shuffle each row exactly once on the
key; skewed keys (one bot user) are bounded by per-key data, and the
window sort is the per-partition external sort Spark already does for
any window function.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    probes: DataFrame,
    refs: DataFrame,
    key_col: str,
    ts_col: str,
    value_cols: list[str],
    direction: str = "backward",
    dedup_ref_ts: bool = False,
    slice_s: int | None = None,
) -> DataFrame:
    """For each probe row, attach the nearest reference row for the
    same key: ``direction='backward'`` picks the largest ref ``ts <=
    probe.ts`` (inclusive), ``'forward'`` the smallest ref ``ts >=
    probe.ts`` — the same plan with the sort reversed.

    Returns the probe rows plus ``<v>_asof`` for each value column and
    ``<ts_col>_asof`` (all NULL when no reference qualifies; a matched
    reference row's NULL value column stays NULL — the whole reference
    row is carried ATOMICALLY as one struct, so columns from different
    reference rows can never mix).  Among reference rows sharing an
    identical (key, ts), the carried row is the one with the
    lexicographically largest (values..., ts) — an explicit
    deterministic tiebreak where the semantics are otherwise
    unspecified.

    ``slice_s`` is the hot-key defense: the default plan partitions
    the window by key alone, so one bot user at 10^12 events is one
    straggling sort partition.  With ``slice_s`` set (seconds per time
    slice), the carry runs per (key, slice) — splitting a hot key's
    sort across its time range — and a second, per-(key, slice)-sized
    pass carries each slice's last reference across slice boundaries
    (the standard two-pass fix): within-slice carry wins when present,
    else the nearest earlier (later, for forward) slice's carry-out.
    Results are identical to the unsalted plan (property-tested,
    NULL keys and NULL timestamps included — the stitch joins are
    null-safe on the key);
    ``ts_col`` must be timestamp-typed or integer epoch MICROseconds.

    Note that SQL oracles (e.g. DuckDB's native ASOF
    JOIN) pick an ARBITRARY row among equal-timestamp references:
    set ``dedup_ref_ts=True`` to pre-aggregate the references to one
    row per (key, ts) with the same max-struct rule BEFORE the carry —
    then apply the identical pre-aggregation on the oracle side and
    both engines see unique timestamps.  Off by default: the extra
    (key, ts) shuffle is wasted when reference timestamps are already
    unique per key.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    out_vals = [f"{v}_asof" for v in value_cols]
    clash = (
        set(out_vals)
        | {f"{ts_col}_asof", "__tag", "__ref", "__c", "__slice", "__us",
           "__out", "__cin", "__k2", "__s2", "__k3", "__s3"}
    ) & set(probes.columns)
    if clash:
        raise ValueError(
            f"probe columns collide with as-of output columns: {sorted(clash)}"
        )
    # the ENTIRE matched reference row travels as one struct: carrying
    # each output column independently with last(ignorenulls) back-fills
    # a NULL value from an OLDER reference row, pairing it with the
    # newer row's timestamp (reproduced; review finding r5)
    ref_struct = F.struct(
        *[F.col(v).alias(f"{v}_asof") for v in value_cols],
        F.col(ts_col).alias(f"{ts_col}_asof"),
    )
    ref_rows = refs.where(F.col(ts_col).isNotNull())
    if dedup_ref_ts:
        # one reference row per (key, ts), chosen by the SAME max-struct
        # rule the window tiebreak uses — the carry below then sees
        # unique timestamps, matching an oracle that pre-aggregates the
        # same way (see docstring)
        ref_rows = (
            ref_rows.groupBy(key_col, ts_col)
            .agg(F.max(ref_struct).alias("__mx"))
            .select(
                key_col,
                ts_col,
                *[F.col("__mx")[f"{v}_asof"].alias(v) for v in value_cols],
            )
        )
    r = ref_rows.select(
        F.col(key_col),
        F.col(ts_col),
        F.lit(0).alias("__tag"),
        ref_struct.alias("__ref"),
        *[F.lit(None).cast(t.dataType.simpleString()).alias(c)
          for c, t in zip(probes.columns, probes.schema)
          if c not in (key_col, ts_col)],
    )
    null_ref = F.lit(None).cast(
        r.schema["__ref"].dataType.simpleString()
    )
    p = probes.select(
        F.col(key_col),
        F.col(ts_col),
        F.lit(1).alias("__tag"),
        null_ref.alias("__ref"),
        *[F.col(c) for c in probes.columns if c not in (key_col, ts_col)],
    )
    # reference rows sort BEFORE probes at equal ts (tag 0 < 1): the
    # inclusive <=/>= semantics DuckDB's ASOF JOIN uses; forward = the
    # identical carry over the reversed timestamp order.  The struct
    # itself is the final sort key: equal-(key, ts) reference
    # duplicates resolve deterministically (largest struct wins —
    # probes' NULL struct sorts first and cannot perturb ref order).
    ts_order = F.col(ts_col).asc() if direction == "backward" else F.col(ts_col).desc()
    order_cols = (ts_order, F.col("__tag").asc(), F.col("__ref").asc_nulls_first())
    u = r.unionByName(p)
    if slice_s is None:
        w = Window.partitionBy(key_col).orderBy(*order_cols).rowsBetween(
            Window.unboundedPreceding, 0
        )
        carried = u.select(
            "*", F.last("__ref", ignorenulls=True).over(w).alias("__c")
        )
    else:
        ts_type = dict(zip(u.columns, [f.dataType for f in u.schema]))[ts_col]
        us = (
            F.unix_micros(F.col(ts_col).cast("timestamp"))
            if ts_type.typeName().startswith("timestamp")
            else F.col(ts_col).cast("long")
        )
        u = u.withColumn("__us", us).withColumn(
            "__slice", F.floor(F.col("__us") / F.lit(slice_s * 1_000_000))
        )
        ws = Window.partitionBy(key_col, "__slice").orderBy(*order_cols)
        carried = u.select(
            "*",
            F.last("__ref", ignorenulls=True)
            .over(ws.rowsBetween(Window.unboundedPreceding, 0))
            .alias("__c"),
        )
        # each slice's carry-out (its final reference in carry order)
        # is derived WITHOUT a second full-table sort+window: among the
        # slice's refs it is the max of (us, ref) for backward, and the
        # min-us / max-ref-on-ties for forward — i.e. max of (-us, ref)
        # (a plain map-side-combinable groupBy over the pre-window
        # subtree; an earlier draft computed it as a second
        # unboundedFollowing window over the full table, re-running the
        # big sort — review finding r6)
        sgn = F.lit(1) if direction == "backward" else F.lit(-1)
        ref_bound = (
            u.where(F.col("__tag") == 0)
            .groupBy(key_col, "__slice")
            .agg(
                F.max(
                    F.struct(
                        (F.col("__us") * sgn).alias("o"),
                        F.col("__ref").alias("r"),
                    )
                ).alias("__mx")
            )
            .select(key_col, "__slice", F.col("__mx")["r"].alias("__out"))
        )
        # every (key, slice) present on either side gets a carry-in row:
        # probe-only slices must inherit from the nearest earlier
        # (later, forward) reference-bearing slice.  Both joins below
        # are NULL-SAFE on the key: a name-based equi-join silently
        # drops NULL-key rows, while the unsalted window plan treats
        # NULL as a real group (review finding r6 — the salted plan
        # lost cross-slice matches for NULL-key probes).
        slices = u.select(key_col, "__slice").distinct()
        rb = ref_bound.select(
            F.col(key_col).alias("__k3"),
            F.col("__slice").alias("__s3"),
            "__out",
        )
        boundary = slices.join(
            rb,
            F.col(key_col).eqNullSafe(F.col("__k3"))
            & F.col("__slice").eqNullSafe(F.col("__s3")),
            "left",
        ).drop("__k3", "__s3")
        slice_order = (
            F.col("__slice").asc()
            if direction == "backward"
            else F.col("__slice").desc()
        )
        wb = Window.partitionBy(key_col).orderBy(slice_order).rowsBetween(
            Window.unboundedPreceding, -1
        )
        carry_in = boundary.select(
            F.col(key_col).alias("__k2"),
            F.col("__slice").alias("__s2"),
            F.last("__out", ignorenulls=True).over(wb).alias("__cin"),
        )
        # left join (NULL-ts probes have a NULL slice and must survive
        # to the gated no-match output) and NULL-SAFE on the key (a
        # NULL-key probe must still inherit NULL-key carry-outs — the
        # unsalted plan sessions NULL keys like any other group)
        carried = (
            carried.join(
                carry_in,
                F.col(key_col).eqNullSafe(F.col("__k2"))
                & F.col("__slice").eqNullSafe(F.col("__s2")),
                "left",
            )
            .withColumn("__c", F.coalesce("__c", "__cin"))
            .drop("__slice", "__us", "__cin", "__k2", "__s2")
        )
    probe_cols = [c for c in probes.columns]
    # a NULL-ts probe has no defined position in time: no match (its
    # sort position would otherwise differ between directions)
    matched = F.when(F.col(ts_col).isNotNull(), F.col("__c"))
    return carried.where(F.col("__tag") == 1).select(
        *probe_cols,
        *[matched[c].alias(c) for c in (*out_vals, f"{ts_col}_asof")],
    )


def sessionize(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    gap_s: int = 1800,
    slice_s: int | None = None,
) -> DataFrame:
    """Gap-based sessions per key: a new session starts when the
    in-key gap since the previous event exceeds ``gap_s`` seconds.

    Returns one row per (key, session): ``session`` (1-based ordinal
    within the key), ``n_events``, ``start_us``/``end_us`` (exact
    epoch microseconds — integers survive any engine's float/timezone
    formatting), ``duration_us``.

    ``slice_s`` is the hot-key defense (same idea as
    :func:`asof_join`'s): the default plan sorts each key in one
    window partition, so one bot key at 10^12 events is one straggling
    task.  With ``slice_s`` set (seconds per time slice; pick it >>
    ``gap_s``), local sessions are computed per (key, slice) and a
    second pass over the BOUNDED per-(key, slice) summary stitches
    sessions across slice boundaries (a slice's first local session
    merges into the previous slice's last session when the boundary
    gap is within ``gap_s``) and renumbers globally via a prefix sum
    of sessions-started-per-slice.  Output is identical to the
    unsalted plan (property-tested; ties, NULL timestamps, and NULL
    keys included — the stitch join is null-safe on the key).
    """
    # parquet may surface TIMESTAMP_NTZ; unix_micros needs TIMESTAMP
    # (cast interprets NTZ in the session TZ — pin it to UTC, as the
    # driver contract and tests/conftest.py both do)
    us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    gap_us = gap_s * 1_000_000
    if slice_s is None:
        w = Window.partitionBy(key_col).orderBy(ts_col)
        gapped = df.select(
            F.col(key_col),
            us.alias("__us"),
            F.when(
                us - F.lag(us).over(w) > gap_us, F.lit(1)
            ).otherwise(F.lit(0)).alias("__new"),
        )
        # default RANGE frame (peer-inclusive), NOT rowsBetween: events
        # tied on (key, ts) must share one cumulative sum even when the
        # tie group contains the session-start marker — a ROWS frame
        # would split the tie group by unspecified sort order between
        # the two window sorts, while RANGE matches both the
        # strictly-greater gap rule (a 0-gap tie can never open a
        # session) and the oracle's default framing.
        w2 = Window.partitionBy(key_col).orderBy("__us")
        with_session = gapped.select(
            key_col,
            "__us",
            (F.sum("__new").over(w2) + 1).alias("session"),
        )
    else:
        # NULL-ts events get a sentinel slice that sorts before every
        # real one — reproducing the unsalted plan's nulls-first order
        # (they fold into the key's first session, since their gaps are
        # NULL and NULL > gap_us is false)
        sentinel = -(1 << 62)
        ev = df.select(
            F.col(key_col),
            us.alias("__us"),
            F.coalesce(
                F.floor(us / F.lit(slice_s * 1_000_000)), F.lit(sentinel)
            ).alias("__slice"),
        )
        wl = Window.partitionBy(key_col, "__slice").orderBy("__us")
        gapped = ev.select(
            key_col,
            "__slice",
            "__us",
            F.when(
                F.col("__us") - F.lag("__us").over(wl) > gap_us, F.lit(1)
            ).otherwise(F.lit(0)).alias("__new"),
        )
        local = gapped.select(
            key_col,
            "__slice",
            "__us",
            # 0-based local session; RANGE frame so tied timestamps
            # share the cumulative sum (same rationale as unsalted)
            F.sum("__new").over(wl).alias("__l"),
        )
        # summary derives from GAPPED (pre-cumsum): sum(__new) per
        # slice equals max(__l) but skips re-running the event-scale
        # cumulative-sum window in the summary branch of the plan —
        # same pre-window-subtree rule as asof_join's carry-out
        summary = gapped.groupBy(key_col, "__slice").agg(
            F.min("__us").alias("__first"),
            F.max("__us").alias("__last"),
            F.sum("__new").alias("__nloc"),  # local sessions beyond the first
        )
        ws = Window.partitionBy(key_col).orderBy("__slice")
        # the boundary opens a new session iff this is the key's first
        # slice or the cross-boundary gap strictly exceeds gap_us; a
        # NULL gap (all-NULL-us neighbor) merges, matching nulls-first
        bnew = F.when(F.row_number().over(ws) == 1, F.lit(1)).otherwise(
            F.when(
                F.col("__first") - F.lag("__last").over(ws) > gap_us, F.lit(1)
            ).otherwise(F.lit(0))
        )
        wcum = ws.rowsBetween(Window.unboundedPreceding, -1)
        base = (
            summary.withColumn("__bnew", bnew)
            .withColumn(
                "__cum",
                F.coalesce(
                    F.sum(F.col("__bnew") + F.col("__nloc")).over(wcum), F.lit(0)
                ),
            )
            # global ordinal of (slice, local l) = cum-started-before
            # + bnew + l: l=0 continues the previous session when
            # bnew=0, else opens ordinal cum+1
            .select(
                F.col(key_col).alias("__k2"),
                F.col("__slice").alias("__s2"),
                (F.col("__cum") + F.col("__bnew")).alias("__base"),
            )
        )
        # NULL-SAFE stitch join on the key: the unsalted window plan
        # sessions NULL keys as a real group, so a name-based inner
        # equi-join here would silently drop every NULL-key event
        # (review finding r6)
        with_session = local.join(
            base,
            F.col(key_col).eqNullSafe(F.col("__k2"))
            & (F.col("__slice") == F.col("__s2")),
        ).select(
            key_col,
            "__us",
            (F.col("__base") + F.col("__l")).alias("session"),
        )
    return with_session.groupBy(key_col, "session").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min("__us").alias("start_us"),
        F.max("__us").alias("end_us"),
        (F.max("__us") - F.min("__us")).alias("duration_us"),
    )


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    point_ts_col: str,
    start_col: str,
    end_col: str,
    bucket_s: int,
    key_col: str | None = None,
) -> DataFrame:
    """Point-in-interval join (the classic range join Spark has no
    equi-key for) via TIME BUCKETIZATION: each interval explodes to the
    bucket ids it overlaps, each point maps to its single containing
    bucket, and the non-equi condition becomes an equi-join on
    (bucket [, key]) followed by an exact containment filter.

    Timestamps are integer epoch microseconds (``point_ts_col`` /
    ``start_col`` / ``end_col``); containment is the closed interval
    ``start <= ts <= end``.  Each (point, interval) pair meets in
    EXACTLY one bucket — the point's — so no post-join dedup is needed.

    Scale shape: a naive plan is a broadcast-nested-loop or cartesian
    filter, O(|P|·|I|).  Bucketization shuffles each point once and
    each interval ceil(len/bucket)+1 times on small integer keys; pick
    ``bucket_s`` near the typical interval length so the explode factor
    stays O(1) while bucket-sized skew stays bounded.
    """
    join_keys = {key_col} if key_col else set()
    shared = (set(points.columns) & set(intervals.columns)) - join_keys
    if shared:
        raise ValueError(
            "points and intervals share non-key columns "
            f"{sorted(shared)}; rename them before the join (an overlap "
            "would only surface as an ambiguous-column error at a later "
            "select, far from the cause)"
        )
    us_per_bucket = bucket_s * 1_000_000
    # integer `div`, not double `/`+cast: exact at any epoch magnitude
    iv = intervals.withColumn(
        "__bucket",
        F.explode(
            F.sequence(
                F.expr(f"{start_col} div {us_per_bucket}"),
                F.expr(f"{end_col} div {us_per_bucket}"),
            )
        ),
    )
    pt = points.withColumn(
        "__bucket", F.expr(f"{point_ts_col} div {us_per_bucket}")
    )
    on = ["__bucket"] + ([key_col] if key_col else [])
    return (
        pt.join(iv, on)
        .where(
            (F.col(point_ts_col) >= F.col(start_col))
            & (F.col(point_ts_col) <= F.col(end_col))
        )
        .drop("__bucket")
    )
