"""Final-stage corpus layout operators: sequence packing (concat-and-
chunk into fixed token budgets) and seeded deterministic shuffling /
balanced shard assignment — the two layout passes a pre-training data
pipeline runs after cleaning.  Documents are concatenated in a
deterministic order and the global token stream is cut into
``budget``-sized bins; a document may span two or more bins.

The core is a GLOBAL prefix sum, which a naive
``Window.orderBy(...)`` without ``partitionBy`` computes in a single
task — the classic accidental serialization.  The scalable plan:

1. ``repartitionByRange`` on the order key, so partition order equals
   global order (persisted: the range boundaries are sampled, and the
   offsets job and the output job must see the SAME partitioning);
2. per-partition token totals — a bounded collect (one row per
   partition, the distributed-prefix-sum handshake);
3. each partition's global offset joins back (broadcast, #partitions
   rows) and a WITHIN-partition window cumsum finishes the job.

Every step is deterministic in the RESULT regardless of where the
sampled range boundaries land, so the operator carries an exact SQL
oracle (DuckDB runs the plain single-threaded cumsum).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..cacheutil import register


def pack_sequences(
    docs: DataFrame,
    n_tok_col: str,
    id_col: str = "doc_id",
    budget: int = 2048,
    order_col: str | None = None,
    num_partitions: int | None = None,
) -> DataFrame:
    """(id, n_tok, start_tok, end_tok, first_bin, last_bin) for the
    concat-and-chunk packing of ``docs`` into ``budget``-token bins.

    ``order_col`` fixes the concatenation order (default: md5 of the
    id — deterministic and shuffle-friendly); ``start_tok`` is the
    0-based global offset of the doc's first token; bins are
    ``offset div budget``.  Zero-token docs take the degenerate bin of
    their start offset.
    """
    if budget <= 0:
        raise ValueError(f"budget must be positive, got {budget}")
    order = (
        F.col(order_col)
        if order_col
        else F.md5(F.col(id_col).cast("string"))
    )
    src = docs.select(F.col(id_col), F.col(n_tok_col).cast("long"), order.alias("__ord"))
    n_parts = num_partitions or src.sparkSession.sparkContext.defaultParallelism
    ranged = register(
        src.repartitionByRange(n_parts, "__ord")
        .withColumn("__pid", F.spark_partition_id())
        .persist()  # pin the sampled range boundaries: the offsets job
        # and the output job MUST observe the same partitioning
    )
    totals = (
        ranged.groupBy("__pid").agg(F.sum(n_tok_col).alias("t")).collect()
    )  # bounded: one row per partition
    by_pid = {r["__pid"]: r["t"] or 0 for r in totals}
    offsets, acc = [], 0
    for pid in range(max(by_pid, default=-1) + 1):
        offsets.append((pid, acc))
        acc += by_pid.get(pid, 0)
    off_df = src.sparkSession.createDataFrame(
        offsets or [(0, 0)], "__pid int, __off long"
    )
    w = Window.partitionBy("__pid").orderBy("__ord", id_col)
    start = (F.col("__off") + F.sum(n_tok_col).over(w) - F.col(n_tok_col)).alias(
        "start_tok"
    )
    out = (
        ranged.join(F.broadcast(off_df), "__pid")
        .select(id_col, n_tok_col, start)
        .withColumn("end_tok", F.col("start_tok") + F.col(n_tok_col) - 1)
        .withColumn("first_bin", F.expr(f"start_tok div {budget}"))
        .withColumn(
            "last_bin", F.expr(f"greatest(end_tok, start_tok) div {budget}")
        )
    )
    return out


def shard_assignments(
    docs: DataFrame,
    id_col: str = "doc_id",
    n_shards: int = 64,
    seed: int = 42,
    num_partitions: int | None = None,
) -> DataFrame:
    """Seeded deterministic global shuffle + balanced shard layout —
    the epoch-level permutation a training pipeline applies to the
    whole corpus before writing shard files.  Returns (id, shard, pos):
    ``shard`` sizes differ by at most 1 (round-robin over the global
    rank, unlike hash-mod sharding whose multinomial sizes drift by
    O(sqrt(n/shards))), ``pos`` is the 0-based position within the
    shard, and the permutation is a pure function of (seed, id) — the
    same corpus shuffles identically on any engine or cluster layout.

    The global rank is the same distributed prefix sum as
    :func:`pack_sequences` (repartitionByRange on the md5 sort key +
    bounded per-partition counts + within-partition row_number), never
    a single-partition window.  The sort key md5(seed ':' id) is
    engine-independent (lowercase hex in both Spark and DuckDB), so
    the operator carries an exact SQL oracle.
    """
    if n_shards <= 0:
        raise ValueError(f"n_shards must be positive, got {n_shards}")
    order = F.md5(F.concat_ws(":", F.lit(str(seed)), F.col(id_col).cast("string")))
    src = docs.select(F.col(id_col), order.alias("__ord"))
    n_parts = num_partitions or src.sparkSession.sparkContext.defaultParallelism
    ranged = register(
        src.repartitionByRange(n_parts, "__ord")
        .withColumn("__pid", F.spark_partition_id())
        .persist()  # pin the sampled range boundaries (see pack_sequences)
    )
    totals = ranged.groupBy("__pid").agg(F.count(F.lit(1)).alias("t")).collect()
    by_pid = {r["__pid"]: r["t"] for r in totals}
    offsets, acc = [], 0
    for pid in range(max(by_pid, default=-1) + 1):
        offsets.append((pid, acc))
        acc += by_pid.get(pid, 0)
    off_df = src.sparkSession.createDataFrame(
        offsets or [(0, 0)], "__pid int, __off long"
    )
    w = Window.partitionBy("__pid").orderBy("__ord", id_col)
    rank = (F.col("__off") + F.row_number().over(w) - 1).alias("__rank")
    return (
        ranged.join(F.broadcast(off_df), "__pid")
        .select(id_col, rank)
        .select(
            id_col,
            F.expr(f"__rank % {n_shards}").alias("shard"),
            F.expr(f"__rank div {n_shards}").alias("pos"),
        )
    )


def budget_selection(
    docs: DataFrame,
    n_tok_col: str,
    budget: int,
    score_col: str,
    id_col: str = "doc_id",
    num_partitions: int | None = None,
) -> DataFrame:
    """Greedy quality-ranked selection under a global token budget —
    "take the best documents until N tokens", the corpus-sizing step a
    training-data pipeline runs last.  Docs are ranked by
    (``score_col`` DESC, ``id_col`` ASC); a doc is KEPT iff the total
    tokens of all higher-ranked docs is < ``budget`` (the straddling
    doc is kept, so the selection reaches >= budget whenever the
    corpus can).  Returns the kept rows as (id, n_tok, score,
    cum_before) where ``cum_before`` is that higher-ranked total.

    Same scale shape as :func:`pack_sequences`: the global cumsum is a
    distributed prefix sum (``repartitionByRange`` on the rank key,
    O(partitions) driver rows, within-partition window) — never a
    single-partition global window.  Rank ties are impossible
    (id breaks them), so the result is a pure function of the input
    and carries an exact SQL oracle (round the score upstream — a
    sub-1e-6 cross-engine float difference would reorder the rank).
    """
    if budget <= 0:
        raise ValueError(f"budget must be positive, got {budget}")
    src = docs.select(
        F.col(id_col),
        F.col(n_tok_col).cast("long").alias("__tok"),
        F.col(score_col).alias("__score"),
    )
    n_parts = num_partitions or src.sparkSession.sparkContext.defaultParallelism
    ranged = register(
        src.repartitionByRange(n_parts, F.col("__score").desc(), F.col(id_col).asc())
        .withColumn("__pid", F.spark_partition_id())
        .persist()  # pin the sampled range boundaries (see pack_sequences)
    )
    totals = ranged.groupBy("__pid").agg(F.sum("__tok").alias("t")).collect()
    by_pid = {r["__pid"]: r["t"] or 0 for r in totals}
    offsets, acc = [], 0
    for pid in range(max(by_pid, default=-1) + 1):
        offsets.append((pid, acc))
        acc += by_pid.get(pid, 0)
    off_df = src.sparkSession.createDataFrame(
        offsets or [(0, 0)], "__pid int, __off long"
    )
    w = Window.partitionBy("__pid").orderBy(F.col("__score").desc(), F.col(id_col))
    cum_before = (
        F.col("__off") + F.sum("__tok").over(w) - F.col("__tok")
    ).alias("cum_before")
    return (
        ranged.join(F.broadcast(off_df), "__pid")
        .select(
            id_col,
            F.col("__tok").alias(n_tok_col),
            F.col("__score").alias(score_col),
            cum_before,
        )
        .where(F.col("cum_before") < budget)
    )


def group_budget_selection(
    docs: DataFrame,
    n_tok_col: str,
    budgets,
    score_col: str,
    group_col: str,
    id_col: str = "doc_id",
    num_partitions: int | None = None,
) -> DataFrame:
    """Per-group token budgets — curriculum-aware corpus sizing: "the
    best docs until N_g tokens of EACH source g".  ``budgets`` is an
    int (same budget per group) or a {group: budget} dict; groups
    absent from the dict get NO budget and are dropped entirely (the
    explicit-mix contract: an unlisted source contributes nothing).

    Rank is (group, score DESC, id) and the cumsum is per group, but
    the plan is NOT a window partitioned by group — for few large
    groups that serializes each group into one task.  Instead the same
    distributed prefix sum as :func:`budget_selection` with the group
    prepended to the range key: ``repartitionByRange(group, score
    DESC, id)`` (a group may span partitions), per-(partition, group)
    totals — a bounded O(partitions x groups) driver collect — per-
    group offsets accumulated in partition order, and a within-
    partition window partitioned by group finishes the job.  Returns
    kept rows as (id, group, n_tok, score, cum_before).

    ``group_col`` values must be strings (the offsets handshake table
    declares a string key so an empty input still has a schema).
    """
    src = docs.select(
        F.col(id_col),
        F.col(group_col).alias("__grp"),
        F.col(n_tok_col).cast("long").alias("__tok"),
        F.col(score_col).alias("__score"),
    )
    if isinstance(budgets, int):
        if budgets <= 0:
            raise ValueError(f"budget must be positive, got {budgets}")
        groups = [r["__grp"] for r in src.select("__grp").distinct().collect()]
        budgets = {g: budgets for g in groups}
    if not budgets:
        raise ValueError("budgets must name at least one group")
    bdf = src.sparkSession.createDataFrame(
        [(g, int(b)) for g, b in budgets.items()], "__grp string, __budget long"
    )
    n_parts = num_partitions or src.sparkSession.sparkContext.defaultParallelism
    # every stitch join in a salted/sliced plan needs eqNullSafe on the
    # key (r7 rule): a NULL group is a real group to the offsets loop
    # below, and a null-unsafe equi-join would silently drop its rows
    ranged = register(
        src.join(
            F.broadcast(bdf), src["__grp"].eqNullSafe(bdf["__grp"])
        )  # unlisted groups drop here
        .drop(bdf["__grp"])
        .repartitionByRange(
            n_parts, F.col("__grp"), F.col("__score").desc(), F.col(id_col).asc()
        )
        .withColumn("__pid", F.spark_partition_id())
        .persist()  # pin the sampled range boundaries (see pack_sequences)
    )
    totals = (
        ranged.groupBy("__pid", "__grp").agg(F.sum("__tok").alias("t")).collect()
    )  # bounded: one row per (partition, group)
    by_key = {(r["__pid"], r["__grp"]): r["t"] or 0 for r in totals}
    acc: dict = {}
    offsets = []
    for pid, grp in sorted(by_key, key=lambda k: (k[1] is None, k[1], k[0])):
        offsets.append((pid, grp, acc.get(grp, 0)))
        acc[grp] = acc.get(grp, 0) + by_key[(pid, grp)]
    off_df = src.sparkSession.createDataFrame(
        offsets or [(0, None, 0)], "__pid int, __grp string, __off long"
    )
    w = Window.partitionBy("__pid", "__grp").orderBy(
        F.col("__score").desc(), F.col(id_col)
    )
    cum_before = (
        F.col("__off") + F.sum("__tok").over(w) - F.col("__tok")
    ).alias("cum_before")
    return (
        ranged.join(
            F.broadcast(off_df),
            (ranged["__pid"] == off_df["__pid"])
            & ranged["__grp"].eqNullSafe(off_df["__grp"]),
        )
        .drop(off_df["__pid"])
        .drop(off_df["__grp"])
        .select(
            id_col,
            F.col("__grp").alias(group_col),
            F.col("__tok").alias(n_tok_col),
            F.col("__score").alias(score_col),
            cum_before,
            "__budget",
        )
        .where(F.col("cum_before") < F.col("__budget"))
        .drop("__budget")
    )
