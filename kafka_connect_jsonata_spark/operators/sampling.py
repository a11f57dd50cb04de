"""Deterministic sampling and splitting for training-data pipelines.

Random sampling (``df.sample``) is irreproducible across engines, runs, and
repartitions — the wrong tool for building training sets. These operators
assign every record a position in [0, 1) from the MD5 of its id (+ salt),
so membership is a pure function of content:

- the same record lands in the same split on every engine and every run
  (leakage-safe train/test boundaries — the published norm for dataset
  splits);
- sampling composes: a 1% sample is a subset of the 10% sample with the
  same salt, so pipelines can dial scale up without resampling;
- it is a stateless map-side filter — no shuffle, pushes down to the scan
  as a deterministic predicate, trivially parallel at any scale.

The hash-position compare happens on the hex digest STRING (uniform,
lexicographic), which DuckDB reproduces byte-for-byte — every operator
here is oracle-checkable, unlike RNG sampling.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

_HEX_SPACE = 16 ** 8  # resolution: first 8 hex chars (~4e9 buckets)


def _threshold_hex(fraction: float) -> str:
    """Hex-string threshold such that P(md5_prefix < threshold) = fraction."""
    bucket = min(int(fraction * _HEX_SPACE), _HEX_SPACE)
    return format(bucket, "08x") + "0" * 24 if bucket < _HEX_SPACE else "g" * 32


def hash_position(id_col: Column, salt: str = "") -> Column:
    """The record's deterministic position digest: md5(id || salt)."""
    return F.md5(F.concat(id_col.cast("string"), F.lit(salt)))


def hash_sample(
    df: DataFrame, id_col: str, fraction: float, salt: str = ""
) -> DataFrame:
    """Keep a deterministic ``fraction`` of rows by content hash."""
    return df.filter(hash_position(F.col(id_col), salt) < _threshold_hex(fraction))


def hash_split(
    df: DataFrame,
    id_col: str,
    fractions: dict[str, float],
    salt: str = "",
) -> dict[str, DataFrame]:
    """Partition into named splits (e.g. {'train': .9, 'test': .1}) —
    exhaustive and disjoint by construction. Fractions must sum to 1."""
    total = sum(fractions.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"split fractions must sum to 1, got {total}")
    pos = hash_position(F.col(id_col), salt)
    out: dict[str, DataFrame] = {}
    acc = 0.0
    items = list(fractions.items())
    for i, (name, frac) in enumerate(items):
        lo, hi = _threshold_hex(acc), _threshold_hex(acc + frac)
        cond = pos >= F.lit(lo)
        if i < len(items) - 1:
            cond = cond & (pos < F.lit(hi))  # last split takes the remainder
        out[name] = df.filter(cond)
        acc += frac
    return out


def mixture_sample(
    df: DataFrame,
    id_col: str,
    group_col: str,
    rates: dict[str, float],
    salt: str = "",
    default_rate: float = 0.0,
) -> DataFrame:
    """Weighted corpus mixing: keep a different deterministic fraction per
    ``group_col`` value (the data-mixture step of a pretraining pipeline —
    e.g. {'wiki': 1.0, 'web': 0.3, 'forum': 0.1}). Same md5-position
    contract as ``hash_sample``: membership is a pure function of content,
    per-source samples are nested across rates, and the whole thing is one
    map-side filter — no shuffle, no RNG, oracle-checkable.

    Groups absent from ``rates`` keep ``default_rate`` of their rows.
    """
    if not rates:
        raise ValueError("rates must be non-empty")
    pos = hash_position(F.col(id_col), salt)
    cutoff = F.lit(_threshold_hex(default_rate))
    for name, rate in rates.items():
        cutoff = F.when(
            F.col(group_col) == F.lit(name), F.lit(_threshold_hex(rate))
        ).otherwise(cutoff)
    return df.filter(pos < cutoff)


def stratified_sample(
    df: DataFrame,
    id_col: str,
    group_col: str,
    n_per_group: int,
    salt: str = "",
) -> DataFrame:
    """Keep a deterministic ``n_per_group`` rows from every ``group_col``
    stratum: rows are ranked inside each group by their content-hash
    position (uniform, reproducible) and the first n kept. The standard
    way to balance a training mix (n docs per language/source/domain)
    without RNG irreproducibility.

    Scale: one shuffle, keyed by the stratum column. Bounded output per
    group means reducers emit at most n rows no matter how skewed the
    input; for a pathologically hot stratum the shuffle INPUT can still be
    pre-thinned with ``hash_sample`` (composability: a hash_sample at
    fraction f keeps exactly the first f of each group's hash order, so
    sample-then-stratify selects the same rows as stratify alone whenever
    f * group_size >= n).
    """
    w = Window.partitionBy(group_col).orderBy(
        hash_position(F.col(id_col), salt), F.col(id_col)
    )
    return (
        df.withColumn("__sample_rn", F.row_number().over(w))
        .filter(F.col("__sample_rn") <= n_per_group)
        .drop("__sample_rn")
    )


def deterministic_shuffle(
    df: DataFrame,
    id_col: str = "doc_id",
    seed: int | str = 42,
    n_buckets: int | None = None,
) -> DataFrame:
    """Epoch-reproducible global permutation: every row gets
    ``shuffle_pos`` = its rank under ``md5(seed ":" id)`` ordering (id as
    the tiebreak, so the order is total) — the standard "shuffle the
    corpus once per epoch, identically on any cluster" step of a training
    pipeline. Changing ``seed`` gives an independent permutation;
    re-running with the same seed reproduces it exactly, independent of
    partitioning, cluster size, or engine.

    Scale shape: the naive ``row_number() OVER (ORDER BY hash)`` is a
    GLOBAL window — the whole corpus funnels through one task. This is the
    same two-phase distributed prefix rank as ``pack_token_budget``:
    bucket rows by the leading hash bits (uniform by construction — no
    skew possible), one tiny aggregation computes per-bucket counts whose
    running sum (driver-side, n_buckets rows) gives each bucket's global
    offset, then a per-bucket window ranks within buckets. One keyed
    shuffle of the corpus; driver/broadcast state is O(n_buckets).
    """
    spark = df.sparkSession
    h = F.md5(F.concat_ws(":", F.lit(str(seed)), F.col(id_col).cast("string")))
    nb = n_buckets or spark.sparkContext.defaultParallelism
    hdf = df.withColumn("__h", h)
    # md5 hex is uniform: the first 4 hex digits scale to [0, nb) evenly
    bucket = F.least(
        F.lit(nb - 1),
        (F.conv(F.substring("__h", 1, 4), 16, 10).cast("long") * nb / 65536).cast("int"),
    )
    bt = hdf.withColumn("__b", bucket)
    counts = bt.groupBy("__b").agg(F.count("*").alias("__n")).orderBy("__b").collect()
    offsets, acc = {}, 0
    for r in counts:
        offsets[r["__b"]] = acc
        acc += int(r["__n"])
    off_df = spark.createDataFrame(
        [(b, o) for b, o in offsets.items()], "__b int, __off long"
    )
    w = (
        Window.partitionBy("__b")
        .orderBy(F.col("__h").asc(), F.col(id_col).asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        bt.join(F.broadcast(off_df), "__b")
        .withColumn("shuffle_pos", F.count("*").over(w) - 1 + F.col("__off"))
        .drop("__b", "__h", "__off")
    )


def temperature_mix_rates(
    df: DataFrame,
    group_col: str,
    target_total: float,
    alpha: float = 0.5,
    weight_col: str | None = None,
) -> dict[str, float]:
    """Per-group keep rates for temperature-flattened corpus mixing:
    p_g ∝ n_g^alpha (alpha < 1 upweights small sources — the multilingual
    / multi-domain resampling rule), scaled so the expected kept total is
    ``target_total`` and clamped at 1.

    Driver state is one row per group (sources are bounded by
    construction, like the k-means centroid pull). Float discipline for
    oracle parity: the weight sum folds left-to-right over groups sorted
    by name (the same explicit-fold rule every float oracle in this repo
    follows), and alpha=0.5 uses sqrt (IEEE-exact everywhere) rather than
    pow.

    ``weight_col``: when set (e.g. a token count), a group's mass is
    ``sum(weight_col)`` instead of its row count and ``target_total`` is
    in the same unit — TOKEN-budget mixing, the form pretraining recipes
    actually specify ("X billion tokens from source g"), still one
    bounded aggregation. Rows are still kept/dropped whole (documents are
    the sampling unit), so the kept mass matches the budget in
    expectation, exactly as doc-count mixing does.
    """
    mass = (
        F.sum(F.col(weight_col).cast("long"))
        if weight_col is not None
        else F.count(F.lit(1))
    )
    counts = {
        r[0]: int(r[1])
        for r in df.groupBy(group_col).agg(mass).collect()
        if r[0] is not None  # null groups fall to mixture_sample's default
    }
    if not counts:
        raise ValueError("no groups to mix")
    names = sorted(counts)
    if alpha == 0.5:
        import math

        weights = {g: math.sqrt(float(counts[g])) for g in names}
    else:
        weights = {g: float(counts[g]) ** alpha for g in names}
    s = 0.0
    for g in names:  # deterministic left-to-right fold
        s += weights[g]
    return {
        g: min(1.0, weights[g] / s * float(target_total) / counts[g])
        for g in names
    }


def temperature_mix_sample(
    df: DataFrame,
    id_col: str,
    group_col: str,
    target_total: float,
    alpha: float = 0.5,
    salt: str = "",
    weight_col: str | None = None,
) -> DataFrame:
    """Temperature-resampled corpus: ``mixture_sample`` driven by
    ``temperature_mix_rates`` instead of hand-picked rates — one bounded
    count aggregation, then the same zero-shuffle deterministic
    md5-position filter. Pass ``weight_col`` for token-budget mixing."""
    rates = temperature_mix_rates(df, group_col, target_total, alpha, weight_col)
    return mixture_sample(df, id_col, group_col, rates, salt)


def weighted_sample(
    df: DataFrame,
    id_col: str,
    weight_col: str,
    k: int,
    salt: str = "",
) -> DataFrame:
    """Deterministic weighted sampling WITHOUT replacement: keep ``k`` rows
    where each row's inclusion probability is proportional to its weight —
    the Efraimidis-Spirakis A-ES scheme (priority = u^(1/w), keep the top
    k), in the same content-hash discipline as the rest of this module:
    u comes from the row's md5 position, so the sample is a pure function
    of content + salt (reproducible on any cluster, any partitioning;
    change ``salt`` for an independent draw).

    Computed in log space (priority key = -ln(u)/w, keep the k SMALLEST)
    for numeric stability. Rows with weight <= 0 or null are excluded.

    Scale shape: priorities are map-side Column arithmetic; the top-k is a
    distributed ``TakeOrderedAndProject`` (per-partition heads + one final
    merge of k rows), never a global sort.
    """
    if k < 1:
        raise ValueError("k must be >= 1")
    w = F.col(weight_col).cast("double")
    # NaN compares greater-than-anything in Spark, so `w > 0` alone would
    # ADMIT NaN weights (with a NaN key that sorts last) — exclude them
    # explicitly along with nulls and non-positives
    w = F.when(~F.isnan(w), w)
    # u in (0, 1]: scaled 8-hex-digit md5 prefix, +1 so u > 0
    u = (
        F.conv(F.substring(hash_position(F.col(id_col), salt), 1, 8), 16, 10)
        .cast("double")
        + 1.0
    ) / float(_HEX_SPACE)
    key = -F.log(u) / w
    return (
        df.filter(w > 0)
        .withColumn("__wkey", key)
        .orderBy(F.col("__wkey").asc(), F.col(id_col).asc())
        .limit(k)
        .drop("__wkey")
    )


def unimax_allocation(
    counts: dict[str, int], budget: int, max_epochs: int = 4
) -> dict[str, int]:
    """UniMax budget allocation (Chung et al. 2023): distribute a total
    ``budget`` of examples across sources as UNIFORMLY as possible,
    capping every source at ``max_epochs`` passes over its ``counts[g]``
    unique examples — the epoch-capped alternative to temperature
    sampling that never over-repeats a small source.

    Closed form of the sequential waterfilling (sources ascending by
    size): a source is *binding* when its full cap still fits the uniform
    share of the remaining budget — ``cap_g * (k - j + 1) <= budget -
    prefix_caps`` — and with ascending capacities the binding set is a
    prefix; every non-binding source gets the SAME share
    ``floor((budget - sum(binding caps)) / n_non_binding)``.

    Float discipline (the oracle runs the identical closed form in SQL):
    ``max_epochs`` is an int, so caps / prefix sums / the binding test
    are all exact int64 arithmetic; the single share division is one
    IEEE double op followed by ``floor`` — bit-identical in any engine.
    """
    if budget < 0:
        raise ValueError("budget must be >= 0")
    if max_epochs < 1:
        raise ValueError("max_epochs must be >= 1")
    if not counts:
        raise ValueError("counts must be non-empty")
    names = sorted(counts, key=lambda g: (counts[g], g))
    k = len(names)
    alloc: dict[str, int] = {}
    bound_sum = 0
    for j, g in enumerate(names):
        cap = int(counts[g]) * int(max_epochs)
        free = k - j
        if cap * free <= budget - bound_sum:
            alloc[g] = cap  # binding: runs all max_epochs passes
            bound_sum += cap
        else:
            share = int(math.floor((budget - bound_sum) / free))
            for g2 in names[j:]:
                alloc[g2] = share
            break
    return alloc


def unimax_sample(
    df: DataFrame,
    id_col: str,
    group_col: str,
    budget: int,
    max_epochs: int = 4,
    salt: str = "",
    n_buckets: int | None = None,
) -> DataFrame:
    """Materialize the UniMax mixture: every selected row appears once per
    ``epoch`` (0-based) it participates in. A source allocated ``a`` rows
    out of ``n`` unique ones contributes ``a // n`` full passes of every
    row plus a partial pass of the ``a % n`` rows that rank first under
    the deterministic md5 position (same content-hash contract as
    ``hash_sample``: reproducible on any cluster, nested across salts).

    Scale shape: per-source counts are a bounded aggregation (one row per
    source, like ``temperature_mix_rates``); the within-source rank is
    the same two-phase distributed prefix rank as
    ``deterministic_shuffle`` — rows bucket by (source, leading hash
    bits), a bounded count agg gives per-cell offsets, a per-cell window
    ranks locally — so no source ever funnels through a single task. The
    epoch fan-out is a map-side ``explode`` (output growth is the
    operator's contract, not a shuffle).
    """
    spark = df.sparkSession
    # derive the group column's real type so non-string sources (int ids,
    # decimals) neither raise on createDataFrame nor silently cast the
    # join keys (same derivation as semantic_dup_pairs' id_type)
    group_type = df.schema[group_col].dataType.simpleString()
    counts = {
        r[0]: int(r[1])
        for r in df.groupBy(group_col).agg(F.count(F.lit(1))).collect()
        if r[0] is not None
    }
    alloc = unimax_allocation(counts, budget, max_epochs)
    plan = [
        (g, alloc[g] // counts[g], alloc[g] % counts[g]) for g in sorted(alloc)
    ]
    plan_df = spark.createDataFrame(
        plan, f"{group_col} {group_type}, __full int, __rem long"
    )
    nb = n_buckets or spark.sparkContext.defaultParallelism
    h = F.md5(F.concat(F.col(id_col).cast("string"), F.lit(salt)))
    hdf = df.withColumn("__h", h)
    hb = F.least(
        F.lit(nb - 1),
        (F.conv(F.substring("__h", 1, 4), 16, 10).cast("long") * nb / 65536).cast(
            "int"
        ),
    )
    bt = hdf.withColumn("__hb", hb)
    cell_counts = (
        bt.groupBy(group_col, "__hb")
        .agg(F.count(F.lit(1)).alias("__n"))
        .orderBy(group_col, "__hb")
        .collect()
    )
    offsets, acc, cur = [], 0, None
    for r in cell_counts:
        if r[0] != cur:
            cur, acc = r[0], 0  # rank restarts per source
        offsets.append((r[0], int(r["__hb"]), acc))
        acc += int(r["__n"])
    off_df = spark.createDataFrame(
        offsets, f"{group_col} {group_type}, __hb int, __off long"
    )
    w = (
        Window.partitionBy(group_col, "__hb")
        .orderBy(F.col("__h").asc(), F.col(id_col).asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    ranked = (
        bt.join(F.broadcast(off_df), [group_col, "__hb"])
        .withColumn("__rn", F.count(F.lit(1)).over(w) - 1 + F.col("__off"))
        .join(F.broadcast(plan_df), group_col)
    )
    n_epochs = F.col("__full") + F.when(F.col("__rn") < F.col("__rem"), 1).otherwise(0)
    return (
        ranked.withColumn(
            "epoch",
            F.explode(
                F.when(
                    n_epochs > 0, F.sequence(F.lit(0), (n_epochs - 1).cast("int"))
                ).otherwise(F.array().cast("array<int>"))
            ),
        )
        .drop("__h", "__hb", "__off", "__rn", "__full", "__rem")
    )


def curriculum_order(
    df: DataFrame,
    score_col: str,
    id_col: str = "doc_id",
    n_stages: int = 4,
    exact: bool | str = "auto",
    exact_cap: int = 5_000_000,
    seed: int | str = 42,
    n_buckets: int | None = None,
) -> DataFrame:
    """Curriculum ordering for training: partition the corpus into
    ``n_stages`` difficulty stages by ``score_col`` (ascending — low score
    = easy = first) and assign every row a global ``curriculum_pos`` that
    walks the stages in order. The standard easy-to-hard data schedule
    (Bengio et al. 2009) as a corpus operator.

    ``exact=True`` (the SQL-reproducible gate tier): stage = ntile over
    (score, id), position = row_number over (stage, score, id) — global
    windows, single-task, only safe below ``exact_cap`` rows.

    ``exact=False`` (the 100 TB tier): stage boundaries come from ONE
    ``approx_percentile`` pass (t-digest, bounded state) and are applied
    map-side; WITHIN a stage the position is the deterministic md5
    permutation rank of :func:`deterministic_shuffle` — which is what a
    training pipeline wants anyway (stages in curriculum order, examples
    shuffled within each stage). Rank uses the same two-phase prefix sum:
    rows bucket by (stage, leading-hash-bits), a bounded aggregation
    yields per-cell counts, their driver-side running sum (walked in
    (stage, hash-bucket) order) gives each cell's global offset, and a
    per-cell window ranks locally. One keyed shuffle of (ids + score);
    driver state is O(n_stages * n_buckets).

    ``exact="auto"``: probe ``df.count()`` once and pick the exact tier
    below ``exact_cap``. Returns ``df`` + (stage, curriculum_pos).
    """
    if n_stages < 1:
        raise ValueError("n_stages must be >= 1")
    spark = df.sparkSession
    if exact == "auto":
        exact = df.count() <= int(exact_cap)
    if exact:
        w_stage = Window.orderBy(F.col(score_col).asc(), F.col(id_col).asc())
        staged = df.withColumn("stage", F.ntile(n_stages).over(w_stage))
        w_pos = Window.orderBy(
            F.col("stage").asc(), F.col(score_col).asc(), F.col(id_col).asc()
        )
        return staged.withColumn(
            "curriculum_pos", F.row_number().over(w_pos).cast("long") - 1
        )
    qs = [i / n_stages for i in range(1, n_stages)]
    thr = (
        df.agg(F.percentile_approx(F.col(score_col), qs, 10_000).alias("t"))
        .first()["t"]
        if qs
        else []
    )
    stage = F.lit(1)
    for i, t in enumerate(thr):
        stage = F.when(F.col(score_col) <= F.lit(t), stage).otherwise(F.lit(i + 2))
    nb = n_buckets or spark.sparkContext.defaultParallelism
    h = F.md5(F.concat_ws(":", F.lit(str(seed)), F.col(id_col).cast("string")))
    hb = F.least(
        F.lit(nb - 1),
        (F.conv(F.substring("__h", 1, 4), 16, 10).cast("long") * nb / 65536).cast(
            "int"
        ),
    )
    bt = df.withColumn("stage", stage).withColumn("__h", h).withColumn("__hb", hb)
    counts = (
        bt.groupBy("stage", "__hb")
        .agg(F.count(F.lit(1)).alias("__n"))
        .orderBy("stage", "__hb")
        .collect()
    )
    offsets, acc = [], 0
    for r in counts:
        offsets.append((int(r["stage"]), int(r["__hb"]), acc))
        acc += int(r["__n"])
    off_df = spark.createDataFrame(offsets, "stage int, __hb int, __off long")
    w = (
        Window.partitionBy("stage", "__hb")
        .orderBy(F.col("__h").asc(), F.col(id_col).asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        bt.join(F.broadcast(off_df), ["stage", "__hb"])
        .withColumn("curriculum_pos", F.count(F.lit(1)).over(w) - 1 + F.col("__off"))
        .drop("__h", "__hb", "__off")
    )


def cluster_balanced_select(
    df: DataFrame,
    cluster_col: str,
    score_col: str,
    budget: int,
    id_col: str = "doc_id",
    max_per_cluster: int | None = None,
) -> DataFrame:
    """C76: cluster-balanced selection — spread a global ``budget`` of rows
    across clusters as uniformly as possible (UniMax waterfilling over the
    cluster sizes, optionally capped at ``max_per_cluster``), then take
    each cluster's TOP rows by ``score_col`` (ties broken on id). The
    DataComp/DFN-style "budget per semantic cluster, best-of within"
    recipe: semantic clusters (C73) or k-means cells supply ``cluster_col``,
    a quality signal (classifier margin, perplexity, entropy) supplies
    ``score_col`` — selection stops any single over-represented topic from
    eating the whole budget.

    Scale shape: per-cluster counts are a bounded aggregation feeding the
    closed-form waterfilling (driver holds one row per cluster); the
    within-cluster top-a_g is one per-cluster rank window — skew bounded
    by cluster population, never the corpus; the allocation joins back as
    a broadcast. Returns the selected rows with ``sel_rank`` (0-based
    within-cluster quality rank).

    NULL ``cluster_col`` rows are DROPPED — they are excluded from the
    cluster counts and fall out of the inner allocation join, matching
    ``unimax_sample``'s convention (an unassigned row has no cluster to
    balance against; assign a sentinel cluster upstream to include them).
    """
    if budget < 1:
        raise ValueError("budget must be >= 1")
    if max_per_cluster is not None and max_per_cluster < 1:
        raise ValueError("max_per_cluster must be >= 1 when given")
    counts = {
        r[0]: int(r[1])
        for r in df.groupBy(cluster_col).agg(F.count(F.lit(1))).collect()
        if r[0] is not None
    }
    if not counts:
        raise ValueError("no non-null clusters")
    # epoch cap 1 = never take more than a cluster HAS; a tighter
    # max_per_cluster caps the waterfilling the same way
    capped = {
        g: min(n, max_per_cluster) if max_per_cluster is not None else n
        for g, n in counts.items()
    }
    alloc = unimax_allocation(capped, min(budget, sum(capped.values())), 1)
    spark = df.sparkSession
    group_type = df.schema[cluster_col].dataType.simpleString()
    alloc_df = spark.createDataFrame(
        sorted(alloc.items()), f"{cluster_col} {group_type}, __a long"
    )
    w = Window.partitionBy(cluster_col).orderBy(
        F.col(score_col).desc(), F.col(id_col).asc()
    )
    ranked = df.join(F.broadcast(alloc_df), cluster_col).withColumn(
        "__r", F.row_number().over(w) - 1
    )
    return (
        ranked.filter(F.col("__r") < F.col("__a"))
        .withColumn("sel_rank", F.col("__r").cast("long"))
        .drop("__r", "__a")
    )
