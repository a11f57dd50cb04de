"""Round-9 tier-1 compile-coverage tranche: undefined-operand semantics,
singleton predicates, index-array selection, nested-array flatten in
implicit mapping, scalar-step undefined, and the JSONata transform
operator ``|pattern|update, delete|`` (the reference SMT's record-update
shape — reference Transformation.java applies exactly this form per
record). The tier-2 interpreter is the semantics oracle throughout."""

import json

import pytest

from kafka_connect_jsonata_spark.jsonata.compiler import NotCompilable
from kafka_connect_jsonata_spark.jsonata.interpreter import UNDEFINED, jsonata
from kafka_connect_jsonata_spark.transform import transform


def _norm(v):
    if hasattr(v, "asDict"):
        return {k: _norm(x) for k, x in v.asDict().items()}
    if isinstance(v, dict):
        return {k: _norm(x) for k, x in v.items()}
    if isinstance(v, list):
        return [_norm(x) for x in v]
    if isinstance(v, float) and v == int(v) and abs(v) < 1e15:
        return int(v)
    return v


def _both_tiers(spark, expr, data):
    """Compile-tier value for ``expr`` over a one-row DataFrame of
    ``data``, plus the interpreter value — normalized for comparison."""
    df = (
        spark.createDataFrame([(json.dumps(data),)], "j string")
        .selectExpr(
            "from_json(j, schema_of_json('%s')) as root"
            # escape backslashes FIRST: a \n inside a JSON string must
            # reach schema_of_json as the two characters \ n, not a raw
            # control char (round-11: trailing-newline $match cases)
            % json.dumps(data).replace("\\", "\\\\").replace("'", "\\'")
        )
        .select("root.*")
    )
    c = transform(df, expr, force_tier="compiled")
    rows = c.collect()
    if len(c.columns) == 1 and c.columns[0] in ("__result", "value"):
        cval = [_norm(r[0]) for r in rows]
    else:
        cval = [_norm(r) for r in rows]
    want = jsonata(expr).evaluate(data)
    want = (
        [None]
        if want is UNDEFINED
        else [_norm(json.loads(json.dumps(want)))]
    )
    return cval, want


def _agree(cval, want):
    if cval == want:
        return True
    if want == [None] and cval in ([], [[]], [None]):
        return True  # documented empty-sequence convention (SURVEY §1.3)
    if len(cval) == 1 and isinstance(cval[0], list) and cval[0] == want:
        return True  # documented singleton-array convention
    return False


UNDEF_OPERAND_CASES = [
    # (expr, data) — every case must COMPILE and agree with tier 2
    ("'x' & nope", {"a": 1}),
    ("nope & 'x'", {"a": 1}),
    ("nope & nada", {"a": 1}),
    ("nothing = nothing", {"a": 1}),
    ("nothing != 1", {"a": 1}),
    ("1 != nothing", {"a": 1}),
    ("nothing in [1,2]", {"a": 1}),
    ("1 in nothing", {"a": 1}),
    ("nothing and a = 1", {"a": 1}),
    ("nothing or a = 1", {"a": 1}),
    ("nothing ? 'then' : 'else'", {"a": 1}),
    ("[1, undefinedthing, 2]", {"a": 1}),
    ("[undefinedthing]", {"a": 1}),
    ("{'x': nope + 1, 'y': a}", {"a": 7}),
    ("{'x': nope > 1}", {"a": 1}),
    ("{'x': nope * 2 - 1}", {"a": 1}),
    ("{'x': -nope}", {"a": 1}),
    ("{'x': $uppercase(nope)}", {"a": 1}),
    ("{'x': $substring(nope, 1)}", {"a": 1}),
    ("$count(nope + 1)", {"a": 1}),
    ("$exists(nope.deeper)", {"a": 1}),
    ("$uppercase(nope) & 'T'", {"a": 1}),
]


def test_undefined_operand_semantics_compile(spark):
    failures = []
    for expr, data in UNDEF_OPERAND_CASES:
        cval, want = _both_tiers(spark, expr, data)
        if not _agree(cval, want):
            failures.append((expr, cval, want))
    assert not failures, failures


def test_runtime_empty_filter_in_object_is_documented_conflation(spark):
    """`{'x': a[b = nope].b}`: the filter's pred resolves to a constant
    false, so the pair's value is RUNTIME-empty — the typed tier keeps the
    pair as SQL NULL where the interpreter omits it (the documented
    missing-vs-null static-schema deviation, SURVEY §4). Standalone (not
    in a constructor) the same expression agrees: NULL ≅ undefined."""
    cval, want = _both_tiers(spark, "{'x': a[b = nope].b}", {"a": {"b": 1}})
    assert cval == [{"x": None}] and want == [{}]
    cval, want = _both_tiers(spark, "a[b = nope].b", {"a": {"b": 1}})
    assert _agree(cval, want), (cval, want)


def test_undef_propagation_first_arg_only_guard(spark):
    """$substring('abc', nope) is 'abc' and $power(2, nope) throws in the
    interpreter — a raise escaping a LATER argument must not be folded as
    undefined (round-9 soundness guard: later args must be raise-free)."""
    df = spark.createDataFrame([("v",)], "a string")
    # later-arg absence -> NotCompilable (tier 2 owns the semantics)
    for expr in (
        "{'x': $substring('abc', nope)}",
        "{'x': $power(2, nope)}",
        "{'x': $contains('x', nope)}",
    ):
        with pytest.raises(NotCompilable):
            transform(df, expr, force_tier="compiled")
    # ... and tier 2 gives $substring('abc', nope) = 'abc', NOT omission
    out = transform(df, "{'x': $substring('abc', nope)}").first().asDict()
    val = next(iter(out.values()))
    if isinstance(val, str) and val.startswith("{"):
        val = json.loads(val)["x"]
    assert val == "abc"


def test_undef_propagating_fns_agree_with_tier2():
    """Every builtin in _UNDEF_PROPAGATING_FNS must actually propagate
    undefined through its FIRST argument in the interpreter."""
    from kafka_connect_jsonata_spark.jsonata.compiler import (
        _UNDEF_PROPAGATING_FNS,
    )

    two_arg = {
        "substring": "$substring(nope, 1)",
        "substringBefore": "$substringBefore(nope, 'x')",
        "substringAfter": "$substringAfter(nope, 'x')",
        "power": "$power(nope, 2)",
        "pad": "$pad(nope, 3)",
        "formatNumber": "$formatNumber(nope, '0')",
        "formatInteger": "$formatInteger(nope, '0')",
        "split": "$split(nope, ',')",
        "contains": "$contains(nope, 'x')",
    }
    for fn in sorted(_UNDEF_PROPAGATING_FNS):
        expr = two_arg.get(fn, f"${fn}(nope)")
        got = jsonata(expr).evaluate({"a": 1})
        assert got is UNDEFINED, (fn, got)


SINGLETON_AND_INDEX_CASES = [
    ("a[0]", {"a": 5}),
    ("a[-1]", {"a": 5}),
    ("a[b = 1]", {"a": {"b": 1}}),
    ("a[b = 2]", {"a": {"b": 1}}),
    ("a[b = 2].b", {"a": {"b": 1}}),
    ("{'x': a[3]}", {"a": 5}),
    ("a[[1..2]]", {"a": [10, 20, 30]}),
    ("a[[0, 2]]", {"a": [10, 20, 30]}),
    ("a[[2, 0]]", {"a": [10, 20, 30]}),  # array-position order
    ("a[[-1, 0]]", {"a": [10, 20, 30]}),
    ("a[[0, 0]]", {"a": [10, 20, 30]}),  # duplicate indices collapse
    ("a[[5]]", {"a": [10, 20, 30]}),  # out-of-range drops
]


def test_singleton_predicates_and_index_selection(spark):
    failures = []
    for expr, data in SINGLETON_AND_INDEX_CASES:
        cval, want = _both_tiers(spark, expr, data)
        if not _agree(cval, want):
            failures.append((expr, cval, want))
    assert not failures, failures


def test_nested_array_flatten_and_scalar_step(spark):
    data = {
        "Account": {
            "Order": [
                {
                    "Product": [
                        {"name": "p1", "price": 40},
                        {"name": "p2", "price": 10},
                    ]
                },
                {"Product": [{"name": "p3", "price": 35}]},
            ]
        },
        "foo": {"bar": 3},
    }
    for expr in (
        "Account.Order.Product.name",
        "Account.Order.Product[price > 30].name",
        "{'deep': foo.bar.baz, 'n': $count(foo.bar.baz)}",
    ):
        cval, want = _both_tiers(spark, expr, data)
        assert _agree(cval, want), (expr, cval, want)


TRANSFORM_OP_CASES = [
    ("payload ~> |$|{'n': n + 1}|", {"payload": {"n": 1, "z": "q"}}),
    ("$ ~> |a|{'n': 2}, ['z']|", {"a": {"n": 1, "z": "q"}, "k": 3}),
    ("$ ~> |a|{'n': 2}, 'z'|", {"a": {"n": 1, "z": "q"}, "k": 3}),
    ("$ ~> |a.b|{'n': n * 10}|", {"a": {"b": [{"n": 1}, {"n": 5}]}}),
    ("$ ~> |a|{'w': 9}|", {"a": {"n": 1}, "k": 3}),  # new field appends
    ("$ ~> |missing|{'n': 2}|", {"a": {"n": 1}}),  # no match -> unchanged
    ("$ ~> |a|{'n': n + k}|", {"a": {"n": 1, "k": 10}}),
    ("$ ~> |a|{}, ['z']|", {"a": {"n": 1, "z": "q"}}),  # delete-only
]


def test_transform_operator_compiles(spark):
    failures = []
    for expr, data in TRANSFORM_OP_CASES:
        cval, want = _both_tiers(spark, expr, data)
        if not _agree(cval, want):
            failures.append((expr, cval, want))
    assert not failures, failures


def test_merge_empty_and_eval_with_context_fold(spark):
    """$merge([]) compiles to the empty object, and $eval with an
    explicit LITERAL context folds (the inner expression's names resolve
    against that constant context, never the input)."""
    for expr, data in (
        ("$merge([])", {"a": 1}),
        ("$eval('a + 1', {'a': 2})", {"a": 99}),
        ("$eval('$', [1, 2])", {"a": 1}),
    ):
        cval, want = _both_tiers(spark, expr, data)
        assert _agree(cval, want), (expr, cval, want)


def test_eval_literal_constant_folds(spark):
    """$eval stays fold-impure in general (the evaluated string may read
    the input), but a LITERAL argument whose parse is itself constant
    folds through the interpreter at compile time (round 9)."""
    for expr, data in (
        ("$eval('[1,2,3]')", {"a": 1}),
        ("$eval('2 + 3 * 4')", {"a": 1}),
    ):
        cval, want = _both_tiers(spark, expr, data)
        assert _agree(cval, want), (expr, cval, want)
    # input-reading eval must NOT fold to a constant — but as of round 10
    # it COMPILES (the literal parses once, the inner AST compiles against
    # the root schema: _fn_eval) and reads the input per row
    dfx = spark.createDataFrame([(7,), (9,)], "a long")
    out = transform(dfx, "$eval('a + 1')", force_tier="compiled")
    assert sorted(r[0] for r in out.collect()) == [8, 10]
    # and the interpreter gives the same input-reading value
    got = jsonata("$eval('a + 1')").evaluate({"a": 7})
    assert got == 8
    # a DYNAMIC code string (the code is data) can never compile
    dfd = spark.createDataFrame([("a + 1", 7)], "code string, a long")
    with pytest.raises(NotCompilable):
        transform(dfd, "$eval(code)", force_tier="compiled")


def test_dynamic_key_objects_compile_to_maps(spark):
    """Single-pair dynamic-key object constructors ({type: number}) have
    no static struct but DO have a MapType — per-element via the dotted
    mapping form too. Multi-pair dynamic stays tier 2 (runtime D1009)."""
    data = {
        "Phone": [
            {"type": "home", "number": 11},
            {"type": "office", "number": 22},
        ]
    }
    for expr in ("Phone.{type: number}", "Phone.{'t': type, 'n': number}"):
        cval, want = _both_tiers(spark, expr, data)
        assert _agree(cval, want), (expr, cval, want)
    df = spark.createDataFrame([("k", 1)], "t string, n long")
    with pytest.raises(NotCompilable):
        transform(df, "{t: n, 'x': 1}", force_tier="compiled")
    # a dynamic-key UPDATE inside the transform operator must not silently
    # no-op through the empty-map branch — tier 2 owns it
    df2 = spark.createDataFrame(
        [(("x", 1),)], "a struct<t: string, n: long>"
    )
    with pytest.raises(NotCompilable):
        transform(df2, "$ ~> |a|{t: 9}|", force_tier="compiled")


def test_root_variable_resolves_to_root_in_nested_contexts(spark):
    """$$ must reference the ROOT input inside predicates, mapping steps,
    and the transform operator — not the local context (round-9 fix: it
    aliased the current ctx, so a[b = $$.t] read t off the element; the
    case only surfaced once _binary's undefined-operand catch made such
    predicates compilable)."""
    cases = [
        ("a[b = $$.t].b", {"a": [{"b": 1}, {"b": 2}], "t": 2}),
        ("a[b = $$.t].b", {"a": [{"b": 1}, {"b": 2}], "t": 9}),
        ("a.(b + $$.t)", {"a": [{"b": 1}, {"b": 2}], "t": 10}),
        ("$ ~> |a|{'n': n + $$.k}|", {"a": {"n": 1}, "k": 100}),
    ]
    for expr, data in cases:
        cval, want = _both_tiers(spark, expr, data)
        assert _agree(cval, want), (expr, cval, want)


def test_parent_step_compiles_on_struct_paths(spark):
    """B1.6 ``%`` as a direct path step over non-fanout struct paths
    compiles (the pre-step context is carried on the Typed). Round 10:
    nested paths inside block/constructor steps INHERIT the ancestry in
    both tiers (tier 2 seeds nested paths from %ancestry%, tier 1 passes
    the parent chain / elem_parents into the element context), so the
    `a.(%.z)` shape now compiles and agrees instead of routing to tier 2."""
    cases = [
        ("a.b.%.k", {"a": {"b": {"x": 1}, "k": 9}, "k": 3}),
        ("a.%", {"a": {"b": 1}, "z": 2}),
        ("a.b.%.%", {"a": {"b": {"x": 1}}, "z": 2}),
        ("{'p': a.b.%.k}", {"a": {"b": {"x": 1}, "k": 9}}),
        ("a.(%.z & '-' & b)", {"a": {"b": "B"}, "z": "Z"}),
    ]
    for expr, data in cases:
        cval, want = _both_tiers(spark, expr, data)
        assert _agree(cval, want), (expr, cval, want)
    df = spark.createDataFrame([(("B",), "Z")], "a struct<b: string>, z string")
    out = transform(df, "a.(%.z & '-' & b)", force_tier="compiled")
    assert out.collect()[0][0] == "Z-B"


def test_transform_operator_is_projection(spark):
    """The compiled transform operator must be a pure projection — no
    Python UDF (BatchEvalPython) in the plan."""
    df = spark.createDataFrame(
        [(1, (2, "x")), (2, (5, "y"))], "id long, a struct<n: long, z: string>"
    )
    out = transform(df, "$ ~> |a|{'n': n * 10}, ['z']|", force_tier="compiled")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "PythonUDF" not in plan
    rows = {r["id"]: r["a"].asDict() for r in out.collect()}
    assert rows == {1: {"n": 20}, 2: {"n": 50}}
