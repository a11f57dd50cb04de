"""JSONata -> pyspark Column compiler (tier 1).

Compiles the statically-typeable subset of JSONata to native Column
expressions so Catalyst sees a fully declarative plan: predicate pushdown,
column pruning, constant folding and whole-stage codegen all apply — zero
Python in the hot path. Anything outside the subset raises ``NotCompilable``
and the caller falls back to the interpreter UDF (tier 2).

Compilable subset (SURVEY.md §2B tables, "Spark" column):
- struct-field paths, literal array indexes, map lookup
- arithmetic / comparison / boolean / concat / conditional / in / range
- ``:=`` bindings inside blocks (inlined driver-side)
- object and array constructors
- the scalar function library (string/numeric/boolean rows of §2B4)
- aggregation + higher-order functions over array columns
  ($sum/$max/$min/$average/$count/$map/$filter/$reduce/$distinct/...)

Also compiled: ``^(...)`` order-by over array columns, object fns
($merge/$sift/$each/$spread — struct cases resolve statically), $replace
with literal patterns and with regex group references (in-range ``$N``,
``$$``, literal ``$``), $type from the static schema, block-bound lambdas
(``$f := function..`` — inlined by substitution at invocation and HOF
sites, builtin references like ``$map(a, $uppercase)`` included), $sort
with a comparator (array_sort 3-way, stable), $reduce first-element init,
single-pair group-by constructors ``seq{k: v}`` with string keys and
scalar-typed values (-> MapType), $match with literal anchor/lookaround-
free patterns (index reconstructed by a locate() fold), and the
zero-padded digit pictures of $formatInteger/$parseInteger.

Additionally (round 8), any provably-CONSTANT subtree — no context/root
reads, no data-bound variables, no impure builtins — is evaluated once at
compile time through the tier-2 interpreter and emitted as a typed literal
Column (the JSONata-level analogue of Catalyst's ConstantFolding; see
``_const_subtree``/``_fold_lit``). This covers constant word/roman/ordinal
integer pictures, exponent-notation number pictures, constant recursion
($fib-style blocks), and wildcard/descendant steps over literal objects, at
tier-2 exactness.

Round 10 widens the path surface: ``%`` parent inside constructor /
expression steps — the jsonata-docs idiom ``Product.{'O': %.OrderID}`` —
compiles, including across fan-out levels (nested transforms carrying
per-element parents, ``_fanout_parent_step`` — round 10 one level,
round 11 ANY depth: ``a.b.c.{'t': %.%.t}``; constant-parent arrays
carry ``Typed.elem_parents``); positional/focus binds crossing an
outer fan-out (``items.parts#$i`` — global enumeration over the flattened
inner path); and ``$eval`` with a LITERAL expression string compiles
against the root schema or a schema-stable context argument (``_fn_eval``).

Deliberately NOT compiled (fall back to tier 2) when DATA-dependent:
implicit array mapping with singleton unwrap, ``**`` with no name step
as a VALUE (its CARDINALITY compiles: $count(**)/$exists(**), round
11), multi-pair or sequence-valued group-by
(runtime D1009 / dynamic singleton unwrap), row-sequence order-by,
recursion, ``$eval`` of a DYNAMIC code string (the code is data),
words/roman/ordinal integer pictures, $match with lookaround / interior
anchors / zero-length or group-under-alternation patterns ($match with
EDGE anchors — ^-prefixed / $-suffixed, at most one match at a known
index — compiles as of round 10), $replace with out-of-range group
references ($replace group refs UNDER a limit compile round 10: split
finds the N-th-match boundary, regexp_replace rewrites the head).
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

from kafka_connect_jsonata_spark.jsonata.parser import parse


class NotCompilable(Exception):
    """Expression (or subtree) outside the tier-1 subset."""


class StaticallyUndefined(NotCompilable):
    """A path step that is PROVABLY undefined from the static schema (field
    absent from a struct). Handlers that have a defined JSONata semantics
    for undefined inputs — object constructors omit the pair, $count is 0,
    $exists is false — catch this and fold the constant (round 7); any
    other context falls through to tier 2 like plain NotCompilable.

    Catch sites MUST gate on :func:`_pure_path_node`: undefined propagates
    through path steps, but NOT through most operators (``b = 1`` is false,
    ``b & 'x'`` is ``'x'``, ``b ? 1 : 2`` is 2) — folding an expression
    whose undefined-ness passed through such an operator would be wrong
    (review finding, round 7)."""


class ProvablyUndefinedValue(StaticallyUndefined):
    """Raised when :meth:`Compiler._fold` EVALUATED a provably-constant
    subtree through the tier-2 interpreter and the result was undefined
    (round 12). Unlike a plain :class:`StaticallyUndefined` escaping an
    arbitrary inner position, this is a direct proof that the NODE'S OWN
    VALUE is undefined. The proof names its node (``self.node``): catch
    sites accept it ONLY for that exact AST node (round 13 — an untagged
    acceptance let a proof for ``$keys({})`` escape through ``$zip``,
    whose undefined-arg result is DEFINED, and wrongly fold the whole
    enclosing expression). Positions through which undefined provably
    propagates re-tag via :func:`_reraise_propagated`. Valid in
    open-world mode too: the subtree was constant, so no open field
    existence was assumed."""

    def __init__(self, msg: str, node: dict | None = None):
        super().__init__(msg)
        self.node = node


def _proves_undef(exc: Exception, node: dict) -> bool:
    """Gate for StaticallyUndefined catch sites with a SINGLE raising
    child: the child's value is proven undefined either by evaluation
    (a :class:`ProvablyUndefinedValue` tagged with THIS node — an
    evaluation proof is only a proof about the node it was raised for)
    or syntactically (:func:`_undef_value_node`)."""
    return (
        isinstance(exc, ProvablyUndefinedValue)
        and getattr(exc, "node", None) is node
    ) or _undef_value_node(node)


def _reraise_propagated(exc: Exception, inner_node: dict, outer_node: dict):
    """Re-raise ``exc`` from a position where undefined provably
    propagates (f(undefined) -> undefined): when ``exc`` proves
    ``inner_node``'s value undefined, the proof transfers to
    ``outer_node``, so raise a fresh :class:`ProvablyUndefinedValue`
    tagged with it; otherwise re-raise unchanged (the outer catch sites
    fall back to the syntactic gate / tier 2)."""
    if _proves_undef(exc, inner_node):
        raise ProvablyUndefinedValue(
            str(exc) or "propagated undefined", node=outer_node
        ) from exc
    raise exc


def _pure_path_node(node: dict) -> bool:
    """True when the raw AST node is a bare path (name / name.name...) —
    the only shape whose static absence implies the VALUE of the whole
    node is undefined."""
    t = node.get("type")
    if t == "name":
        return True
    if t == "path_op":
        return _pure_path_node(node["lhs"]) and node["rhs"].get("type") == "name"
    return False


# builtins through which undefined PROPAGATES (f(undefined) -> undefined),
# verified one-by-one against the tier-2 interpreter in
# tests/test_round9_compile.py::test_undef_propagating_fns_agree_with_tier2.
# NOT in this set (defined results on undefined input): $count -> 0,
# $exists -> false, $boolean -> false, $append -> the other operand,
# $join -> '', $sum -> 0 over empty.
_UNDEF_PROPAGATING_FNS = frozenset(
    {
        "uppercase", "lowercase", "trim", "length", "substring",
        "substringBefore", "substringAfter", "string", "number", "abs",
        "floor", "ceil", "round", "sqrt", "power", "not", "pad",
        "formatNumber", "formatBase", "formatInteger", "split", "contains",
        # round 12: array fns that map undefined -> undefined (NOT $zip,
        # which gives [])
        "distinct", "reverse", "sort", "shuffle",
    }
)


def _undef_value_node(node: dict) -> bool:
    """True when a :class:`StaticallyUndefined` escaping this node's compile
    implies the node's VALUE is undefined for every row. Undefined
    propagates through path steps, predicates over a path, arithmetic,
    order comparison (``<`` ``<=`` ``>`` ``>=``), unary minus, and the
    :data:`_UNDEF_PROPAGATING_FNS` builtins. It does NOT propagate through
    ``=``/``!=``/``in`` (false), ``&`` (''), ``and``/``or`` (falsy),
    ``?:`` (else branch), or aggregate-style builtins — but those handlers
    resolve the exception INTERNALLY and never re-raise it, so any escape
    from such a subtree can only have come from a propagating position.
    Each recursive arm requires EVERY child that could raise to be
    propagation-sound (literals cannot raise, so they pass trivially):
    the catch site cannot tell which child raised."""
    t = node.get("type")
    if t in ("number", "string", "value", "regex", "variable"):
        # literals cannot raise StaticallyUndefined themselves; a variable
        # CAN since round 13 (unbound / _UNDEF_BINDING -> node-tagged
        # ProvablyUndefinedValue), and that proof is precisely "this
        # node's value is undefined", so the trivial True stays correct.
        # A NAME STEP over one ($$.t) can and does propagate.
        return True
    if t == "name":
        return True
    if t == "path_op":
        return _undef_value_node(node["lhs"]) and _undef_value_node(node["rhs"])
    if t == "filter":
        # undefined[pred] -> undefined; and a pred whose VALUE is provably
        # undefined matches nothing -> empty sequence -> undefined. Each
        # child must be either raise-free or propagation-sound.
        ok_expr = _undef_value_node(node["expr"]) or not _node_can_raise(
            node["expr"]
        )
        ok_pred = _undef_value_node(node["predicate"]) or not _node_can_raise(
            node["predicate"]
        )
        return ok_expr and ok_pred
    if t == "binary" and node.get("value") in ("+", "-", "*", "/", "%",
                                               "<", "<=", ">", ">="):
        return _undef_value_node(node["lhs"]) and _undef_value_node(node["rhs"])
    if t == "unary" and node.get("value") == "-":
        return _undef_value_node(node["expression"])
    if (
        t == "call"
        and node.get("procedure", {}).get("type") == "variable"
        and node["procedure"]["value"] in _UNDEF_PROPAGATING_FNS
        and node["arguments"]
    ):
        # propagation is verified for the FIRST argument only —
        # $substring('abc', nope) is 'abc' and $power(2, nope) throws
        # T0410, so a raise escaping a later argument is NOT a proof of
        # undefined value: later arguments must be raise-free.
        args = node["arguments"]
        return _undef_value_node(args[0]) and not any(
            _node_can_raise(a) for a in args[1:]
        )
    return False


def _contains_parent(node) -> bool:
    """Does this subtree reference the ``%`` parent operator anywhere?
    Used to route fan-out expression steps through the nested-transform
    compile (which carries per-element parents) only when needed."""
    if isinstance(node, (list, tuple)):
        return any(_contains_parent(x) for x in node)
    if not isinstance(node, dict):
        return False
    if node.get("type") == "parent":
        return True
    return any(
        _contains_parent(v)
        for v in node.values()
        if isinstance(v, (dict, list, tuple))
    )


def _node_can_raise(node) -> bool:
    """Conservatively: does this subtree contain any name/path step OR
    filter node (the sources of StaticallyUndefined — a filter can raise
    without any name present: a constant out-of-range index into a
    singleton, e.g. ``$v[5]`` with ``$v`` env-bound to a scalar; round-10
    advisor fix)? Since round 12, CALL nodes can raise too: a provably-
    constant call like ``$keys({})`` evaluates through :meth:`_fold`,
    which raises :class:`ProvablyUndefinedValue` when the value is
    undefined — so calls count as raise-capable (round 13). Used to rule
    out escapes from non-propagating positions inside
    :func:`_undef_value_node` arms."""
    if isinstance(node, (list, tuple)):
        return any(_node_can_raise(x) for x in node)
    if not isinstance(node, dict):
        return False
    if node.get("type") in ("name", "filter", "call", "variable"):
        # variables raise since round 13: an unbound variable (or an
        # _UNDEF_BINDING lambda param) raises a node-tagged
        # ProvablyUndefinedValue
        return True
    return any(
        _node_can_raise(v)
        for v in node.values()
        if isinstance(v, (dict, list, tuple))
    )


def shortest_repr_parts(a: Column) -> tuple[Column, Column, Column]:
    """Shortest round-trip decimal digits of a NON-NEGATIVE double column:
    returns ``(digits, k, L)`` — the digit string (no point, no trailing
    zeros), the decimal exponent (value = 0.digits x 10^(k+1), i.e. the
    point sits after the first digit at 10^k), and the digit count. The
    minimal-precision %e search + tie-to-even correction documented on
    :func:`js_canonical_number`; shared by the zero-pad $formatNumber
    big-magnitude path (round-7 review fix)."""
    cands = [F.format_string(f"%.{i}e", a) for i in range(17)]
    sci = cands[16]
    for c in reversed(cands[:-1]):
        sci = F.when(c.cast("double") == a, c).otherwise(sci)
    mant = F.substring_index(sci, "e", 1)
    exp_s = F.substring_index(sci, "e", -1)
    k = exp_s.cast("int")
    digits = F.regexp_replace(mant, r"\.", "")
    L = F.length(digits)
    # tie-to-even correction: extended-precision digits (L + 30)
    wide = F.format_string("%.46e", a)  # 47 sig digits >= any L+30
    wdigits = F.regexp_replace(F.substring_index(wide, "e", 1), r"\.", "")
    tie = (wdigits.substr(L + 1, F.lit(1)) == F.lit("5")) & wdigits.substr(
        L + 2, F.lit(30)
    ).rlike("^0*$")
    last = F.substring(digits, -1, 1).cast("int")
    m_lo = F.concat(
        mant.substr(F.lit(1), F.length(mant) - 1),
        (last - 1).cast("string"),
    )
    c_lo = F.concat(m_lo, F.lit("e"), exp_s)
    use_lo = tie & (last % 2 == 1) & (c_lo.cast("double") == a)
    digits = F.when(
        use_lo, F.regexp_replace(m_lo, r"\.", "")
    ).otherwise(digits)
    # (L is unchanged: the decremented candidate has the same digit count)
    return digits, k, L


def js_canonical_number(x: Column) -> Column:
    """JS ``Number#toString`` (JSONata $string) of a double column as a pure
    JVM expression — round-7 compiled replacement for the tier-2 fallback
    that any ``$string(number)`` subtree used to force.

    Java 17's ``Double.toString`` (what ``cast(string)`` uses) sometimes
    prints MORE digits than the shortest round-trip form (pre-JDK-19
    algorithm; ~0.3% of random doubles, fuzz-measured), so the digits come
    from a minimal-precision search instead: the first of
    ``format_string('%.Ne', x)`` for N=0..16 whose parse equals x — i.e.
    exactly Python/JS shortest-repr digits. Two corrections make it
    bit-exact with tier 2's ``js_number_string``:

    - Decimal-tie break: Java %e rounds HALF_UP; shortest-repr breaks an
      exact decimal tie TO EVEN (6-in-120k fuzz hits). A tie is confirmed
      by an extended-precision format (digit N+1 == '5', next 30 digits all
      zero — a double whose expansion has a '5' + 30 zeros + nonzero tail
      at exactly that position does not exist within 2^53 mantissas), and
      the decremented last digit is preferred when it also round-trips and
      is even.
    - JS form: plain decimal iff 1e-6 <= |x| < 1e21 (tier 2's exact
      boundary), else ``d.ddde±k`` with no exponent zero-padding.

    PRECISION CONTRACT (documented tier deviation, like the sweep's
    null-conflation set): the rendering is bit-exact with tier 2 for every
    double whose shortest representation needs <= 15 significant digits —
    fuzz-pinned (tests/test_jsonata_conformance.py::
    test_compiled_number_rendering_matches_tier2): 0 mismatches in 400k
    uniform + 487k random-mantissa plain-range + full exponent-ladder
    samples. For adversarial 16-17-digit doubles, Java %e's digit source
    (pre-JDK-19 FloatingDecimal, which itself over-prints ~0.3% of such
    values — the reason a bare cast(string) was NotCompilable through
    round 6) can differ from the true closest candidate by one unit in
    the last decimal place (~5e-5 of random 64-bit patterns, measured);
    BOTH renderings parse back to the identical double. Exact parity
    there requires exact-rational closest-candidate selection (shipped in
    JDK 19's Ryu; not expressible in Catalyst on Java 17).
    """
    digits, k, L = shortest_repr_parts(F.abs(x))
    a = F.abs(x)
    # --- JS formatting ------------------------------------------------------
    plain = (a >= 1e-6) & (a < 1e21)
    body = (
        F.when(x == 0, F.lit("0"))
        .when(
            plain & (k >= L - 1),
            F.concat(digits, F.repeat(F.lit("0"), k - L + 1)),
        )
        .when(
            plain & (k >= 0),
            F.concat(
                digits.substr(F.lit(1), k + 1),
                F.lit("."),
                digits.substr(k + 2, L),
            ),
        )
        .when(
            plain,
            F.concat(F.lit("0."), F.repeat(F.lit("0"), -k - 1), digits),
        )
        .otherwise(
            F.concat(
                digits.substr(F.lit(1), F.lit(1)),
                F.when(
                    L > 1, F.concat(F.lit("."), digits.substr(F.lit(2), L))
                ).otherwise(F.lit("")),
                F.lit("e"),
                F.when(k >= 0, F.lit("+")).otherwise(F.lit("-")),
                F.abs(k).cast("string"),
            )
        )
    )
    signed = F.when((x < 0) & ~(x == 0), F.concat(F.lit("-"), body)).otherwise(
        body
    )
    # tier 2 raises D3001 on non-finite input; mirror it
    return F.when(
        F.isnan(x) | (a == float("inf")),
        F.raise_error(F.lit("D3001: number is not finite")).cast("string"),
    ).otherwise(signed)


@dataclass
class Typed:
    col: Column
    dtype: T.DataType | None  # None = unknown/any
    # compile-time parent-context chain for the ``%`` step (round 9):
    # name steps over a STRUCT/MAP context append the pre-step context;
    # fan-out steps (implicit array mapping, filters, wildcards) reset to
    # () because each element's parent differs per row — ``%`` after one
    # of those compiles only through the one-fan-out nested-transform path
    # (round 10) and otherwise stays tier 2
    parents: tuple = ()
    # parent chain OF THE ELEMENTS of an array-typed value, when that
    # chain is CONSTANT across elements (the array was an array-valued
    # field of a single struct). A per-element expression step passes this
    # into each element's compile context so `a.lines.{'x': %.id}` with
    # `a` a struct compiles (round 10); a real fan-out leaves it () —
    # each element's parent differs — and `%` under it routes through the
    # nested-transform special case or tier 2.
    elem_parents: tuple = ()


class _UndefArg(Typed):
    """Sentinel :class:`Typed` marking a function argument whose value is
    PROVABLY undefined (schema-absent path) — distinct from a literal null
    VALUE, which also compiles to a NullType column. Only produced by
    ``_call.arg_of`` for handlers that opt in ($append)."""


@dataclass
class CompiledLambda:
    """A lambda bound to a variable inside a block (``$f := function..``),
    kept as raw AST + captured compile-time env so later invocations and
    HOF references inline it (closures compile by substitution)."""

    params: list
    body: dict
    env: dict
    sig: str | None = None  # raw "<n?>"-style signature, for optionality


# binding marker for a lambda parameter whose argument is PROVABLY
# undefined (or absent): referencing the variable raises a node-tagged
# ProvablyUndefinedValue, exactly like tier 2 binding UNDEFINED (round 13)
_UNDEF_BINDING = object()


class Compiler:
    def __init__(self, schema: T.StructType, closed_world: bool = True):
        """``closed_world=False`` marks the schema as PARTIAL (open-world):
        a field absent from it is merely out of compile scope, not provably
        undefined, so absence raises plain :class:`NotCompilable` (route to
        tier 2) instead of :class:`StaticallyUndefined` (fold a constant).
        The envelope hybrid tier compiles against a 3-scalar-field slice of
        the 8-field envelope and MUST use this mode — with the closed-world
        default, ``{'topic': value.type = 'order' ? 'a' : 'b'}`` would fold
        ``value.type`` to undefined and emit the constant ``'b'`` for every
        record (round-10 advisor fix). Type-based proofs (stepping into a
        scalar, out-of-range constant index into a singleton) stay
        StaticallyUndefined in both modes: the declared types ARE
        trustworthy, only field EXISTENCE is open."""
        self.schema = schema
        self.closed_world = closed_world

    def _absent(self, msg: str):
        raise (StaticallyUndefined if self.closed_world else NotCompilable)(msg)

    def compile(self, source: str) -> Typed:
        return self.compile_ast(parse(source))

    def compile_ast(self, ast: dict) -> Typed:
        """Compile an already-parsed AST (used by the envelope hybrid tier,
        which compiles sub-expressions of a larger dynamic-tier AST)."""
        root = Typed(F.struct(*[F.col(f.name) for f in self.schema.fields]), self.schema)
        # $$ resolves to the ROOT input everywhere — inside predicates,
        # transform lambdas, and path steps the current ctx differs
        # (round-9 fix: $$ used to alias the current ctx, which is only
        # correct at the top level; a[b = $$.t] read t off the ELEMENT)
        self._root_ctx = root
        try:
            return self._c(ast, root, {})
        except StaticallyUndefined as _e:
            # round 12: the TOP level is the ultimate catch site — an
            # expression whose WHOLE value is provably undefined for every
            # row (`5 + nothing`, `a.b.c` stepping into a scalar) compiles
            # to a constant NULL (the A4 tombstone / undefined rendering),
            # exactly what the interpreter tier produces row by row. Gated
            # on _undef_value_node like every other catch site: shapes
            # where undefined does NOT propagate resolve inside their own
            # handlers and never re-raise.
            if _proves_undef(_e, ast):
                return Typed(F.lit(None).cast("string"), T.StringType())
            raise

    def _fold(self, node):
        """Evaluate a provably-constant subtree once through the tier-2
        interpreter (bounded 1 s guard — a pathological constant like a
        deep $fib falls through to the normal compile path / tier 2) and
        lift the value to a typed literal. None = could not fold; the
        caller continues with the structural compile."""
        from kafka_connect_jsonata_spark.jsonata.interpreter import (
            UNDEFINED,
            Jsonata,
        )

        try:
            v = Jsonata(node, timeout_ms=1000).evaluate({})
        except Exception:
            return None
        if v is UNDEFINED:
            # evaluation PROVED the constant's value is undefined — the
            # strongest form of the StaticallyUndefined proof (round 12):
            # $keys('str'), $spread([]) etc. fold through the same catch
            # sites as schema-absent paths
            raise ProvablyUndefinedValue(
                "constant subtree evaluates to undefined", node=node
            )
        return _fold_lit(v)

    # ------------------------------------------------------------------ core
    def _c(self, node, ctx: Typed, env: dict) -> Typed:
        t = node["type"]
        if t in _FOLDABLE and _const_subtree(node, env, frozenset(), False):
            folded = self._fold(node)
            if folded is not None:
                return folded
        if t == "number":
            v = node["value"]
            return Typed(F.lit(v), T.LongType() if isinstance(v, int) else T.DoubleType())
        if t == "string":
            return Typed(F.lit(node["value"]), T.StringType())
        if t == "value":
            if node["value"] is None:
                return Typed(F.lit(None), T.NullType())
            return Typed(F.lit(node["value"]), T.BooleanType())
        if t == "variable":
            name = node["value"]
            if name == "":
                return ctx  # $ — the current context
            if name == "$":
                # $$ — the root input (falls back to ctx when compiling a
                # detached sub-expression with no recorded root)
                return getattr(self, "_root_ctx", None) or ctx
            if name in env:
                bound = env[name]
                if bound is _UNDEF_BINDING:
                    raise ProvablyUndefinedValue(
                        f"undefined binding ${name}", node=node
                    )
                return bound
            from kafka_connect_jsonata_spark.jsonata import functions as _lib

            if name in _lib.REGISTRY or hasattr(self, "_fn_" + name):
                # a bare builtin reference is a FUNCTION value, not
                # undefined — only tier 2 can represent it
                raise NotCompilable(f"bare function reference ${name}")
            # jsonata-js: referencing an undeclared variable is not an
            # error — it evaluates to undefined (round 13); bindings are
            # fully static in this compiler, so unbound here means
            # unbound at runtime
            raise ProvablyUndefinedValue(
                f"unbound variable ${name}", node=node
            )
        if t == "name":
            r = self._field(ctx, node["value"])
            if isinstance(ctx.dtype, (T.StructType, T.MapType)):
                # non-fanout step: record the pre-step context so a later
                # ``%`` can address it (B1.6, round 9). An array-valued
                # result also records the chain as its ELEMENTS' constant
                # parent chain (round 10): every element of a.lines has
                # parent a.
                chain = getattr(ctx, "parents", ()) + (ctx,)
                return Typed(r.col, r.dtype, chain, elem_parents=chain)
            return r
        if t == "parent":
            ps = getattr(ctx, "parents", ())
            if not ps:
                raise NotCompilable(
                    "% parent outside a compiled non-fanout struct path"
                )
            return ps[-1]
        if t == "wildcard":
            return self._wildcard(ctx)
        if t == "path_op":
            rhs_node = node["rhs"]
            # schema-driven ** compilation (round 8, SURVEY B1.5): `**.f`
            # enumerates every schema position of field `f` in the
            # interpreter's pre-order and emits them as one array Column —
            # arrays in the path fan out via transform+flatten, so the
            # plan stays a pure projection. Bare `**` (no name step) has
            # no single static type -> tier 2.
            if node["lhs"]["type"] == "descendant" and rhs_node["type"] == "name":
                return self._descendant_field(ctx, rhs_node["value"])
            if (
                node["lhs"]["type"] == "path_op"
                and node["lhs"]["rhs"]["type"] == "descendant"
                and rhs_node["type"] == "name"
            ):
                src = self._c(node["lhs"]["lhs"], ctx, env)
                return self._descendant_field(src, rhs_node["value"])
            if node["lhs"]["type"] in ("index_bind", "context_bind"):
                # positional (#$i) / focus (@$v) binds at THIS path level
                # (round 9, B1.8): the bound sequence comes from the current
                # single context item, so tier 2's global enumeration over
                # the step's result sequence coincides with the array
                # position / element — compiled as one transform() carrying
                # the bind through the child env.
                return self._bound_step(node["lhs"], rhs_node, ctx, env)
            if (
                node["lhs"]["type"] == "path_op"
                and node["lhs"]["rhs"]["type"] in ("index_bind", "context_bind")
            ):
                # bind crossing an OUTER fan-out (items.parts#$i.RHS —
                # round 10, verdict item 5): tier 2 enumerates $i over the
                # step's COMBINED result sequence spanning parents, which
                # is exactly the compiled flat sequence of the whole inner
                # path — rewrite bind(expr=parts) under items as
                # bind(expr=items.parts) and reuse _bound_step. A bind
                # referenced beyond the immediately-following step raises
                # unbound -> tier 2 (never a wrong value).
                ib = node["lhs"]["rhs"]
                merged = {
                    **ib,
                    "expr": {
                        "type": "path_op",
                        "lhs": node["lhs"]["lhs"],
                        "rhs": ib["expr"],
                        "pos": ib.get("pos", 0),
                    },
                }
                return self._bound_step(merged, rhs_node, ctx, env)
            try:
                lhs = self._c(node["lhs"], ctx, env)
            except NotCompilable:
                # `*.*` / `*.name` where the FIRST wildcard's members are
                # type-heterogeneous: the fan-out is static, so fuse the
                # two steps per schema field and unify only the final
                # leaves (round 12)
                if node["lhs"]["type"] == "wildcard":
                    fused = self._wildcard_fuse(ctx, rhs_node)
                    if fused is not None:
                        return fused
                raise
            if (
                isinstance(lhs.dtype, T.ArrayType)
                and rhs_node["type"]
                in ("object", "array", "call", "block", "condition", "binary", "unary")
                and not getattr(lhs, "elem_parents", ())
                and _contains_parent(rhs_node)
            ):
                # `%` under a REAL fan-out (each element's parent differs):
                # the flattened lhs has lost per-element parents — recompile
                # as a nested transform that carries each parent alongside
                # (round 10, one fan-out level). None -> the generic branch
                # below, where the parent step raises NotCompilable (tier 2).
                nested = self._fanout_parent_step(node, ctx, env)
                if nested is not None:
                    return nested
            if rhs_node["type"] == "object" and isinstance(lhs.dtype, T.ArrayType):
                # dotted object constructor maps PER ELEMENT (jsonata docs:
                # Phone.{type: number} -> one object per phone) — compile
                # the constructor against the element context inside a
                # transform(). Mirrors the round-5 interpreter fix; the
                # un-dotted group-by suffix is a distinct "group" node.
                elem_t = lhs.dtype.elementType
                dts_box: list = []

                def build(x):
                    # delegate to the object-constructor compile so the
                    # per-element form shares its full semantics: literal
                    # keys -> struct, single-pair dynamic key -> MapType
                    # (round 9), statically-undefined pair omission.
                    # Elements inherit the array's constant parent chain
                    # (round 10: `%` inside the constructor).
                    r = self._c(
                        rhs_node,
                        Typed(x, elem_t, parents=getattr(lhs, "elem_parents", ())),
                        env,
                    )
                    dts_box.append(r.dtype)
                    return r.col

                col = F.transform(lhs.col, build)
                return Typed(col, T.ArrayType(dts_box[0]))
            if rhs_node["type"] == "array" and isinstance(lhs.dtype, T.ArrayType):
                # `seq.[...]` maps the constructor per element too
                # ([1..2].[$] -> [[1],[2]]; round-5 dual-tier sweep fix)
                elem_t = lhs.dtype.elementType
                et_box: list = []

                def build_arr(x):
                    ectx = Typed(
                        x, elem_t, parents=getattr(lhs, "elem_parents", ())
                    )
                    items = [
                        self._c(e, ectx, env)
                        for e in rhs_node["expressions"]
                    ]
                    et_box.append(
                        items[0].dtype if items else T.StringType()
                    )
                    return F.array(*[i.col for i in items])

                col = F.transform(lhs.col, build_arr)
                return Typed(col, T.ArrayType(T.ArrayType(et_box[0] or T.StringType())))
            if rhs_node["type"] == "filter" and isinstance(
                lhs.dtype, T.ArrayType
            ):
                # a [pred] bound to a STEP under a fan-out applies PER
                # ITEM — each item's step result is its own sequence, the
                # index/predicate applies within it, and only then does
                # the path flatten (round-11 suite port: a.b[0] over
                # a=[{b:[1,2]},{b:[3,4]}] is [1,3]; the old route
                # flattened first and answered 1. For boolean predicates
                # filter∘flatten ≡ flatten∘filter, so those keep their
                # values).
                elem_t = lhs.dtype.elementType
                fdt_box: list = []

                def build_filt(x):
                    r = self._c(
                        rhs_node,
                        Typed(
                            x,
                            elem_t,
                            parents=getattr(lhs, "elem_parents", ()),
                        ),
                        env,
                    )
                    fdt_box.append(r.dtype)
                    return r.col

                col = F.transform(lhs.col, build_filt)
                res_t = fdt_box[0]
                if isinstance(res_t, T.ArrayType):
                    col = F.flatten(F.filter(col, lambda r: r.isNotNull()))
                    return Typed(col, res_t)
                return Typed(
                    F.filter(col, lambda r: r.isNotNull()),
                    T.ArrayType(res_t),
                )
            if rhs_node["type"] in (
                "call",
                "block",
                "condition",
                "binary",
                "unary",
            ) and isinstance(lhs.dtype, T.ArrayType):
                # a function-call / parenthesized-expression / conditional
                # step maps per element like every other dotted step
                # ([1,2,3].$string($) -> ['1','2','3']; a.($ * 2) doubles
                # each element — round 9 widened this branch from calls to
                # the other expression step kinds, which previously
                # compiled against the WHOLE array and failed analysis).
                # The whole-array form is the ARGUMENT position,
                # $string(arr).
                elem_t = lhs.dtype.elementType
                dt_box: list = []

                def build_call(x):
                    res = self._c(
                        rhs_node,
                        Typed(x, elem_t, parents=getattr(lhs, "elem_parents", ())),
                        env,
                    )
                    dt_box.append(res.dtype)
                    return res.col

                col = F.transform(lhs.col, build_call)
                res_t = dt_box[0] or T.StringType()
                if isinstance(res_t, T.ArrayType):
                    # path-step sequences flatten in JSONata:
                    # ['a b','c d'].$split($,' ') -> ['a','b','c','d'], not
                    # [['a','b'],['c','d']].  Drop per-element empty results
                    # (null in tier 1) before flattening — the interpreter
                    # drops empty sequences from the result sequence.
                    col = F.flatten(F.filter(col, lambda r: r.isNotNull()))
                    return Typed(col, res_t)
                return Typed(col, T.ArrayType(res_t))
            # round 10: nested paths inside a block/expression step INHERIT
            # the enclosing ancestry in tier 2 now (the jsonata-docs parent
            # idiom `Product.{'O': %.OrderID}`), so the parent chain flows
            # through instead of being stripped
            return self._c(rhs_node, lhs, env)
        if t == "keep_array":
            # `a[]` pins array-ness: a singleton result stays a one-element
            # array (tier 2 sets keep_singleton on the sequence); an array
            # result is already a sequence and passes through. Undefined
            # stays undefined (SQL NULL), not [].
            inner = self._c(node["expr"], ctx, env)
            if isinstance(inner.dtype, T.ArrayType):
                return inner
            return Typed(
                F.when(inner.col.isNotNull(), F.array(inner.col)),
                T.ArrayType(inner.dtype or T.StringType()),
            )
        if t == "filter":
            return self._filter(node, ctx, env)
        if t == "binary":
            return self._binary(node, ctx, env)
        if t == "unary":
            try:
                inner = self._c(node["expression"], ctx, env)
            except StaticallyUndefined as _e:
                # -undefined is undefined: transfer the proof to this node
                _reraise_propagated(_e, node["expression"], node)
            return Typed(-inner.col, inner.dtype)
        if t == "condition":
            try:
                cond = self._c(node["condition"], ctx, env)
            except StaticallyUndefined as _e:
                # an undefined condition is falsy -> the else branch
                # (round 9; `nothing ? 1 : 2` -> 2 in the interpreter)
                if not _proves_undef(_e, node["condition"]):
                    raise
                if node["else"] is None:
                    # no else branch -> the whole expression is undefined;
                    # the proof about the condition transfers to this node
                    _reraise_propagated(_e, node["condition"], node)
                return self._c(node["else"], ctx, env)
            then = self._c(node["then"], ctx, env)
            els = (
                self._c(node["else"], ctx, env)
                if node["else"] is not None
                else Typed(F.lit(None), then.dtype)
            )
            return Typed(
                F.when(self._truthy(cond), then.col).otherwise(els.col), then.dtype
            )
        if t == "block":
            child = dict(env)
            result = None
            for expr in node["expressions"]:
                if expr["type"] == "bind":
                    rhs = expr["rhs"]
                    if rhs["type"] == "lambda":
                        # keep the lambda as AST + captured env; invocations
                        # and HOF references inline it later
                        child[expr["var"]] = CompiledLambda(
                            rhs["args"],
                            rhs["body"],
                            dict(child),
                            rhs.get("signature"),
                        )
                        result = None  # a block VALUE of lambda type: tier 2
                        continue
                    if rhs["type"] == "variable":
                        # alias of a bound lambda or of a builtin function
                        # ($f := $uppercase) — keep it callable
                        bound = child.get(rhs["value"])
                        if isinstance(bound, CompiledLambda):
                            child[expr["var"]] = bound
                            result = None
                            continue
                        if rhs["value"] not in child and hasattr(
                            self, "_fn_" + rhs["value"]
                        ):
                            child[expr["var"]] = self._builtin_as_lambda(
                                rhs["value"], child
                            )
                            result = None
                            continue
                    child[expr["var"]] = self._c(rhs, ctx, child)
                    result = child[expr["var"]]
                else:
                    try:
                        result = self._c(expr, ctx, child)
                    except StaticallyUndefined as _e:
                        if expr is node["expressions"][-1]:
                            # the block's value IS its final expression's
                            # value: the proof transfers to the block node
                            # (round 13)
                            _reraise_propagated(_e, expr, node)
                        raise
            if result is None:
                raise NotCompilable("empty block (or block valued as a lambda)")
            return result
        if t == "bind":
            raise NotCompilable("bind outside block")
        if t == "object":
            fields = []
            dts = []
            if len(node["pairs"]) == 1 and node["pairs"][0][0]["type"] != "string":
                # single-pair DYNAMIC key ({type: number} — the key is a
                # path over the context item): no static struct exists,
                # but a MapType does (round 9). Null/undefined key or
                # value drops the pair (the documented NULL conflation);
                # multi-pair dynamic objects stay tier 2 (runtime D1009
                # duplicate-key detection).
                kexpr, vexpr = node["pairs"][0]
                kv = self._c(kexpr, ctx, env)
                if not isinstance(kv.dtype, T.StringType):
                    raise NotCompilable("computed object key not a string")
                try:
                    vv = self._c(vexpr, ctx, env)
                except StaticallyUndefined as _e:
                    if _proves_undef(_e, vexpr):
                        return Typed(
                            F.create_map().cast("map<string,string>"),
                            T.MapType(T.StringType(), T.StringType()),
                        )
                    raise
                vt = vv.dtype or T.StringType()
                entry_t = T.ArrayType(
                    T.StructType(
                        [
                            T.StructField("key", T.StringType()),
                            T.StructField("value", vt),
                        ]
                    )
                )
                entries = F.when(
                    kv.col.isNotNull() & vv.col.isNotNull(),
                    F.array(F.struct(kv.col.alias("key"), vv.col.alias("value"))),
                ).otherwise(F.array().cast(entry_t))
                return Typed(
                    F.map_from_entries(entries), T.MapType(T.StringType(), vt)
                )
            for kexpr, vexpr in node["pairs"]:
                if kexpr["type"] != "string":
                    # bare name keys are PATH expressions in JSONata
                    # ({type: number} keys on the value of 'type'); dynamic
                    # keys cannot form a static struct (round-5 fix — the
                    # old code compiled them as literals)
                    raise NotCompilable("computed object keys")
                key = kexpr["value"]
                try:
                    val = self._c(vexpr, ctx, env)
                except StaticallyUndefined as _e:
                    # a pair whose value is PROVABLY undefined (schema-absent
                    # field) is omitted from the constructed object — the
                    # JSONata rule, foldable at compile time because the
                    # absence holds for every row (round 7). Round 9 widens
                    # the gate from bare paths to every propagation-sound
                    # shape (_undef_value_node): {'x': nope + 1} -> {};
                    # operators with DEFINED results over an absent field
                    # (b = 1, b & 'x') resolve inside _binary and never
                    # re-raise, so they cannot reach this catch.
                    if _proves_undef(_e, vexpr):
                        continue
                    raise
                fields.append(val.col.alias(key))
                dts.append(T.StructField(key, val.dtype or T.StringType()))
            if not fields:
                # all pairs undefined -> the empty object; no struct() form
                # for zero fields, so emit an empty map rendered as {}
                return Typed(
                    F.create_map().cast("map<string,string>"),
                    T.MapType(T.StringType(), T.StringType()),
                )
            return Typed(F.struct(*fields), T.StructType(dts))
        if t == "array":
            # range elements SPLICE into the constructor ([1..3, 5] ->
            # [1,2,3,5]); explicit nested arrays do not (round-5 dual-tier
            # sweep fix — F.array over a range made [[1,2,3]])
            exprs = []
            items = []
            for e in node["expressions"]:
                try:
                    items.append(self._c(e, ctx, env))
                    exprs.append(e)
                except StaticallyUndefined as _exc:
                    # an undefined element is OMITTED from the constructed
                    # array ([1, nope, 2] -> [1, 2]), foldable because the
                    # absence holds for every row (round 9)
                    if not _proves_undef(_exc, e):
                        raise
            node = dict(node, expressions=exprs)
            if not items:
                return Typed(
                    F.array().cast("array<string>"),
                    T.ArrayType(T.StringType()),
                )
            if any(e["type"] == "range" for e in node["expressions"]):
                parts = []
                et = None
                for e, it in zip(node["expressions"], items):
                    if e["type"] == "range":
                        parts.append(it.col)
                        et = et or it.dtype.elementType
                    else:
                        parts.append(F.array(it.col))
                        et = et or it.dtype
                return Typed(F.concat(*parts), T.ArrayType(et or T.StringType()))
            et = items[0].dtype if items else T.StringType()
            return Typed(F.array(*[i.col for i in items]), T.ArrayType(et or T.StringType()))
        if t == "range":
            try:
                lhs = self._c(node["lhs"], ctx, env)
                rhs = self._c(node["rhs"], ctx, env)
            except StaticallyUndefined as _e:
                # an undefined endpoint makes the range an EMPTY sequence
                # ([nothing..3] -> []; round 12) — and tier 2 short-circuits
                # BEFORE endpoint type checks, so one undefined endpoint is
                # sufficient proof. A ProvablyUndefinedValue is that proof
                # directly; otherwise the catch can't tell WHICH endpoint
                # raised, so — like the filter arm of _undef_value_node —
                # every endpoint that could raise must be propagation-sound.
                ok_l = _undef_value_node(node["lhs"]) or not _node_can_raise(
                    node["lhs"]
                )
                ok_r = _undef_value_node(node["rhs"]) or not _node_can_raise(
                    node["rhs"]
                )
                endpoint_proof = isinstance(_e, ProvablyUndefinedValue) and (
                    getattr(_e, "node", None) is node["lhs"]
                    or getattr(_e, "node", None) is node["rhs"]
                )
                if endpoint_proof or (ok_l and ok_r):
                    return Typed(
                        F.array().cast("array<long>"),
                        T.ArrayType(T.LongType()),
                    )
                raise
            # JSONata: a descending range is EMPTY ([5..1] -> []), while
            # Spark's sequence() counts down (round-5 dual-tier sweep fix)
            return Typed(
                F.when(lhs.col <= rhs.col, F.sequence(lhs.col, rhs.col)).otherwise(
                    F.array().cast("array<long>")
                ),
                T.ArrayType(T.LongType()),
            )
        if t == "sort":
            return self._sort(node, ctx, env)
        if t == "group":
            return self._group(node, ctx, env)
        if t == "call":
            return self._call(node, ctx, env)
        if t == "apply":
            # x ~> $f(...)  ==  $f(x, ...)
            rhs = node["rhs"]
            if rhs["type"] == "call":
                synthetic = {
                    "type": "call",
                    "procedure": rhs["procedure"],
                    "arguments": [node["lhs"]] + rhs["arguments"],
                    "pos": node["pos"],
                }
                return self._call(synthetic, ctx, env)
            if rhs["type"] == "variable":
                synthetic = {
                    "type": "call",
                    "procedure": rhs,
                    "arguments": [node["lhs"]],
                    "pos": node["pos"],
                }
                return self._call(synthetic, ctx, env)
            if rhs["type"] == "lambda":
                # x ~> function($v){...}  — inline-apply the literal lambda
                # (round 7; same substitution as bound-lambda invocation)
                if not rhs["args"]:
                    raise NotCompilable("~> into a zero-arg lambda")
                child = dict(env)
                child[rhs["args"][0]] = self._c(node["lhs"], ctx, env)
                return self._c(rhs["body"], ctx, child)
            if rhs["type"] == "transform":
                # x ~> |pattern|update, delete|  (round 9): the reference
                # SMT's record-update shape (Transformation.java applies
                # exactly this form per record) compiled to nested
                # withField/dropFields — a pure projection, no UDF
                return self._transform_op(node["lhs"], rhs, ctx, env)
            raise NotCompilable("~> with non-call rhs")
        raise NotCompilable(f"node type {t!r}")

    # ---------------------------------------------------------------- helpers
    def _transform_op(self, lhs_node, tnode, ctx: Typed, env: dict) -> Typed:
        """Compile ``X ~> |pattern|update, delete|`` (the JSONata transform
        operator) over a statically struct-typed X: each pattern match
        becomes in-place ``withField`` updates (object-constructor
        semantics for the update, evaluated with the matched node as
        context) followed by ``dropFields`` for the delete list. Patterns
        supported: ``$`` (the value itself) and simple name paths, with
        array-of-struct steps mapping over elements (the interpreter
        updates every matched element). An absent path step matches
        nothing -> the input is returned unchanged, which withField's
        null-propagation gives for free. Dynamic patterns, predicates in
        the pattern, and non-literal delete lists stay tier 2."""
        target = self._c(lhs_node, ctx, env)
        dele = tnode.get("delete")
        del_names: list[str] = []
        if dele is not None:
            if dele["type"] == "string":
                del_names = [dele["value"]]
            elif dele["type"] == "array" and all(
                e["type"] == "string" for e in dele["expressions"]
            ):
                del_names = [e["value"] for e in dele["expressions"]]
            else:
                raise NotCompilable("transform delete list not literal strings")
        update = tnode["update"]
        if update["type"] != "object":
            raise NotCompilable("transform update not an object constructor")
        steps: list[str] = []
        p = tnode["pattern"]
        while p["type"] == "path_op":
            if p["rhs"]["type"] != "name":
                raise NotCompilable("transform pattern step not a plain name")
            steps.append(p["rhs"]["value"])
            p = p["lhs"]
        if p["type"] == "name":
            steps.append(p["value"])
        elif not (p["type"] == "variable" and p["value"] in ("", "$")):
            raise NotCompilable("transform pattern not a simple path")
        steps.reverse()
        return self._apply_update(target, steps, update, del_names, env)

    def _apply_update(
        self, v: Typed, steps: list[str], update, del_names: list[str], env: dict
    ) -> Typed:
        if isinstance(v.dtype, T.ArrayType) and isinstance(
            v.dtype.elementType, T.StructType
        ):
            # every element of a matched array is a matched node
            et_box: list = []

            def per(e):
                r = self._apply_update(
                    Typed(e, v.dtype.elementType), steps, update, del_names, env
                )
                et_box.append(r.dtype)
                return r.col

            col = F.transform(v.col, per)
            return Typed(col, T.ArrayType(et_box[0]))
        if not isinstance(v.dtype, T.StructType):
            raise NotCompilable(f"transform target of type {v.dtype}")
        if steps:
            name, rest = steps[0], steps[1:]
            if name not in v.dtype.fieldNames():
                return v  # pattern matches nothing -> unchanged
            ft = v.dtype[name].dataType
            child = self._apply_update(
                Typed(v.col.getField(name), ft), rest, update, del_names, env
            )
            new_fields = [
                T.StructField(f.name, child.dtype if f.name == name else f.dataType)
                for f in v.dtype.fields
            ]
            return Typed(
                v.col.withField(name, child.col), T.StructType(new_fields)
            )
        upd = self._c(update, v, env)
        col = v.col
        fields = list(v.dtype.fields)
        if isinstance(upd.dtype, T.StructType):
            for f in upd.dtype.fields:
                col = col.withField(f.name, upd.col.getField(f.name))
                existing = [x.name for x in fields]
                nf = T.StructField(f.name, f.dataType)
                if f.name in existing:
                    fields[existing.index(f.name)] = nf
                else:
                    fields.append(nf)
        elif not (
            isinstance(upd.dtype, T.MapType)
            and all(k["type"] == "string" for k, _ in update.get("pairs", []))
        ):
            # an object constructor whose every pair is statically
            # undefined compiles to the empty map -> no-op update; any
            # other non-struct shape (incl. the round-9 dynamic-key
            # MapType objects, which carry runtime keys) cannot merge
            raise NotCompilable("transform update is not struct-shaped")
        drop = [n for n in del_names if n in {x.name for x in fields}]
        if drop:
            if len(drop) == len(fields):
                raise NotCompilable(
                    "transform deletes every field (empty object in tier 2)"
                )
            col = col.dropFields(*drop)
            fields = [x for x in fields if x.name not in drop]
        return Typed(col, T.StructType(fields))

    def _fanout_parent_step(self, node, ctx: Typed, env: dict) -> Typed | None:
        """Compile ``...steps....EXPR`` where the name-step chain fans out
        through array<struct> fields and ``EXPR`` reads ``%`` (round 10:
        one level — ``Account.Order.Product.{'O': %.OrderID}``; round 11:
        ANY depth — ``a.b.c.{'t': %.%.t}``). The generic path flattens
        each fan-out as it goes, losing which parent an element came
        from; here the transforms NEST instead, each level appending its
        element to the compile-time parent chain, and the result flattens
        once per fan-out on the way out — so the sequence is identical.
        Returns None when the shape doesn't match (caller falls through
        to the generic branch, where ``%`` raises NotCompilable ->
        tier 2)."""
        rhs_node = node["rhs"]
        # peel the TRAILING name steps off the lhs chain
        steps: list[str] = []
        cur = node["lhs"]
        while cur["type"] == "path_op" and cur["rhs"]["type"] == "name":
            steps.append(cur["rhs"]["value"])
            cur = cur["lhs"]
        if cur["type"] == "name":
            steps.append(cur["value"])
            base = ctx
        else:
            base = self._c(cur, ctx, env)
        steps.reverse()
        if not steps:
            return None
        dt_box: list = []

        def leaf(t: Typed):
            r = self._c(rhs_node, t, env)
            dt_box.append(r.dtype)
            return r.col

        def walk(names: list[str], t: Typed):
            """-> (Column, fanout_depth). Each fan-out level is one layer
            of transform() nesting; leaf() runs with the full chain."""
            name, rest = names[0], names[1:]
            if (
                not isinstance(t.dtype, T.StructType)
                or name not in t.dtype.fieldNames()
            ):
                raise NotCompilable(
                    f"fan-out parent chain: no struct field {name!r}"
                )
            ft = t.dtype[name].dataType
            col = t.col.getField(name)
            chain = t.parents + (t,)
            if isinstance(ft, T.StructType):
                nxt = Typed(col, ft, parents=chain)
                if rest:
                    return walk(rest, nxt)
                return leaf(nxt), 0
            if isinstance(ft, T.ArrayType) and isinstance(
                ft.elementType, T.StructType
            ):
                et = ft.elementType
                if rest:
                    dbox: list = []

                    def per(e):
                        c2, d2 = walk(rest, Typed(e, et, parents=chain))
                        dbox.append(d2)
                        return c2

                    return F.transform(col, per), dbox[0] + 1
                return (
                    F.transform(
                        col, lambda e: leaf(Typed(e, et, parents=chain))
                    ),
                    1,
                )
            raise NotCompilable(
                f"fan-out parent chain: step {name!r} is not struct-valued"
            )

        try:
            if isinstance(base.dtype, T.StructType):
                col, depth = walk(steps, base)
            elif isinstance(base.dtype, T.ArrayType) and isinstance(
                base.dtype.elementType, T.StructType
            ):
                ep = getattr(base, "elem_parents", ())
                et0 = base.dtype.elementType
                dbox0: list = []

                def per0(e):
                    c2, d2 = walk(steps, Typed(e, et0, parents=ep))
                    dbox0.append(d2)
                    return c2

                col, depth = F.transform(base.col, per0), None
                depth = dbox0[0] + 1
            else:
                return None
        except NotCompilable:
            return None
        res_t = dt_box[0] if dt_box else None
        if res_t is None or depth == 0:
            return None  # no fan-out: the generic nested-path compile owns it
        # depth transform layers nest the leaf results depth-deep; depth-1
        # flattens collapse them to ONE array of leaf results
        for _ in range(depth - 1):
            col = F.flatten(F.filter(col, lambda r: r.isNotNull()))
        if rhs_node["type"] == "array":
            # `seq.[...]` KEEPS per-element arrays (the keep-cons idiom) —
            # one flatten too many above? No: depth flattens collapse the
            # NESTING; the constructed per-element arrays are the
            # elements themselves, kept whole
            return Typed(col, T.ArrayType(res_t))
        if isinstance(res_t, T.ArrayType):
            # array-valued element results flatten one level with empty
            # sequences dropped — same rule as the generic mapped step
            col = F.flatten(F.filter(col, lambda r: r.isNotNull()))
            return Typed(col, res_t)
        return Typed(col, T.ArrayType(res_t))

    def _bound_step(self, bind_node, rhs_node, ctx: Typed, env: dict) -> Typed:
        """Compile ``X#$i.RHS`` / ``X@$v.RHS`` (B1.8 positional/focus
        binds) where the bind is applied to the current context item: one
        ``transform()`` over X's sequence evaluating RHS per element with
        the bind in the child env — $i is the 0-based position in the
        sequence (Spark's two-arg transform index), $v the element itself.
        Result follows the path sequence rules the other mapped steps use:
        array-valued element results flatten one level with nulls
        (empty sequences) dropped."""
        src = self._c(bind_node["expr"], ctx, env)
        var = bind_node["var"]
        is_index = bind_node["type"] == "index_bind"
        if not isinstance(src.dtype, T.ArrayType):
            # singleton sequence: index 0 / the value itself
            child = dict(env)
            child[var] = (
                Typed(F.lit(0).cast("long"), T.LongType()) if is_index else src
            )
            return self._c(rhs_node, src, child)
        elem_t = src.dtype.elementType
        dt_box: list = []

        def build(x, i):
            child = dict(env)
            child[var] = (
                Typed(i.cast("long"), T.LongType())
                if is_index
                else Typed(x, elem_t)
            )
            res = self._c(rhs_node, Typed(x, elem_t), child)
            dt_box.append(res.dtype)
            return res.col

        col = F.transform(src.col, build)
        res_t = dt_box[0] or T.StringType()
        if isinstance(res_t, T.ArrayType):
            col = F.flatten(F.filter(col, lambda r: r.isNotNull()))
            return Typed(col, res_t)
        return Typed(col, T.ArrayType(res_t))

    def _field(self, ctx: Typed, name: str) -> Typed:
        dt = ctx.dtype
        if isinstance(dt, T.StructType):
            if name not in dt.fieldNames():
                self._absent(f"unknown field {name!r}")
            return Typed(ctx.col.getField(name), dt[name].dataType)
        if isinstance(dt, T.MapType):
            return Typed(ctx.col.getItem(name), dt.valueType)
        if isinstance(dt, T.ArrayType) and isinstance(dt.elementType, T.StructType):
            # implicit mapping over array of structs -> array of field values
            inner = dt.elementType
            if name not in inner.fieldNames():
                self._absent(f"unknown field {name!r}")
            out_t = inner[name].dataType
            if isinstance(out_t, T.ArrayType):
                # an array-valued field FLATTENS one level in the result
                # sequence (JSONata path rule); absent (null) values drop
                # (round 9 — was tier 2)
                return Typed(
                    F.flatten(
                        F.filter(
                            F.transform(ctx.col, lambda x: x.getField(name)),
                            lambda r: r.isNotNull(),
                        )
                    ),
                    out_t,
                )
            return Typed(F.transform(ctx.col, lambda x: x.getField(name)), T.ArrayType(out_t))
        _scalars = (
            T.NullType, T.BooleanType, T.StringType, T.BinaryType,
            T.NumericType, T.DateType, T.TimestampType, T.TimestampNTZType,
        )
        if isinstance(dt, _scalars) or (
            isinstance(dt, T.ArrayType) and isinstance(dt.elementType, _scalars)
        ):
            # stepping into a scalar (or mapping over an array of scalars)
            # is PROVABLY undefined from the static schema — same fold
            # surface as a schema-absent field (round 9)
            raise StaticallyUndefined(f"path step {name!r} into scalar {dt}")
        raise NotCompilable(f"path step {name!r} over {dt}")

    def _wildcard(self, v: Typed) -> Typed:
        """`.*` over a static type (round 8): struct -> ordered field
        values (homogeneous types, long/double promote; array-valued
        fields flatten one level per the wildcard sequence rule), map ->
        map_values, array -> per-element wildcard flattened. Null entries
        drop (the engine's null==absent convention)."""
        dt = v.dtype
        if isinstance(dt, T.ArrayType):
            et_box: list = []

            def per(e):
                r = self._wildcard(Typed(e, dt.elementType))
                et_box.append(r.dtype)
                return r.col

            mapped = F.transform(v.col, per)
            col = F.flatten(F.filter(mapped, lambda r: r.isNotNull()))
            return Typed(col, et_box[0])
        if isinstance(dt, T.MapType):
            col = F.filter(F.map_values(v.col), lambda x: x.isNotNull())
            return Typed(col, T.ArrayType(dt.valueType))
        if isinstance(dt, T.StructType):
            if not dt.fields:
                raise NotCompilable("wildcard over empty struct")
            # each field CONTRIBUTES to the wildcard sequence: array-valued
            # members splice their elements (flatten one level, the wildcard
            # sequence rule), anything else adds one item — so the type to
            # unify is the per-field contribution element, which lets a
            # struct MIX array<T> and T members ({'a': [1,2], 'b': 3} -> *
            # is [1,2,3]; round 12 — previously "heterogeneous" -> tier 2)
            contrib = [
                f.dataType.elementType
                if isinstance(f.dataType, T.ArrayType)
                else f.dataType
                for f in dt.fields
            ]
            ss = {d.simpleString() for d in contrib}
            cast_to = None
            if ss == {"bigint", "double"}:
                cast_to = T.DoubleType()
            elif len(ss) != 1:
                raise NotCompilable("wildcard over heterogeneous struct")
            et = cast_to or contrib[0]
            seq_t = T.ArrayType(et)
            seqs = []
            for f in dt.fields:
                fc = v.col.getField(f.name)
                if isinstance(f.dataType, T.ArrayType):
                    s = F.filter(fc, lambda x: x.isNotNull())
                    if cast_to is not None:
                        s = F.transform(s, lambda x: x.cast(et))
                    s = F.when(fc.isNotNull(), s).otherwise(
                        F.array().cast(seq_t)
                    )
                else:
                    item = fc.cast(et) if cast_to is not None else fc
                    # null members drop (the engine's null==absent rule)
                    s = F.when(fc.isNotNull(), F.array(item)).otherwise(
                        F.array().cast(seq_t)
                    )
                seqs.append(s)
            arr = seqs[0] if len(seqs) == 1 else F.concat(*seqs)
            return Typed(F.when(v.col.isNotNull(), arr), seq_t)
        raise NotCompilable(f"wildcard over {dt}")

    def _wildcard_fuse(self, ctx: Typed, rhs_node: dict) -> Typed | None:
        """``*.*`` / ``*.name`` over a struct whose MEMBER types are too
        heterogeneous for :meth:`_wildcard`'s single element type
        (round 12): the first wildcard's fan-out is STATIC — one branch
        per schema field — so compile each member's contribution
        separately, apply the NEXT step per branch, and unify only the
        final leaf types. Branches where the next step is provably
        undefined (wildcard/name over a scalar member) drop, the jsonata
        sequence rule. Returns None when ``ctx`` is not a struct or the
        final leaves still don't unify (genuine tier-2 territory)."""
        dt = ctx.dtype
        if not isinstance(dt, T.StructType) or rhs_node["type"] not in (
            "wildcard",
            "name",
        ):
            return None
        branch_cols: list = []
        branch_ets: list = []
        for f in dt.fields:
            fc = ctx.col.getField(f.name)
            ft = f.dataType
            # first `*`: array members splice their elements, others
            # contribute a singleton (same rule as _wildcard)
            if isinstance(ft, T.ArrayType):
                seq, et = fc, ft.elementType
            else:
                seq = F.when(fc.isNotNull(), F.array(fc))
                et = ft
            # second step per element of this branch. A branch may DROP
            # only when the step is PROVABLY undefined for its member type
            # (wildcard/name over a scalar — the jsonata sequence rule);
            # any other compile failure (e.g. a heterogeneous SUB-struct)
            # means the branch has values tier 1 can't express — the whole
            # fusion must abort to tier 2, never silently lose the branch.
            if rhs_node["type"] == "wildcard" and not isinstance(
                et, (T.StructType, T.MapType, T.ArrayType)
            ):
                continue  # wildcard of a scalar member: undefined, drops
            et_box: list = []

            def make_step(_et, _box):
                # factory closure: pyspark derives the SQL lambda's arity
                # from the Python function's parameter count, so the step
                # must take exactly one argument (no default-arg captures)
                def step(e):
                    elem = Typed(e, _et)
                    if rhs_node["type"] == "wildcard":
                        r = self._wildcard(elem)
                    else:
                        r = self._field(elem, rhs_node["value"])
                    _box.append(r.dtype)
                    return r.col

                return step

            try:
                mapped = F.transform(seq, make_step(et, et_box))
            except StaticallyUndefined:
                continue  # name step provably absent on this member type
            except NotCompilable:
                return None  # branch inexpressible -> whole path to tier 2
            rt = et_box[0]
            if isinstance(rt, T.ArrayType):
                # array-valued step results splice (path flatten rule);
                # null entries (element had no value there) drop first
                col = F.flatten(F.filter(mapped, lambda x: x.isNotNull()))
                branch_ets.append(rt.elementType)
            else:
                col = F.filter(mapped, lambda x: x.isNotNull())
                branch_ets.append(rt)
            branch_cols.append(col)
        if not branch_cols:
            return None
        ss = {d.simpleString() for d in branch_ets}
        cast_to = None
        if ss == {"bigint", "double"}:
            cast_to = T.DoubleType()
        elif len(ss) != 1:
            return None
        out_et = cast_to or branch_ets[0]
        seq_t = T.ArrayType(out_et)
        parts = []
        for col in branch_cols:
            if cast_to is not None:
                col = F.transform(col, lambda x: x.cast(out_et))
            parts.append(F.coalesce(col, F.array().cast(seq_t)))
        arr = parts[0] if len(parts) == 1 else F.concat(*parts)
        return Typed(F.when(ctx.col.isNotNull(), arr), seq_t)

    def _descendant_field(self, src: Typed, name: str) -> Typed:
        """`**.name` over a static schema (round 8, SURVEY B1.5): every
        schema position of ``name`` is enumerated in the interpreter's
        pre-order (a struct's own match first, then each field's subtree
        in declaration order; array elements fan out in place via
        transform+flatten) and emitted as one array Column. All matches
        must share a type (long/double promote). Null structs/values
        contribute nothing (null==absent convention)."""
        tgt: list = []

        def scan(dt):
            if isinstance(dt, T.StructType):
                for f in dt.fields:
                    if f.name == name:
                        tgt.append(f.dataType)
                    scan(f.dataType)
            elif isinstance(dt, T.ArrayType):
                scan(dt.elementType)
            elif isinstance(dt, T.MapType):
                raise NotCompilable("** over a map-typed subtree (dynamic keys)")

        scan(src.dtype)
        if not tgt:
            self._absent(f"** finds no field {name!r} in the schema")
        ss = {d.simpleString() for d in tgt}
        cast = False
        if ss == {"bigint", "double"}:
            et, cast = T.DoubleType(), True
        elif len(ss) == 1:
            et = tgt[0]
        else:
            raise NotCompilable("** targets with heterogeneous types")
        empty = F.array().cast(T.ArrayType(et))

        def has(dt) -> bool:
            if isinstance(dt, T.StructType):
                return any(f.name == name or has(f.dataType) for f in dt.fields)
            if isinstance(dt, T.ArrayType):
                return has(dt.elementType)
            return False

        def build(col, dt):
            if isinstance(dt, T.StructType):
                parts = []
                if name in dt.fieldNames():
                    fv = col.getField(name)
                    if cast:
                        fv = fv.cast(et)
                    parts.append(
                        F.when(fv.isNotNull(), F.array(fv)).otherwise(empty)
                    )
                for f in dt.fields:
                    if has(f.dataType):
                        parts.append(build(col.getField(f.name), f.dataType))
                combined = parts[0] if len(parts) == 1 else F.concat(*parts)
                return F.when(col.isNotNull(), combined).otherwise(empty)
            # ArrayType (has() guaranteed by the caller)
            mapped = F.transform(col, lambda e: build(e, dt.elementType))
            return F.when(col.isNotNull(), F.flatten(mapped)).otherwise(empty)

        return Typed(build(src.col, src.dtype), T.ArrayType(et))

    def _truthy(self, v: Typed) -> Column:
        dt = v.dtype
        if isinstance(dt, T.BooleanType):
            return v.col
        if isinstance(dt, (T.LongType, T.IntegerType, T.DoubleType, T.FloatType,
                           T.ShortType, T.ByteType, T.DecimalType)):
            return v.col.isNotNull() & (v.col != 0)
        if isinstance(dt, T.StringType):
            return v.col.isNotNull() & (F.length(v.col) > 0)
        if isinstance(dt, T.ArrayType):
            # JSONata: an array is truthy iff SOME member is truthy
            # ([0] and [] are both false) — recurse on the element type
            # (round-5 dual-tier sweep fix; was size > 0)
            return v.col.isNotNull() & F.exists(
                v.col, lambda x: self._truthy(Typed(x, dt.elementType))
            )
        if isinstance(dt, T.StructType):
            # objects are truthy iff non-empty; field count is static
            return v.col.isNotNull() & F.lit(len(dt.fields) > 0)
        if isinstance(dt, T.MapType):
            return v.col.isNotNull() & (F.size(v.col) > 0)
        return v.col.isNotNull()

    def _num(self, v: Typed) -> Column:
        return v.col.cast("double")

    def _filter(self, node, ctx: Typed, env: dict) -> Typed:
        base = self._c(node["expr"], ctx, env)
        dt = base.dtype
        pred = node["predicate"]
        if not isinstance(dt, T.ArrayType):
            # a non-array value is a SINGLETON sequence (round 9):
            # v[0] and v[-1] are v, any other constant index is provably
            # undefined, and a boolean predicate keeps-or-drops the value
            sidx = None
            if pred["type"] == "number":
                sidx = pred["value"]
            elif (
                pred["type"] == "unary"
                and pred.get("value") == "-"
                and pred["expression"]["type"] == "number"
            ):
                sidx = -pred["expression"]["value"]
            if sidx is not None:
                import math as _math

                sidx = int(_math.floor(sidx))
                if sidx in (0, -1):
                    return base
                raise StaticallyUndefined(
                    f"index {sidx} into a singleton sequence"
                )
            sp = self._c(pred, base, env)
            if isinstance(
                sp.dtype,
                (T.LongType, T.IntegerType, T.DoubleType, T.FloatType,
                 T.ShortType, T.ByteType, T.DecimalType),
            ):
                raise NotCompilable("dynamic numeric index over singleton")
            return Typed(F.when(self._truthy(sp), base.col), dt)
        # constant numeric index — incl. negative (unary minus) and
        # non-integer (floors, jsonata-js rule); round-5 dual-tier sweep
        # fix: [-1]/[1.5] previously fell into the truthiness branch and
        # returned the WHOLE array
        idx = None
        if pred["type"] == "number":
            idx = pred["value"]
        elif (
            pred["type"] == "unary"
            and pred.get("value") == "-"
            and pred["expression"]["type"] == "number"
        ):
            idx = -pred["expression"]["value"]
        if idx is not None:
            import math as _math

            idx = int(_math.floor(idx))
            pos = idx + 1 if idx >= 0 else idx
            # try_element_at: out-of-range is UNDEFINED in jsonata (a[10]
            # -> no result); plain element_at THROWS under Spark 4's
            # default ANSI mode — a runtime crash after tier selection,
            # where tier 2 returns undefined (round-11 fix)
            return Typed(F.try_element_at(base.col, F.lit(pos)), dt.elementType)
        # boolean predicate -> filter(); singleton unwrap not represented.
        # Elements carry the base's constant parent chain so `%` inside
        # the predicate compiles (`Product[%.OrderID = 'o1']`, round 10 —
        # matches the tier-2 single-name-step ancestry rule); a fan-out
        # base has no constant chain and the parent step routes to tier 2.
        elem_ctx_t = dt.elementType
        # tier 2 extends the predicate ancestry ONLY for a bare name-step
        # base — gate identically so `(a.b)[%.x]`-style shapes agree
        eparents = (
            getattr(base, "elem_parents", ())
            if node["expr"].get("type") == "name"
            else ()
        )

        def mk(x):
            return self._c(pred, Typed(x, elem_ctx_t, parents=eparents), env)

        probe = self._c(
            pred,
            Typed(F.lit(None).cast(elem_ctx_t), elem_ctx_t, parents=eparents),
            env,
        )
        _numeric = (T.LongType, T.IntegerType, T.DoubleType, T.FloatType,
                    T.ShortType, T.ByteType, T.DecimalType)
        if isinstance(probe.dtype, _numeric) or (
            isinstance(probe.dtype, T.ArrayType)
            and isinstance(probe.dtype.elementType, _numeric)
        ):
            # a numeric (or numeric-array) predicate selects by INDEX:
            # element at position i is kept iff i is in the pred's value
            # (per-element evaluation, floor rule, negatives wrap, result
            # in ARRAY-POSITION order, out-of-range drops) — round 9, was
            # tier 2. One filter() with the positional lambda arg: stays a
            # whole-stage-codegen projection.
            n = F.size(base.col)

            def keep(x, i):
                pv = self._c(pred, Typed(x, elem_ctx_t, parents=eparents), env)
                arr = (
                    pv.col
                    if isinstance(pv.dtype, T.ArrayType)
                    else F.array(pv.col)
                )
                return F.exists(
                    arr,
                    lambda j: F.when(
                        F.floor(j.cast("double")) >= 0,
                        F.floor(j.cast("double")),
                    ).otherwise(F.floor(j.cast("double")) + n)
                    == i.cast("long"),
                )

            return Typed(F.filter(base.col, keep), dt)
        try:
            filtered = F.filter(base.col, lambda x: self._truthy(mk(x)))
        except NotCompilable:
            raise
        return Typed(filtered, dt)

    def _binary(self, node, ctx: Typed, env: dict) -> Typed:
        op = node["value"]
        # operators with DEFINED semantics on an undefined operand resolve
        # a provably-undefined side here instead of routing to tier 2:
        # =/!=/in -> false, & -> '', and/or -> falsy (round 9; the
        # interpreter is the oracle — see test_round9_compile.py). The
        # catch is gated on _undef_value_node: only escapes from
        # propagating positions prove the operand VALUE is undefined.
        def side(which):
            try:
                return self._c(node[which], ctx, env)
            except StaticallyUndefined as _e:
                if op in ("=", "!=", "in", "&", "and", "or") and _proves_undef(
                    _e, node[which]
                ):
                    return None  # provably-undefined operand marker
                if op in ("+", "-", "*", "/", "%", "<", "<=", ">", ">="):
                    # undefined propagates through arithmetic and order
                    # comparison: a proof about the operand is a proof
                    # about the whole binary node (round 13)
                    _reraise_propagated(_e, node[which], node)
                raise

        lhs = side("lhs")
        rhs = side("rhs")
        if lhs is None or rhs is None:
            if op in ("=", "!=", "in"):
                return Typed(F.lit(False), T.BooleanType())
            if op == "&":
                other = rhs if lhs is None else lhs
                if other is None:
                    return Typed(F.lit(""), T.StringType())
                return Typed(self._str(other), T.StringType())
            if op == "and":
                # undefined is falsy; the defined side still evaluates
                return Typed(F.lit(False), T.BooleanType())
            if op == "or":
                other = rhs if lhs is None else lhs
                if other is None:
                    return Typed(F.lit(False), T.BooleanType())
                return Typed(self._truthy(other), T.BooleanType())
        if op in ("+", "-", "*", "/", "%"):
            a, b = self._num(lhs), self._num(rhs)
            if op == "+":
                c = a + b
            elif op == "-":
                c = a - b
            elif op == "*":
                c = a * b
            elif op == "/":
                c = a / b
            else:
                c = a % b
            return Typed(c, T.DoubleType())
        if op in ("=", "!="):
            c = lhs.col == rhs.col if op == "=" else lhs.col != rhs.col
            # JSONata: comparisons involving missing/null are false, not null
            return Typed(F.coalesce(c, F.lit(False)), T.BooleanType())
        if op in ("<", "<=", ">", ">="):
            c = {
                "<": lhs.col < rhs.col,
                "<=": lhs.col <= rhs.col,
                ">": lhs.col > rhs.col,
                ">=": lhs.col >= rhs.col,
            }[op]
            return Typed(c, T.BooleanType())
        if op == "and":
            return Typed(self._truthy(lhs) & self._truthy(rhs), T.BooleanType())
        if op == "or":
            return Typed(self._truthy(lhs) | self._truthy(rhs), T.BooleanType())
        if op == "&":
            return Typed(
                F.concat(self._str(lhs), self._str(rhs)), T.StringType()
            )
        if op == "in":
            arr = rhs.col if isinstance(rhs.dtype, T.ArrayType) else F.array(rhs.col)
            return Typed(F.array_contains(arr, lhs.col), T.BooleanType())
        raise NotCompilable(f"binary op {op!r}")

    def _str(self, v: Typed) -> Column:
        if isinstance(v.dtype, (T.StructType, T.ArrayType, T.MapType)):
            return F.to_json(v.col)
        if isinstance(v.dtype, T.BooleanType):
            return F.when(v.col, "true").otherwise("false")
        if isinstance(v.dtype, (T.DoubleType, T.FloatType)):
            # JSONata renders numbers in the JS canonical form (plain up to
            # 1e21, '1e-7' style exponents); Java's Double.toString uses
            # different notation thresholds AND (Java 17) sometimes
            # non-shortest digits, so a bare cast silently diverges. The
            # round-5 sweep routed this whole subtree to tier 2; round 7
            # compiles the exact rendering natively (minimal-digit search +
            # tie-to-even + JS thresholds) — see js_canonical_number.
            return js_canonical_number(v.col.cast("double"))
        return v.col.cast("string")

    # -------------------------------------------------------------- functions
    def _lambda_param_optional(self, lam: "CompiledLambda", i: int) -> bool:
        """May the i-th parameter of this bound lambda legally bind
        undefined? Without a signature jsonata performs no validation
        (undefined binds silently); with one, only ``?``-marked params
        accept a missing/undefined argument — anything else (required,
        context-substituting ``-``, variadic) is tier-2 territory."""
        if not lam.sig:
            return True
        try:
            from kafka_connect_jsonata_spark.jsonata.interpreter import (
                parse_signature,
            )

            specs = parse_signature(lam.sig)
        except Exception:
            return False
        if i >= len(specs):
            return True
        s = specs[i]
        return bool(s.get("optional")) and not s.get("context") and not s.get(
            "variadic"
        )

    def _builtin_as_lambda(self, name: str, env: dict) -> "CompiledLambda":
        """Wrap a builtin reference ($uppercase in HOF/alias position) as a
        one-arg lambda calling it, so it inlines like a bound lambda."""
        arg = {"type": "variable", "value": "__hof_arg", "pos": 0}
        body = {
            "type": "call",
            "procedure": {"type": "variable", "value": name, "pos": 0},
            "arguments": [arg],
            "pos": 0,
        }
        return CompiledLambda(["__hof_arg"], body, dict(env))

    def _is_fn_ref(self, node, env: dict) -> bool:
        """A raw argument node that names a function (bound lambda or
        builtin) rather than a value — consumed raw by HOF handlers."""
        return node["type"] == "variable" and (
            isinstance(env.get(node["value"]), CompiledLambda)
            or (
                node["value"] not in env
                and hasattr(self, "_fn_" + node["value"])
            )
        )

    def _call(self, node, ctx: Typed, env: dict) -> Typed:
        proc = node["procedure"]
        if proc["type"] == "variable" and proc["value"] in env:
            lam = env[proc["value"]]
            if not isinstance(lam, CompiledLambda):
                raise NotCompilable("call of non-lambda binding")
            # inline the bound lambda: compile args in the CALLER's env,
            # evaluate the body in the lambda's captured env (closure)
            child = dict(lam.env)
            for i, p in enumerate(lam.params):
                if i >= len(node["arguments"]):
                    # missing trailing argument binds undefined, exactly
                    # like tier 2 (round 13) — unless a signature REQUIRES
                    # it, in which case tier 2 raises T0410 and we must
                    # not fold: route to tier 2
                    if not self._lambda_param_optional(lam, i):
                        raise NotCompilable(
                            "missing required lambda argument"
                        )
                    child[p] = _UNDEF_BINDING
                    continue
                anode = node["arguments"][i]
                try:
                    child[p] = self._c(anode, ctx, env)
                except StaticallyUndefined as _e:
                    if not _proves_undef(_e, anode):
                        raise
                    # a SUPPLIED-but-undefined argument binds undefined
                    # regardless of the signature (tier-2 semantics:
                    # validate_signature only rejects MISSING required
                    # args; supplied-undefined propagates into the body)
                    child[p] = _UNDEF_BINDING
            return self._c(lam.body, ctx, child)
        if proc["type"] != "variable":
            raise NotCompilable("computed function reference")
        name = proc["value"]
        args = node["arguments"]

        handler = getattr(self, "_fn_" + name, None)
        if handler is None:
            raise NotCompilable(f"function ${name} not in compiled subset")
        # lambda, regex-literal, and function-reference arguments are
        # consumed from the raw AST by their handlers (a bare regex/function
        # has no Column form); $merge takes its array argument raw as well —
        # its elements are structs of DIFFERENT schemas, which no single
        # ArrayType can hold
        if name == "merge":
            return self._fn_merge([], ctx, env, args)
        if name in ("count", "exists") and len(args) == 1:
            # bare ** under an aggregate consumer (round 11, verdict item
            # 6): the VALUE of `**` is type-heterogeneous (structs +
            # scalars — no single ArrayType), but its CARDINALITY is a
            # static arithmetic over the closed-world schema: structs
            # count 1 + their members, arrays fan out per element without
            # counting themselves (jsonata-js recurseDescendants), scalars
            # count 1. $count(**)/$exists(**) therefore compile even
            # though ** alone stays tier 2.
            dnode = args[0]
            base = None
            if dnode["type"] == "descendant":
                base = ctx
            elif (
                dnode["type"] == "path_op"
                and dnode["rhs"]["type"] == "descendant"
            ):
                try:
                    base = self._c(dnode["lhs"], ctx, env)
                except StaticallyUndefined:
                    # missing.** is an empty sequence: count 0 / exists false
                    return (
                        Typed(F.lit(0), T.IntegerType())
                        if name == "count"
                        else Typed(F.lit(False), T.BooleanType())
                    )
            if base is not None:
                cnt = self._descendant_count(base.col, base.dtype)
                if name == "count":
                    return Typed(cnt.cast("int"), T.IntegerType())
                return Typed(cnt > 0, T.BooleanType())

        def arg_of(a):
            if a["type"] in ("lambda", "regex") or self._is_fn_ref(a, env):
                return None
            try:
                return self._c(a, ctx, env)
            except StaticallyUndefined as _e:
                # $count/$exists have defined constants for a provably
                # undefined argument (round 7, widened round 9 to every
                # propagation-sound shape; NOT $boolean — the interpreter
                # gives undefined, not false): fold instead of falling to
                # tier 2. An operator over the absent field with a defined
                # result ($count(b = 1) = 1) resolves inside _binary and
                # cannot reach here.
                if name in ("count", "exists") and _proves_undef(_e, a):
                    return Typed(F.lit(None), T.NullType())
                if name == "append" and _proves_undef(_e, a):
                    # $append with a provably-undefined operand returns the
                    # OTHER operand unchanged (round 12) — marked with the
                    # sentinel subclass so _fn_append can tell a statically
                    # ABSENT argument from a literal null VALUE
                    return _UndefArg(F.lit(None), T.NullType())
                if name in _UNDEF_PROPAGATING_FNS and a is args[0]:
                    # f(undefined, ...) -> undefined for these builtins —
                    # FIRST argument only, matching _undef_value_node's
                    # call arm ($power(2, nope) throws T0410; $substring(
                    # 'abc', nope) is 'abc') — so the proof about the
                    # argument transfers to the call node (round 13). For
                    # any other function or position the re-raise carries
                    # no proof about the call: an outer catch may only
                    # accept it on syntactic grounds, never via the
                    # evaluation tag (e.g. $zip drops undefined args and
                    # returns a DEFINED value).
                    _reraise_propagated(_e, a, node)
                raise

        typed_args = [arg_of(a) for a in args]
        return handler(typed_args, ctx, env, args)

    # each handler: (typed_args, ctx, env, raw_arg_nodes) -> Typed
    def _fn_string(self, a, ctx, env, raw):
        return Typed(self._str(a[0] if a else ctx), T.StringType())

    def _fn_length(self, a, ctx, env, raw):
        return Typed(F.length((a[0] if a else ctx).col), T.IntegerType())

    def _fn_uppercase(self, a, ctx, env, raw):
        return Typed(F.upper((a[0] if a else ctx).col), T.StringType())

    def _fn_lowercase(self, a, ctx, env, raw):
        return Typed(F.lower((a[0] if a else ctx).col), T.StringType())

    def _fn_trim(self, a, ctx, env, raw):
        return Typed(
            F.trim(F.regexp_replace((a[0] if a else ctx).col, r"[ \t\n\r]+", " ")),
            T.StringType(),
        )

    def _fn_substring(self, a, ctx, env, raw):
        s = a[0].col
        start = a[1].col
        # JSONata is 0-based with negative-from-end; Spark substr is 1-based
        pos = F.when(start >= 0, start + 1).otherwise(
            F.greatest(F.length(s) + start + 1, F.lit(1))
        )
        if len(a) > 2:
            return Typed(s.substr(pos, a[2].col), T.StringType())
        return Typed(s.substr(pos, F.length(s)), T.StringType())

    def _fn_substringBefore(self, a, ctx, env, raw):
        if raw[-1]["type"] != "string":
            raise NotCompilable("$substringBefore needs a literal separator")
        s, sep = a[0].col, raw[-1]["value"]
        return Typed(
            F.when(F.instr(s, sep) > 0, F.substring_index(s, sep, 1)).otherwise(s),
            T.StringType(),
        )

    def _fn_substringAfter(self, a, ctx, env, raw):
        if raw[-1]["type"] != "string":
            raise NotCompilable("$substringAfter needs a literal separator")
        s, sep = a[0].col, raw[-1]["value"]
        i = F.instr(s, sep)
        return Typed(
            F.when(i > 0, s.substr(i + len(sep), F.length(s))).otherwise(s),
            T.StringType(),
        )

    def _fn_pad(self, a, ctx, env, raw):
        s, w = a[0].col, a[1].col
        c = a[2].col if len(a) > 2 else F.lit(" ")
        return Typed(
            F.when(w >= 0, F.rpad(s, F.greatest(w, F.length(s)).cast("int"), c))
            .otherwise(F.lpad(s, F.greatest(-w, F.length(s)).cast("int"), c)),
            T.StringType(),
        )

    @staticmethod
    def _regex_java(rx) -> str:
        """Java-regex pattern string for a tokenized regex literal,
        carrying its flags as inline modifiers ((?i) etc.) — a bare
        ``.pattern`` silently DROPS /i //m //s (round-5 dual-tier sweep
        fix: $contains('ABC', /abc/i) compiled to a case-sensitive
        rlike)."""
        import re as _re

        mods = ""
        if rx.flags & _re.IGNORECASE:
            mods += "i"
        if rx.flags & _re.MULTILINE:
            mods += "m"
        if rx.flags & _re.DOTALL:
            mods += "s"
        return (f"(?{mods})" if mods else "") + rx.pattern

    _MATCH_RESULT_T = T.ArrayType(
        T.StructType(
            [
                T.StructField("match", T.StringType()),
                T.StructField("index", T.IntegerType()),
                T.StructField("groups", T.ArrayType(T.StringType())),
            ]
        )
    )

    def _fn_match(self, a, ctx, env, raw):
        """B4 $match -> array of {match, index, groups} structs, natively:
        regexp_extract_all for the match/group texts, and a left-to-right
        fold reconstructing each match's index by locate()-ing its text at
        or after the previous match's end (sound because the regex engine
        scans left-to-right: the matched text first occurs, matchably, at
        its own position). Patterns whose match position depends on
        CONTEXT outside the matched text — anchors, word boundaries,
        lookaround — break that reconstruction and stay tier 2, as do
        zero-length-matchable patterns (D1004 in the interpreter) and
        patterns mixing capture groups with alternation/optionality
        (a non-participating group is undefined in JSONata but '' from
        regexp_extract_all)."""
        import re as _re

        if len(raw) < 2 or raw[1]["type"] != "regex":
            raise NotCompilable("$match with dynamic pattern")
        rx = raw[1]["value"]
        p = rx.pattern
        if any(tok in p for tok in ("(?=", "(?!", "(?<", "\\b", "\\B")):
            raise NotCompilable("$match pattern with lookaround/boundaries")
        if rx.groups and any(c in p for c in "|?*"):
            raise NotCompilable(
                "$match groups with alternation/optionality (tier 2)"
            )
        if _re.compile(rx.pattern, rx.flags).match(""):
            raise NotCompilable("$match zero-length-matchable pattern (D1004)")

        def _unescaped(i: int) -> bool:
            k = 0
            while i - 1 - k >= 0 and p[i - 1 - k] == "\\":
                k += 1
            return k % 2 == 0

        anchor_pos = [
            m.start() for m in _re.finditer(r"[\^$]", p) if _unescaped(m.start())
        ]
        if anchor_pos:
            # EDGE anchors compile (round 10): a ^-prefixed / $-suffixed
            # pattern (no alternation, no multiline — where anchors stop
            # meaning string edges) admits AT MOST ONE match at a KNOWN
            # index — 0 when start-anchored, len(s) - len(match) when the
            # match must END at the string end. Interior anchors (incl.
            # char-class ^/$ — the scan is syntactic and conservative)
            # stay tier 2.
            starts = p.startswith("^") and 0 in anchor_pos
            ends = p.endswith("$") and (len(p) - 1) in anchor_pos
            interior = [
                i
                for i in anchor_pos
                if not (starts and i == 0) and not (ends and i == len(p) - 1)
            ]
            if interior or "|" in p or (rx.flags & _re.M):
                raise NotCompilable("$match pattern with non-edge anchors")
            if len(raw) > 2 and (
                raw[2]["type"] != "number" or int(raw[2]["value"]) < 1
            ):
                raise NotCompilable("$match with dynamic/degenerate limit")
            s = a[0].col
            if ends:
                # End-anchored (round-11 ADVICE fix): Java's bare `$` is
                # MORE lenient than tier 2's Python `$` — it also matches
                # before a final \r / \r\n / U+2028 etc., and length
                # arithmetic mis-places the index when the match stops
                # before a trailing \n ($match('abb\n', /b+$/) is index 1,
                # not 2). Rebuild the pattern with an explicit lazy prefix
                # CAPTURE and Python's exact end semantics `\n?\z`; the
                # prefix length IS the index, and the extra `\r`-leniency
                # disappears because `$` is gone.
                if _re.search(r"\\[1-9]", p):
                    raise NotCompilable(
                        "$match end-anchored pattern with backreferences"
                    )
                body = p[(1 if starts else 0) : -1]
                mods = ""
                if rx.flags & _re.IGNORECASE:
                    mods += "i"
                if rx.flags & _re.DOTALL:
                    mods += "s"
                wrapped = (
                    (f"(?{mods})" if mods else "")
                    + "^("
                    + ("" if starts else "(?s:.*?)")
                    + ")((?:"
                    + body
                    + "))\\n?\\z"
                )
                m0 = F.regexp_extract(s, wrapped, 2)
                idx = F.length(F.regexp_extract(s, wrapped, 1)).cast("int")
                groups = (
                    F.array(
                        *[
                            F.regexp_extract(s, wrapped, 2 + i)
                            for i in range(1, rx.groups + 1)
                        ]
                    )
                    if rx.groups
                    else F.array().cast("array<string>")
                )
                one = F.struct(
                    m0.alias("match"), idx.alias("index"), groups.alias("groups")
                )
                col = F.when(s.rlike(wrapped), F.array(one)).otherwise(
                    F.array().cast(self._MATCH_RESULT_T)
                )
                return Typed(col, self._MATCH_RESULT_T)
            pat = self._regex_java(rx)
            m0 = F.regexp_extract(s, pat, 0)
            idx = F.lit(0).cast("int")
            groups = (
                F.array(
                    *[F.regexp_extract(s, pat, i) for i in range(1, rx.groups + 1)]
                )
                if rx.groups
                else F.array().cast("array<string>")
            )
            one = F.struct(
                m0.alias("match"), idx.alias("index"), groups.alias("groups")
            )
            col = F.when(s.rlike(pat), F.array(one)).otherwise(
                F.array().cast(self._MATCH_RESULT_T)
            )
            return Typed(col, self._MATCH_RESULT_T)
        pat = self._regex_java(rx)
        s = a[0].col
        ms = F.regexp_extract_all(s, F.lit(pat), F.lit(0))
        if len(raw) > 2:
            if raw[2]["type"] != "number" or int(raw[2]["value"]) < 1:
                raise NotCompilable("$match with dynamic/degenerate limit")
            ms = F.slice(ms, 1, int(raw[2]["value"]))
        gcols = [
            F.regexp_extract_all(s, F.lit(pat), F.lit(i))
            for i in range(1, rx.groups + 1)
        ]
        acc0 = F.struct(
            F.lit(1).alias("pos"), F.array().cast("array<int>").alias("idx")
        )

        def step(acc, m):
            loc = F.call_function("locate", m, s, acc.getField("pos"))
            return F.struct(
                (loc + F.length(m)).alias("pos"),
                F.concat(
                    acc.getField("idx"), F.array((loc - 1).cast("int"))
                ).alias("idx"),
            )

        idxs = F.aggregate(ms, acc0, step).getField("idx")

        def assemble(j):
            groups = (
                F.array(*[F.element_at(g, j) for g in gcols])
                if gcols
                else F.array().cast("array<string>")
            )
            return F.struct(
                F.element_at(ms, j).alias("match"),
                F.element_at(idxs, j).alias("index"),
                groups.alias("groups"),
            )

        col = F.when(
            F.size(ms) >= 1,
            F.transform(F.sequence(F.lit(1), F.size(ms)), assemble),
        ).otherwise(F.array().cast(self._MATCH_RESULT_T))
        return Typed(col, self._MATCH_RESULT_T)

    # XPath picture lookup tables (round 10 — mirror functions.py's
    # _ONES/_TENS/_ROMAN exactly; the dual-tier tests pin the parity)
    _W_ONES = [
        "zero", "one", "two", "three", "four", "five", "six", "seven",
        "eight", "nine", "ten", "eleven", "twelve", "thirteen", "fourteen",
        "fifteen", "sixteen", "seventeen", "eighteen", "nineteen",
    ]
    _W_TENS = [
        "", "", "twenty", "thirty", "forty", "fifty", "sixty", "seventy",
        "eighty", "ninety",
    ]
    _ROMAN_H = ["", "c", "cc", "ccc", "cd", "d", "dc", "dcc", "dccc", "cm"]
    _ROMAN_T = ["", "x", "xx", "xxx", "xl", "l", "lx", "lxx", "lxxx", "xc"]
    _ROMAN_U = ["", "i", "ii", "iii", "iv", "v", "vi", "vii", "viii", "ix"]
    _ORD_WORD_EXC = [
        ("one", "first"), ("two", "second"), ("three", "third"),
        ("five", "fifth"), ("eight", "eighth"), ("nine", "ninth"),
        ("twelve", "twelfth"),
    ]

    def _roman_col(self, n):
        """Lowercase roman numeral of a NON-NEGATIVE long Column:
        repeat('m') for thousands + digit-table lookups. Zero -> ''."""
        lut = lambda table, d: F.element_at(  # noqa: E731
            F.array(*[F.lit(x) for x in table]), (d + 1).cast("int")
        )
        return F.concat(
            F.repeat(F.lit("m"), (n / 1000).cast("int")),
            lut(self._ROMAN_H, (n / 100) % 10),
            lut(self._ROMAN_T, (n / 10) % 10),
            lut(self._ROMAN_U, n % 10),
        )

    def _alpha_col(self, n):
        """Bijective base-26 ('a'..'z','aa'..) of a POSITIVE long Column —
        the 'a' picture. Unrolled to 14 steps (26^14 > 2^63). Non-positive
        input yields '' (tier-2 loop body never runs)."""
        acc0 = F.struct(n.cast("long").alias("rem"), F.lit("").alias("s"))

        def step(acc, _):
            rem = acc.getField("rem")
            return F.when(rem <= 0, acc).otherwise(
                F.struct(
                    ((rem - 1) / 26).cast("long").alias("rem"),
                    F.concat(
                        F.char((rem - 1) % 26 + 97), acc.getField("s")
                    ).alias("s"),
                )
            )

        return F.aggregate(
            F.sequence(F.lit(1), F.lit(14)), acc0, step
        ).getField("s")

    def _w99(self, x):
        ones = F.array(*[F.lit(w) for w in self._W_ONES])
        tens = F.array(*[F.lit(w) for w in self._W_TENS])
        xi = x.cast("int")
        return F.when(
            xi < 20, F.element_at(ones, xi + 1)
        ).otherwise(
            F.concat(
                F.element_at(tens, (xi / 10).cast("int") + 1),
                F.when(
                    xi % 10 > 0,
                    F.concat(F.lit("-"), F.element_at(ones, xi % 10 + 1)),
                ).otherwise(F.lit("")),
            )
        )

    def _w999(self, x):
        h = (x / 100).cast("int")
        r = x % 100
        ones = F.array(*[F.lit(w) for w in self._W_ONES])
        return F.when(
            h > 0,
            F.concat(
                F.element_at(ones, h + 1),
                F.lit(" hundred"),
                F.when(
                    r > 0, F.concat(F.lit(" and "), self._w99(r))
                ).otherwise(F.lit("")),
            ),
        ).otherwise(self._w99(r))

    def _words_col(self, n):
        """English words of a long Column, tier-2 `_to_words` parity for
        |n| < 10^15 (four scale groups, each head < 1000 — the same triplet
        decomposition). Beyond that the tier-2 recursion nests heads >= 1000
        at the trillion scale; a runtime guard errors rather than
        mis-render (callers route LITERAL big values to tier 2 via the
        fold path, and 10^15 exceeds any counting quantity)."""
        absn = F.abs(n)
        guard = F.when(
            absn >= F.lit(10**15),
            F.raise_error(
                F.lit("compiled $formatInteger words supports |n| < 1e15")
            ),
        ).otherwise(F.lit(""))
        groups = [
            ((absn / F.lit(10**12)) % 1000, "trillion"),
            ((absn / F.lit(10**9)) % 1000, "billion"),
            ((absn / F.lit(10**6)) % 1000, "million"),
            ((absn / F.lit(10**3)) % 1000, "thousand"),
        ]
        parts = [
            F.when(
                d.cast("long") > 0,
                F.concat(self._w999(d.cast("long")), F.lit(" " + name)),
            )
            for d, name in groups
        ]
        scales = F.concat_ws(" ", *parts)  # nulls (absent groups) skip
        u = absn % 1000
        body = F.when(
            u == 0,
            F.when(scales == "", F.lit("zero")).otherwise(scales),
        ).otherwise(
            F.when(scales == "", self._w999(u)).otherwise(
                F.concat(
                    scales,
                    F.when(u < 100, F.lit(" and ")).otherwise(F.lit(" ")),
                    self._w999(u),
                )
            )
        )
        return F.concat(
            guard, F.when(n < 0, F.lit("minus ")).otherwise(F.lit("")), body
        )

    def _words_ordinal_col(self, words):
        """tier-2 `_to_words_ordinal`: rewrite the final word — exception
        table, trailing-y -> ieth, else append th."""
        out = F.when(
            words.endswith("y"),
            F.concat(
                words.substr(F.lit(1), F.length(words) - 1), F.lit("ieth")
            ),
        ).otherwise(F.concat(words, F.lit("th")))
        for ws, wo in self._ORD_WORD_EXC:
            out = F.when(
                words.endswith(ws),
                F.concat(
                    words.substr(F.lit(1), F.length(words) - len(ws)),
                    F.lit(wo),
                ),
            ).otherwise(out)
        return out

    def _fn_formatInteger(self, a, ctx, env, raw):
        """Digit pictures AND the XPath word/roman/alpha/ordinal pictures
        (round 10 — closes the round-9 verdict's 'full XPath pictures'
        residual): 'w'/'W'/'Ww' (+';o'), 'i'/'I', 'a'/'A', and '<digits>;o'
        compile to pure Column lookup tables mirroring functions.py."""
        if len(raw) < 2 or raw[1]["type"] != "string":
            raise NotCompilable("$formatInteger with dynamic picture")
        pic = raw[1]["value"]
        n = F.round(self._num(a[0])).cast("long")
        ordinal = False
        if ";o" in pic:
            pic, ordinal = pic.split(";")[0], True
        if pic in ("w", "W", "Ww"):
            words = self._words_col(n)
            if ordinal:
                words = self._words_ordinal_col(words)
            if pic == "W":
                col = F.upper(words)
            elif pic == "Ww":
                # capitalize each space-separated word, tier-2 parity
                # (hyphenated pairs capitalize only their first word)
                col = F.array_join(
                    F.transform(
                        F.split(words, " "),
                        lambda w: F.concat(
                            F.upper(w.substr(F.lit(1), F.lit(1))),
                            w.substr(F.lit(2), F.length(w) - 1),
                        ),
                    ),
                    " ",
                )
            else:
                col = words
            return Typed(col, T.StringType())
        if pic in ("i", "I"):
            body = self._roman_col(F.abs(n))
            if pic == "I":
                body = F.upper(body)
            col = F.concat(
                F.when(n < 0, F.lit("-")).otherwise(F.lit("")), body
            )
            return Typed(col, T.StringType())
        if pic in ("a", "A"):
            body = self._alpha_col(n)
            if pic == "A":
                body = F.upper(body)
            return Typed(body, T.StringType())
        if re.fullmatch(r"[0-9]+", pic):
            # all-digit picture = zero-pad to len(pic). Tier 2 pads |n| and
            # PREPENDS the sign ('-007' for width 3), unlike Java's %0Nd
            # whose width includes the sign ('-07') — round-10 parity fix
            # for the round-8 zero-pad branch too.
            s = F.concat(
                F.when(n < 0, F.lit("-")).otherwise(F.lit("")),
                F.format_string(f"%0{len(pic)}d", F.abs(n)),
            )
        else:
            # grouped pictures ('#,##0' family) route through tier 2
            raise NotCompilable(f"$formatInteger picture {pic!r} (tier 2)")
        if ordinal:
            # tier-2 _ordinal_suffix: th for 10..20 mod 100, else st/nd/rd —
            # PYTHON mod (pmod), so negative n keeps tier-2's exact output
            # (-1 % 10 == 9 -> 'th', not 'st')
            mod100 = F.pmod(n, F.lit(100))
            mod10 = F.pmod(n, F.lit(10))
            suf = F.when(
                (mod100 >= 10) & (mod100 <= 20), F.lit("th")
            ).otherwise(
                F.when(mod10 == 1, F.lit("st"))
                .when(mod10 == 2, F.lit("nd"))
                .when(mod10 == 3, F.lit("rd"))
                .otherwise(F.lit("th"))
            )
            s = F.concat(s, suf)
        return Typed(s, T.StringType())

    def _fn_parseInteger(self, a, ctx, env, raw):
        if len(raw) < 2 or raw[1]["type"] != "string":
            raise NotCompilable("$parseInteger with dynamic picture")
        pic = raw[1]["value"]
        if pic in ("i", "I"):
            # roman parse (round 10): tier-2's reversed scan — subtract a
            # value smaller than the one to its right — as one aggregate
            # over the character positions, letter values via CASE.
            # Invalid characters raise (tier-2 D3137 parity).
            s = F.lower(a[0].col)
            val = lambda c: (  # noqa: E731
                F.when(c == "i", 1).when(c == "v", 5).when(c == "x", 10)
                .when(c == "l", 50).when(c == "c", 100).when(c == "d", 500)
                .when(c == "m", 1000)
                .otherwise(
                    F.raise_error(
                        F.concat(
                            F.lit("D3137: cannot parse roman numeral char "), c
                        )
                    ).cast("int")
                )
            )
            acc0 = F.struct(
                F.lit(0).cast("long").alias("total"),
                F.lit(0).cast("int").alias("prev"),
            )

            def step(acc, i):
                v = val(s.substr(i, F.lit(1)))
                return F.struct(
                    F.when(
                        v < acc.getField("prev"),
                        acc.getField("total") - v,
                    )
                    .otherwise(acc.getField("total") + v)
                    .alias("total"),
                    v.alias("prev"),
                )

            # reversed positions; empty string -> empty sequence -> 0
            # (tier-2: the loop body never runs)
            positions = F.when(
                F.length(s) > 0,
                F.sequence(F.length(s), F.lit(1), F.lit(-1)),
            ).otherwise(F.array().cast("array<int>"))
            total = F.aggregate(positions, acc0, step).getField("total")
            return Typed(total, T.LongType())
        if not re.fullmatch(r"0+", pic):
            raise NotCompilable("$parseInteger non-digit picture (tier 2)")
        return Typed(a[0].col.cast("long"), T.LongType())

    def _fn_contains(self, a, ctx, env, raw):
        if raw[-1]["type"] == "regex":
            return Typed(
                a[0].col.rlike(self._regex_java(raw[-1]["value"])), T.BooleanType()
            )
        return Typed(a[0].col.contains(a[1].col), T.BooleanType())

    def _fn_split(self, a, ctx, env, raw):
        import re as _re

        pat = raw[1]
        if pat["type"] == "regex":
            rx = self._regex_java(pat["value"])
        elif pat["type"] == "string":
            rx = _re.escape(pat["value"])
        else:
            raise NotCompilable("$split with dynamic separator")
        out = F.split(a[0].col, rx, F.lit(-1).cast("int"))
        if len(a) > 2:
            # JSONata limit truncates the RESULT ARRAY ($split("a,b,c", ",", 2)
            # = ["a","b"]); Spark's split limit keeps the remainder in the
            # last element and treats 0 as unlimited — so always split fully,
            # then slice. Matches the tier-2 interpreter (functions.py fn_split
            # parts[:limit]). Negative literal limit is a JSONata error
            # (D3020) — route to tier 2, which raises it.
            lim = raw[2]
            neg_literal = lim.get("type") == "unary" and lim.get("value") == "-" and (
                lim.get("expression", {}).get("type") == "number"
            )
            if neg_literal or (
                lim.get("type") == "number" and lim.get("value", 0) < 0
            ):
                raise NotCompilable("$split with negative limit")
            out = F.slice(out, F.lit(1), a[2].col.cast("int"))
        return Typed(out, T.ArrayType(T.StringType()))

    def _fn_join(self, a, ctx, env, raw):
        # pyspark array_join takes the delimiter as a Python str, so only a
        # literal separator compiles; dynamic separators fall to tier 2
        if len(a) > 1:
            if raw[1]["type"] != "string":
                raise NotCompilable("$join with non-literal separator")
            sep = raw[1]["value"]
        else:
            sep = ""
        return Typed(F.array_join(a[0].col, sep), T.StringType())

    def _fn_number(self, a, ctx, env, raw):
        return Typed((a[0] if a else ctx).col.cast("double"), T.DoubleType())

    def _fn_abs(self, a, ctx, env, raw):
        return Typed(F.abs(a[0].col), a[0].dtype)

    def _fn_floor(self, a, ctx, env, raw):
        return Typed(F.floor(self._num(a[0])), T.LongType())

    def _fn_ceil(self, a, ctx, env, raw):
        return Typed(F.ceil(self._num(a[0])), T.LongType())

    def _fn_round(self, a, ctx, env, raw):
        p = a[1].col if len(a) > 1 else F.lit(0)
        return Typed(F.bround(self._num(a[0]), p), T.DoubleType())  # banker's

    def _fn_power(self, a, ctx, env, raw):
        return Typed(F.pow(self._num(a[0]), self._num(a[1])), T.DoubleType())

    def _fn_sqrt(self, a, ctx, env, raw):
        return Typed(F.sqrt(self._num(a[0])), T.DoubleType())

    def _fn_random(self, a, ctx, env, raw):
        return Typed(F.rand(), T.DoubleType())

    def _fn_formatBase(self, a, ctx, env, raw):
        # conv() takes literal int bases, treats negatives as unsigned
        # 64-bit, and JSONata rounds the input — handle all three
        if len(raw) > 1 and raw[1]["type"] != "number":
            raise NotCompilable("$formatBase with dynamic radix")
        radix = int(raw[1]["value"]) if len(raw) > 1 else 10
        if not 2 <= radix <= 36:
            raise NotCompilable("$formatBase radix out of range (D3100)")
        n = F.round(self._num(a[0])).cast("long")
        mag = F.lower(F.conv(F.abs(n).cast("string"), 10, radix))
        col = F.when(n < 0, F.concat(F.lit("-"), mag)).otherwise(mag)
        return Typed(col, T.StringType())

    def _fn_formatNumber(self, a, ctx, env, raw):
        # Common-picture subset (the '#,##0.00' family JSONata4Java users
        # hit constantly) compiles to native format_number: same 3-digit
        # grouping, same minimum-one-integer-digit, and java.text
        # .DecimalFormat's HALF_EVEN matches the interpreter's Decimal
        # quantize (functions.py fn_format_number). Everything else —
        # options argument, %, per-mille, pos;neg split, exotic grouping —
        # stays tier 2.
        if len(a) != 2 or raw[1].get("type") != "string":
            raise NotCompilable("$formatNumber with options/dynamic picture")
        pic = raw[1]["value"]
        mz = re.fullmatch(r"([0-9]+)(?:\.([0-9]+))?(%)?", pic)
        if mz is not None:
            # zero-pad family (round 7): '00.000', '01%' — every decimal
            # digit 0-9 is a MANDATORY-digit position in an XPath picture
            # (the round-5 conformance fix), so width = digit count.
            # bround (HALF_EVEN, the XPath/DecimalFormat rule) the exact
            # decimal of the shortest repr, then pad the integer digits.
            # lpad TRUNCATES overlong input, so pad only when shorter.
            i_w = len(mz.group(1))
            f_w = len(mz.group(2) or "")
            # the intermediate decimal caps at scale 15 (scale drops to 11
            # after the % *100 — Spark decimal multiplication semantics),
            # so deeper fractional pictures would silently zero-fill digits
            # tier 2 formats exactly -> route them to tier 2 (round-7
            # second-review fix)
            if f_w > (10 if mz.group(3) else 14):
                raise NotCompilable(
                    f"$formatNumber picture {pic!r} fraction too deep (tier 2)"
                )
            x = self._num(a[0])
            # sign from the INPUT, not the rounded decimal: -0.004 at '0.00'
            # prints '-0.00' in tier 2 (Decimal keeps the signed zero;
            # Spark decimals do not), and so does a literal -0.0 — detected
            # via Java toString's leading '-' (the former 1/x = -Infinity
            # probe raised ANSI DIVIDE_BY_ZERO on any 0.0 in the data;
            # round-8 fix)
            neg = (x < 0) | ((x == 0) & x.cast("string").startswith("-"))
            # ONE rounding step (round-8 advisor fix): the old
            # cast(decimal(38,15)) HALF_UP-rounded a >15-fraction-digit
            # shortest repr before the picture-scale HALF_EVEN bround
            # (0.3499999999999999 at '0.0' -> 0.35 -> "0.4"; tier 2 says
            # "0.3").  Shortest reprs carry <=17 significant digits, so
            # scale 37 is EXACT for |x|<1 (frac digits <= 16+16+5 margin,
            # and below 1e-21 any truncation is >=20 positions past any
            # f_w<=14 tie — unreachable within 17 sig digits) and scale 16
            # is EXACT for 1<=|x|<1e22 (frac digits <= 16, int digits <=
            # 22, 38 total).  bround is then the only rounding.
            val_lo = x.cast("string").cast("decimal(38,37)")
            val_hi = x.cast("string").cast("decimal(38,16)")
            if mz.group(3):
                # round ONCE at f_w+2 (== rounding x*100 at f_w), then
                # shift by 100 exactly: decimal(34,f_w+2)*100 fits p38
                q_lo = F.bround(val_lo, f_w + 2).cast(f"decimal(34,{f_w + 2})")
                q_hi = F.bround(val_hi, f_w + 2).cast(f"decimal(34,{f_w + 2})")
                q = F.when(F.abs(x) < 1, q_lo).otherwise(q_hi) * 100
            else:
                q = F.when(
                    F.abs(x) < 1, F.bround(val_lo, f_w)
                ).otherwise(F.bround(val_hi, f_w))
            q = q.cast(f"decimal(38,{f_w})")
            s = F.abs(q).cast("string")
            ip = F.substring_index(s, ".", 1)
            ip = F.when(F.length(ip) < i_w, F.lpad(ip, i_w, "0")).otherwise(ip)
            small = (
                F.concat(ip, F.lit("."), F.substring_index(s, ".", -1))
                if f_w
                else ip
            )
            # |x| >= 1e22 overflows decimal(38,15) (ANSI error / NULL) —
            # such doubles are integral (spacing >= 2048 past 2^53), so
            # their full digit string is shortest-digits + zeros; the %
            # scaling appends two more zeros exactly (round-7 review fix)
            digs, kk, ll = shortest_repr_parts(F.abs(x))
            k_eff = kk + (2 if mz.group(3) else 0)
            ibig = F.concat(digs, F.repeat(F.lit("0"), k_eff - ll + 1))
            ibig = F.when(F.length(ibig) < i_w, F.lpad(ibig, i_w, "0")).otherwise(
                ibig
            )
            big = (
                F.concat(ibig, F.lit("."), F.lit("0" * f_w)) if f_w else ibig
            )
            body = F.when(F.abs(x) < 1e22, small).otherwise(big)
            out = F.when(neg, F.concat(F.lit("-"), body)).otherwise(body)
            if mz.group(3):
                out = F.concat(out, F.lit("%"))
            return Typed(out, T.StringType())
        m = re.fullmatch(r"#,##0(?:\.(0+))?", pic)
        if m is None:
            raise NotCompilable(f"$formatNumber picture {pic!r}")
        # round the SHORTEST DECIMAL REPR, not the binary double: double ->
        # string gives the shortest repr, -> decimal makes it exact, and
        # format_number's DecimalFormat HALF_EVENs that — matching the
        # interpreter's Decimal(repr(x)).quantize (and jsonata-js, which
        # also formats from the decimal repr). format_number directly on
        # the double would round 42.555 (binary 42.55499..) DOWN where
        # both reference tiers round up.
        as_decimal = self._num(a[0]).cast("string").cast("decimal(38,15)")
        return Typed(
            F.format_number(as_decimal, len(m.group(1) or "")),
            T.StringType(),
        )

    # --- URL functions (round 7) -------------------------------------------
    # Spark's url_encode/url_decode are java.net form-encoding; the fixups
    # below translate exactly to/from the JS encodeURIComponent/encodeURI
    # conventions tier 2 implements with urllib.parse.quote (space = %20
    # not '+'; ! ~ ' ( ) unescaped; encodeURI additionally keeps the
    # reserved set). Every '%' in url_encode output starts a full %XX
    # triple, so triple-string replacement cannot corrupt other sequences.
    _URL_COMPONENT_FIXES = (
        ("%21", "!"), ("%27", "'"), ("%28", "("), ("%29", ")"), ("%7E", "~"),
    )
    _URL_RESERVED_FIXES = (
        ("%3B", ";"), ("%2F", "/"), ("%3F", "?"), ("%3A", ":"), ("%40", "@"),
        ("%26", "&"), ("%3D", "="), ("%2B", "+"), ("%24", "$"), ("%2C", ","),
        ("%23", "#"),
    )

    def _url_encoded(self, col: Column, fixes) -> Column:
        s = F.replace(F.url_encode(col), F.lit("+"), F.lit("%20"))
        for pat, ch in fixes:
            s = F.replace(s, F.lit(pat), F.lit(ch))
        return s

    def _fn_encodeUrlComponent(self, a, ctx, env, raw):
        v = a[0] if a else ctx
        return Typed(
            self._url_encoded(v.col, self._URL_COMPONENT_FIXES), T.StringType()
        )

    def _fn_encodeUrl(self, a, ctx, env, raw):
        v = a[0] if a else ctx
        return Typed(
            self._url_encoded(
                v.col, self._URL_COMPONENT_FIXES + self._URL_RESERVED_FIXES
            ),
            T.StringType(),
        )

    # $decodeUrl/$decodeUrlComponent are deliberately NOT compiled:
    # java.net.URLDecoder (F.url_decode) THROWS on a malformed
    # percent-sequence ("100% organic" aborts the whole job), while tier 2's
    # urllib.parse.unquote decodes the valid sequences and passes invalid
    # ones through — partial-decode semantics Catalyst string functions
    # cannot replicate. Decode routes to tier 2 (review finding, round 7).

    def _fn_sum(self, a, ctx, env, raw):
        return Typed(
            F.aggregate(a[0].col, F.lit(0.0), lambda acc, x: acc + x.cast("double")),
            T.DoubleType(),
        )

    def _fn_max(self, a, ctx, env, raw):
        return Typed(F.array_max(a[0].col), _elem_type(a[0]))

    def _fn_min(self, a, ctx, env, raw):
        return Typed(F.array_min(a[0].col), _elem_type(a[0]))

    def _fn_average(self, a, ctx, env, raw):
        s = F.aggregate(a[0].col, F.lit(0.0), lambda acc, x: acc + x.cast("double"))
        return Typed(s / F.size(a[0].col), T.DoubleType())

    def _descendant_count(self, col, dt):
        """Emitted-position count of jsonata-js recurseDescendants over a
        closed-world schema: objects push themselves then recurse into
        values, arrays recurse into members WITHOUT pushing themselves,
        scalars push. SQL NULL reads as ABSENT (the documented
        missing-vs-null conflation), contributing 0."""
        if isinstance(dt, T.StructType):
            inner = F.lit(0)
            for f in dt.fields:
                inner = inner + self._descendant_count(
                    col.getField(f.name), f.dataType
                )
            return F.when(col.isNotNull(), inner + 1).otherwise(F.lit(0))
        if isinstance(dt, T.ArrayType):
            et = dt.elementType
            if isinstance(et, (T.StructType, T.ArrayType)):
                per = F.aggregate(
                    col,
                    F.lit(0),
                    lambda acc, x: acc + self._descendant_count(x, et),
                )
                return F.coalesce(per, F.lit(0))
            return F.coalesce(F.size(col), F.lit(0))
        if isinstance(dt, T.MapType):
            # a map IS an object: pushes itself + recurses into values
            vt = dt.valueType
            if isinstance(vt, (T.StructType, T.ArrayType, T.MapType)):
                per = F.aggregate(
                    F.map_values(col),
                    F.lit(0),
                    lambda acc, x: acc + self._descendant_count(x, vt),
                )
            else:
                per = F.size(col)
            return F.when(col.isNotNull(), per + 1).otherwise(F.lit(0))
        return F.when(col.isNotNull(), F.lit(1)).otherwise(F.lit(0))

    def _fn_count(self, a, ctx, env, raw):
        v = a[0] if a else ctx
        if isinstance(v.dtype, T.ArrayType):
            return Typed(F.coalesce(F.size(v.col), F.lit(0)), T.IntegerType())
        return Typed(F.when(v.col.isNull(), 0).otherwise(1), T.IntegerType())

    def _fn_boolean(self, a, ctx, env, raw):
        return Typed(self._truthy(a[0] if a else ctx), T.BooleanType())

    def _fn_eval(self, a, ctx, env, raw):
        """$eval with a LITERAL expression string and a schema-stable
        context (round 10, verdict item 6): the literal parses ONCE at
        compile time and the inner AST compiles against the context
        argument's static type as its root — the dynamic-evaluation
        surface becomes an ordinary typed projection (the round-9 version
        required a LITERAL context and could only constant-fold). Truly
        dynamic expression strings, and context expressions without a
        compilable static type, stay tier 2. Without a context argument
        the inner expression evaluates against the ROOT input and the
        caller's environment stays visible (tier-2 eval_string semantics) —
        both mirrored here via _root_ctx / env pass-through."""
        if not raw or raw[0]["type"] != "string":
            raise NotCompilable("$eval with a dynamic expression string")
        try:
            inner = parse(raw[0]["value"])
        except Exception as e:  # noqa: BLE001 — tier 2 raises D3120 itself
            raise NotCompilable(f"$eval of unparseable literal: {e}")
        if len(raw) >= 2:
            base = a[1]
            if base is None or base.dtype is None:
                raise NotCompilable("$eval context without a static type")
        else:
            base = getattr(self, "_root_ctx", None) or ctx
        return self._c(inner, Typed(base.col, base.dtype), env)

    def _fn_not(self, a, ctx, env, raw):
        return Typed(~self._truthy(a[0] if a else ctx), T.BooleanType())

    def _fn_exists(self, a, ctx, env, raw):
        return Typed(a[0].col.isNotNull(), T.BooleanType())

    def _fn_append(self, a, ctx, env, raw):
        # a statically-undefined operand (the _UndefArg sentinel from
        # _call.arg_of) yields the OTHER operand unchanged — the jsonata
        # rule ($append(nothing, 1) = 1); both undefined stays tier 2
        if isinstance(a[0], _UndefArg) and isinstance(a[1], _UndefArg):
            raise NotCompilable("$append of two undefined operands")
        if isinstance(a[0], _UndefArg):
            return a[1]
        if isinstance(a[1], _UndefArg):
            return a[0]
        l = a[0].col if isinstance(a[0].dtype, T.ArrayType) else F.array(a[0].col)
        r = a[1].col if isinstance(a[1].dtype, T.ArrayType) else F.array(a[1].col)
        et = _elem_type(a[0]) if isinstance(a[0].dtype, T.ArrayType) else a[0].dtype
        return Typed(F.concat(l, r), T.ArrayType(et or T.StringType()))

    def _fn_reverse(self, a, ctx, env, raw):
        return Typed(F.reverse(a[0].col), a[0].dtype)

    def _fn_distinct(self, a, ctx, env, raw):
        return Typed(F.array_distinct(a[0].col), a[0].dtype)

    def _fn_sort(self, a, ctx, env, raw):
        arr = a[0]
        if not isinstance(arr.dtype, T.ArrayType):
            raise NotCompilable("$sort over non-array")
        if len(raw) > 1:
            # comparator(l, r) returns true when l sorts AFTER r; compile to
            # array_sort's 3-way form. 0 on "neither after" keeps Java's
            # TimSort stable for equal keys (the corpus pins stability).
            params, body, base_env = self._resolve_lambda(raw[1], env)
            if len(params) < 2:
                raise NotCompilable("$sort comparator arity")
            et = arr.dtype.elementType

            def after(x, y):
                child = dict(base_env)
                child[params[0]] = Typed(x, et)
                child[params[1]] = Typed(y, et)
                return self._truthy(self._c(body, ctx, child))

            def cmp(l, r):
                return (
                    F.when(after(l, r), F.lit(1))
                    .when(after(r, l), F.lit(-1))
                    .otherwise(F.lit(0))
                )

            return Typed(F.array_sort(arr.col, cmp), arr.dtype)
        return Typed(F.array_sort(arr.col), arr.dtype)

    def _fn_zip(self, a, ctx, env, raw):
        # JSONata $zip returns an array of ARRAYS; arrays_zip's structs
        # would serialize as {"0":...} objects (round-5 dual-tier sweep
        # fix). Same-typed inputs rebuild each tuple as an array; mixed
        # types have no uniform Spark element type -> tier 2. $zip
        # truncates to the shortest input.
        ets = []
        for x in a:
            if not isinstance(x.dtype, T.ArrayType):
                raise NotCompilable("$zip over non-array")
            ets.append(x.dtype.elementType)
        if len({e.simpleString() for e in ets}) != 1:
            raise NotCompilable("$zip over mixed element types (tier 2)")
        n = F.least(*[F.size(x.col) for x in a]) if len(a) > 1 else F.size(a[0].col)
        idx = F.when(n >= 1, F.sequence(F.lit(1), n)).otherwise(
            F.array().cast("array<int>")
        )
        cols = [x.col for x in a]
        tup = F.transform(
            idx, lambda i: F.array(*[F.element_at(c, i) for c in cols])
        )
        return Typed(tup, T.ArrayType(T.ArrayType(ets[0])))

    def _group(self, node, ctx: Typed, env: dict) -> Typed:
        """B2.2 group-by constructor ``seq{key: value}`` -> MapType.
        Distinct keys in first-occurrence order (map_from_entries preserves
        entry order, matching the interpreter's insertion-ordered dict);
        the value expression compiles against the grouped SUB-SEQUENCE.

        Compiled subset: single pair (multi-pair needs runtime D1009
        duplicate-key detection), statically-string key, and a non-array
        value dtype — sequence-valued groups would need the interpreter's
        dynamic singleton unwrap, which no fixed Spark type can express.
        Null keys drop their items (undefined-key semantics; tier 1's
        documented NULL conflation applies); null values drop their keys
        (undefined-value pair omission, same conflation)."""
        base = self._c(node["expr"], ctx, env)
        if isinstance(base.dtype, T.ArrayType):
            arr, et = base.col, base.dtype.elementType
        elif base.dtype is not None and not isinstance(base.dtype, T.NullType):
            # scalar context: a one-item sequence
            arr, et = F.array(base.col), base.dtype
        else:
            raise NotCompilable("group-by over untyped context")
        if len(node["pairs"]) != 1:
            raise NotCompilable("group-by with multiple pairs (D1009 tier 2)")
        kexpr, vexpr = node["pairs"][0]

        def key_of(x):
            k = self._c(kexpr, Typed(x, et), env)
            if not isinstance(k.dtype, T.StringType):
                raise NotCompilable("group-by key not statically a string")
            return k.col

        keys = F.array_distinct(
            F.filter(F.transform(arr, key_of), lambda k: k.isNotNull())
        )
        vt_box: list = []

        def entry(k):
            grp = F.filter(arr, lambda x: key_of(x) == k)
            v = self._c(vexpr, Typed(grp, T.ArrayType(et)), env)
            if isinstance(v.dtype, T.ArrayType):
                raise NotCompilable(
                    "group-by value of sequence type (singleton unwrap)"
                )
            vt_box.append(v.dtype)
            return F.struct(k.alias("key"), v.col.alias("value"))

        entries = F.filter(
            F.transform(keys, entry), lambda e: e.getField("value").isNotNull()
        )
        col = F.map_from_entries(entries)
        # a missing/empty input sequence still constructs {} (the
        # interpreter grinds an UNDEFINED placeholder through the pairs)
        col = F.coalesce(col, F.map_from_entries(F.array().cast(
            T.ArrayType(T.StructType([
                T.StructField("key", T.StringType()),
                T.StructField("value", vt_box[0] or T.StringType()),
            ]))
        )))
        return Typed(col, T.MapType(T.StringType(), vt_box[0] or T.StringType()))

    def _sort(self, node, ctx: Typed, env: dict) -> Typed:
        """B2.5 ``^(key, >key)`` order-by over an ARRAY column: array_sort
        with a compiled comparator (terms left-to-right, ``>`` descending).
        Null keys compare equal and fall through to the next term; tier 2
        handles row sequences and error-on-mixed-type semantics."""
        base = self._c(node["expr"], ctx, env)
        if not isinstance(base.dtype, T.ArrayType):
            raise NotCompilable("^ sort over non-array")
        et = base.dtype.elementType
        terms = node["terms"]

        def comparator(l, r):
            expr = F.lit(0)
            for term in reversed(terms):
                kl = self._c(term["expression"], Typed(l, et), dict(env)).col
                kr = self._c(term["expression"], Typed(r, et), dict(env)).col
                lt, gt = (
                    (F.lit(1), F.lit(-1)) if term["descending"] else (F.lit(-1), F.lit(1))
                )
                expr = F.when(kl < kr, lt).when(kl > kr, gt).otherwise(expr)
            return expr

        return Typed(F.array_sort(base.col, comparator), base.dtype)

    def _fn_each(self, a, ctx, env, raw):
        """$each(obj, fn($v,$k)) -> array. Struct inputs expand statically
        (one element per field, $k a compile-time literal — all results
        must share a type); map inputs run transform over map_entries."""
        lam = raw[-1]
        if lam["type"] != "lambda" or not lam["args"]:
            raise NotCompilable("$each requires an inline lambda")
        params = lam["args"]
        obj = ctx if raw[0]["type"] == "lambda" else a[0]
        if isinstance(obj.dtype, T.MapType):
            vt = obj.dtype.valueType
            out_t: list = [None]

            def body(e):
                child = dict(env)
                child[params[0]] = Typed(e.getField("value"), vt)
                if len(params) > 1:
                    child[params[1]] = Typed(e.getField("key"), obj.dtype.keyType)
                r = self._c(lam["body"], Typed(e.getField("value"), vt), child)
                out_t[0] = r.dtype
                return r.col

            col = F.transform(F.map_entries(obj.col), body)
            return Typed(col, T.ArrayType(out_t[0] or T.StringType()))
        if isinstance(obj.dtype, T.StructType):
            cols, dts = [], []
            for f in obj.dtype.fields:
                child = dict(env)
                fv = Typed(obj.col.getField(f.name), f.dataType)
                child[params[0]] = fv
                if len(params) > 1:
                    child[params[1]] = Typed(F.lit(f.name), T.StringType())
                r = self._c(lam["body"], fv, child)
                cols.append(r.col)
                dts.append(r.dtype)
            if not cols:
                raise NotCompilable("$each over empty struct")
            if len({str(d) for d in dts}) != 1:
                raise NotCompilable("$each with heterogeneous result types")
            return Typed(F.array(*cols), T.ArrayType(dts[0]))
        raise NotCompilable("$each over non-object")

    @staticmethod
    def _struct_as_map(v: Typed) -> Typed | None:
        """Bridge a HOMOGENEOUS struct (every field the same type) to
        map<string, T> — lets map-shaped handlers ($spread, value-dependent
        $sift) compile struct inputs whose output field set is only known
        per row (round 7). Heterogeneous structs return None (tier 2)."""
        dt = v.dtype
        if not isinstance(dt, T.StructType) or not dt.fields:
            return None
        if len({f.dataType.simpleString() for f in dt.fields}) != 1:
            return None
        # NULL struct row must stay NULL (undefined in tier 2) — a bare
        # map_from_arrays over literal keys is never null and would
        # fabricate {k: null, ...} entries (round-8 advisor fix).
        col = F.when(
            v.col.isNotNull(),
            F.map_from_arrays(
                F.array(*[F.lit(f.name) for f in dt.fields]),
                F.array(*[v.col.getField(f.name) for f in dt.fields]),
            ),
        )
        return Typed(col, T.MapType(T.StringType(), dt.fields[0].dataType))

    def _fn_spread(self, a, ctx, env, raw):
        """$spread(obj) -> array of single-entry maps. Struct inputs bridge
        through _struct_as_map when homogeneous; heterogeneous structs
        would need per-element schemas — tier 2."""
        v = a[0] if a else ctx
        if isinstance(v.dtype, T.StructType):
            bridged = self._struct_as_map(v)
            if bridged is None:
                raise NotCompilable("$spread over heterogeneous struct")
            v = bridged
        if isinstance(v.dtype, T.MapType):
            col = F.transform(
                F.map_entries(v.col),
                lambda e: F.create_map(e.getField("key"), e.getField("value")),
            )
            return Typed(col, T.ArrayType(T.MapType(v.dtype.keyType, v.dtype.valueType)))
        raise NotCompilable("$spread over non-map")

    def _fn_sift(self, a, ctx, env, raw):
        """$sift(obj, fn($v, $k)) — the reference's remove-field idiom
        (JsonataTransformationTest.java:77-88, README.md:21-27). Struct
        inputs compile to STATIC field selection when the predicate depends
        only on the key: the lambda body is constant-folded per field name
        through the interpreter at compile time, so the runtime plan is a
        plain narrower struct. Map inputs compile to map_filter."""
        lam = raw[-1]
        if lam["type"] != "lambda" or not lam["args"]:
            raise NotCompilable("$sift requires an inline lambda")
        params = lam["args"]
        obj = ctx if raw[0]["type"] == "lambda" else a[0]
        if isinstance(obj.dtype, T.MapType):
            vt = obj.dtype.valueType

            def pred(k, v):
                child = dict(env)
                child[params[0]] = Typed(v, vt)
                if len(params) > 1:
                    child[params[1]] = Typed(k, obj.dtype.keyType)
                return self._truthy(self._c(lam["body"], Typed(v, vt), child))

            filtered = F.map_filter(obj.col, pred)
            # a sift that keeps NOTHING is undefined in jsonata (sift of
            # {} included) — NULL, not an empty map (round-11 suite port)
            return Typed(
                F.when(F.size(filtered) > 0, filtered), obj.dtype
            )
        if isinstance(obj.dtype, T.StructType):
            if not obj.dtype.fields:
                # $sift({}) is undefined in jsonata (sift of an empty
                # object yields no fields -> undefined, jsonata-js sift);
                # the empty struct the compiled tier would produce is a
                # VALUE — route to tier 2 (round-11 suite port)
                raise NotCompilable("$sift over empty object (undefined)")
            if len(params) < 2 or _mentions_var(lam["body"], params[0]):
                # value-dependent predicate: the surviving field set varies
                # per row, so no static struct exists — but a HOMOGENEOUS
                # struct bridges to a map and compiles via map_filter
                # (round 7)
                bridged = self._struct_as_map(obj)
                if bridged is not None:
                    vt = bridged.dtype.valueType

                    def pred(k, v):
                        child = dict(env)
                        child[params[0]] = Typed(v, vt)
                        if len(params) > 1:
                            child[params[1]] = Typed(k, T.StringType())
                        return self._truthy(
                            self._c(lam["body"], Typed(v, vt), child)
                        )

                    filtered = F.map_filter(bridged.col, pred)
                    return Typed(
                        F.when(F.size(filtered) > 0, filtered),
                        bridged.dtype,
                    )
                raise NotCompilable("$sift over struct with value-dependent predicate")
            from kafka_connect_jsonata_spark.jsonata.functions import boolean_of
            from kafka_connect_jsonata_spark.jsonata.interpreter import Jsonata

            folder = Jsonata(lam["body"])
            keep = [
                f
                for f in obj.dtype.fields
                if boolean_of(folder.evaluate({}, bindings={params[1]: f.name})) is True
            ]
            if not keep:
                raise NotCompilable("$sift removes every field (undefined in tier 2)")
            return Typed(
                F.struct(*[obj.col.getField(f.name).alias(f.name) for f in keep]),
                T.StructType([T.StructField(f.name, f.dataType) for f in keep]),
            )
        raise NotCompilable("$sift over non-object")

    def _fn_merge(self, a, ctx, env, raw):
        """$merge([o1, o2, ...]) — right-most wins (reference removeEmail
        idiom, JsonataTransformationTest.java:77-88). Compiles when the
        argument is a literal array of struct-typed expressions: the output
        schema is the field-by-field overlay, derived statically."""
        if len(raw) == 1 and raw[0]["type"] != "array":
            # $merge(obj) — a single object is a singleton sequence; the
            # merge of one object is itself (round 7)
            v = self._c(raw[0], ctx, env)
            if isinstance(v.dtype, (T.StructType, T.MapType)):
                return v
            raise NotCompilable("$merge over a non-object argument")
        if len(raw) != 1 or raw[0]["type"] != "array":
            raise NotCompilable("$merge with non-literal array argument")
        elems = [self._c(e, ctx, env) for e in raw[0]["expressions"]]
        if not elems:
            # $merge([]) is the empty object (round 9); same empty-map
            # rendering as an all-undefined object constructor
            return Typed(
                F.create_map().cast("map<string,string>"),
                T.MapType(T.StringType(), T.StringType()),
            )
        if not all(isinstance(e.dtype, T.StructType) for e in elems):
            raise NotCompilable("$merge over non-struct elements")
        cols: dict[str, Column] = {}
        dts: dict[str, T.DataType] = {}
        order: list[str] = []
        for e in elems:
            for f in e.dtype.fields:
                if f.name not in dts:
                    order.append(f.name)
                cols[f.name] = e.col.getField(f.name)
                dts[f.name] = f.dataType
        return Typed(
            F.struct(*[cols[n].alias(n) for n in order]),
            T.StructType([T.StructField(n, dts[n]) for n in order]),
        )

    def _fn_replace(self, a, ctx, env, raw):
        s = a[0].col
        pat = raw[1]
        if len(a) > 3:
            # limit form (round 8): replace at most N occurrences =
            # split(s, pat, N+1) — Java split applies the pattern at most
            # N times and leaves the remainder in the last element — then
            # re-join with the replacement. Literal non-negative limits
            # only; the replacement must carry no $N group refs (groups
            # don't survive a split); zero-length-matchable patterns keep
            # tier 2's D1004 error path.
            if raw[3].get("type") != "number" or int(raw[3]["value"]) < 0:
                raise NotCompilable("$replace with dynamic/negative limit")
            limit = int(raw[3]["value"])
            if pat["type"] == "string":
                if pat["value"] == "":
                    raise NotCompilable(
                        "$replace with empty pattern (tier-2 error path)"
                    )
                java_pat = "\\Q" + pat["value"].replace("\\E", "\\E\\\\E\\Q") + "\\E"
            elif pat["type"] == "regex":
                java_pat = self._regex_java(pat["value"])
                try:
                    if re.compile(java_pat).match(""):
                        raise NotCompilable(
                            "$replace zero-length-matchable pattern (D1004)"
                        )
                except re.error:
                    raise NotCompilable("$replace regex not Python-validatable")
            else:
                raise NotCompilable("$replace with dynamic pattern")
            repl = raw[2]
            if repl["type"] != "string":
                raise NotCompilable("$replace limit with dynamic replacement")
            rv = repl["value"].replace("$$", "\x00")
            if re.search(r"\$\d", rv):
                # group refs UNDER a limit (round 10, the round-9 verdict's
                # residual): groups don't survive a split, but the split
                # still finds the boundary — the LAST element of
                # split(s, pat, N+1) is the untouched remainder after the
                # N-th match, so regexp_replace the HEAD (where group refs
                # work, exactly the first <=N matches) and re-attach the
                # tail. Literal patterns have no groups, so a $N there is
                # out-of-range -> tier-2 error semantics.
                if pat["type"] != "regex":
                    raise NotCompilable(
                        "$replace literal pattern with group refs (tier 2)"
                    )
                try:
                    ngroups = re.compile(java_pat).groups
                except re.error:
                    raise NotCompilable("$replace regex not Python-validatable")
                rv2 = repl["value"].replace("\\", "\\\\").replace("$$", "\x00")
                for m in re.finditer(r"\$(\d+)", rv2):
                    if int(m.group(1)) > ngroups:
                        raise NotCompilable(
                            "$replace group ref out of range (tier-2 semantics)"
                        )
                rv2 = re.sub(r"\$(?!\d)", "\\\\$", rv2).replace("\x00", "\\$")
                parts = F.split(s, java_pat, limit + 1)
                tail = F.element_at(parts, -1)
                head = s.substr(F.lit(1), F.length(s) - F.length(tail))
                return Typed(
                    F.concat(F.regexp_replace(head, java_pat, rv2), tail),
                    T.StringType(),
                )
            rv = rv.replace("\x00", "$")
            return Typed(
                F.array_join(F.split(s, java_pat, limit + 1), rv),
                T.StringType(),
            )
        if pat["type"] == "string":
            if pat["value"] == "":
                raise NotCompilable("$replace with empty pattern (tier-2 error path)")
            return Typed(F.replace(s, F.lit(pat["value"]), a[2].col), T.StringType())
        if pat["type"] == "regex":
            repl = raw[2]
            if repl["type"] != "string":
                raise NotCompilable("$replace regex with dynamic replacement")
            # JSONata replacement syntax: $N = group ref (same as Java),
            # $$ = literal dollar (Java spells it \$); backslashes are
            # literal in JSONata but escapes in Java Matcher replacement.
            # A lone '$' not followed by a digit is a LITERAL in JSONata but
            # a group-ref error in Java — escape it.  Out-of-range $N throws
            # at action time in Java (after tier selection, so auto mode
            # could not fall back) — validate group count here and route to
            # tier 2 instead.
            java_pat = self._regex_java(pat["value"])
            try:
                ngroups = re.compile(java_pat).groups
            except re.error:
                raise NotCompilable("$replace regex not Python-validatable")
            rv = repl["value"].replace("\\", "\\\\").replace("$$", "\x00")
            for m in re.finditer(r"\$(\d+)", rv):
                if int(m.group(1)) > ngroups:
                    raise NotCompilable(
                        "$replace group ref out of range (tier-2 semantics)"
                    )
            rv = re.sub(r"\$(?!\d)", "\\\\$", rv).replace("\x00", "\\$")
            return Typed(
                F.regexp_replace(s, java_pat, rv),
                T.StringType(),
            )
        raise NotCompilable("$replace with dynamic pattern")

    def _fn_shuffle(self, a, ctx, env, raw):
        arr = a[0] if a else ctx
        if not isinstance(arr.dtype, T.ArrayType):
            raise NotCompilable("$shuffle over non-array")
        return Typed(F.shuffle(arr.col), arr.dtype)

    def _fn_type(self, a, ctx, env, raw):
        v = a[0] if a else ctx
        dt = v.dtype
        if isinstance(dt, (T.StructType, T.MapType)):
            name = "object"
        elif isinstance(dt, T.ArrayType):
            name = "array"
        elif isinstance(dt, T.BooleanType):
            name = "boolean"
        elif isinstance(dt, T.StringType):
            name = "string"
        elif isinstance(dt, T.NumericType):
            name = "number"
        else:
            raise NotCompilable(f"$type over {dt}")
        # the static schema decides the tag; only nullness is runtime
        return Typed(
            F.when(v.col.isNull(), F.lit("null")).otherwise(F.lit(name)), T.StringType()
        )

    def _fn_error(self, a, ctx, env, raw):
        msg = self._str(a[0]) if a else F.lit("$error() function evaluated")
        return Typed(F.raise_error(msg), T.NullType())

    def _fn_assert(self, a, ctx, env, raw):
        cond = self._truthy(a[0])
        msg = self._str(a[1]) if len(a) > 1 else F.lit("$assert() statement failed")
        return Typed(F.when(~cond, F.raise_error(msg)), T.NullType())

    def _fn_keys(self, a, ctx, env, raw):
        v = a[0] if a else ctx
        if isinstance(v.dtype, T.MapType):
            return Typed(F.map_keys(v.col), T.ArrayType(v.dtype.keyType))
        if isinstance(v.dtype, T.StructType):
            return Typed(
                F.array(*[F.lit(n) for n in v.dtype.fieldNames()]),
                T.ArrayType(T.StringType()),
            )
        raise NotCompilable("$keys over non-object")

    def _fn_lookup(self, a, ctx, env, raw):
        v = a[0]
        if isinstance(v.dtype, T.MapType):
            return Typed(F.element_at(v.col, a[1].col), v.dtype.valueType)
        if isinstance(v.dtype, T.StructType):
            if raw[-1]["type"] != "string":
                raise NotCompilable("$lookup over struct with dynamic key")
            key = raw[-1]["value"]
            if key not in v.dtype.fieldNames():
                # statically absent key -> undefined
                return Typed(F.lit(None), T.NullType())
            return Typed(v.col.getField(key), v.dtype[key].dataType)
        if isinstance(v.dtype, T.ArrayType) and isinstance(
            v.dtype.elementType, T.StructType
        ):
            # implicit mapping over an array of objects, like a path step
            inner = v.dtype.elementType
            if raw[-1]["type"] != "string":
                raise NotCompilable("$lookup over struct with dynamic key")
            key = raw[-1]["value"]
            if key not in inner.fieldNames():
                return Typed(F.lit(None), T.NullType())
            out_t = inner[key].dataType
            if isinstance(out_t, T.ArrayType):
                raise NotCompilable("nested-array flatten in $lookup mapping")
            col = F.filter(
                F.transform(v.col, lambda x: x.getField(key)),
                lambda r: r.isNotNull(),
            )
            return Typed(col, T.ArrayType(out_t))
        raise NotCompilable("$lookup over non-map")

    def _fn_base64encode(self, a, ctx, env, raw):
        return Typed(F.base64(a[0].col.cast("binary")), T.StringType())

    def _fn_base64decode(self, a, ctx, env, raw):
        return Typed(F.unbase64(a[0].col).cast("string"), T.StringType())

    # explicitly-padded picture components (the ISO-style pictures users
    # write) -> java.text format letters; unpadded/named/ordinal components
    # and timezone args stay tier 2
    _DT_PICTURE_COMPONENTS = {
        "Y0001": "yyyy",
        "M01": "MM",
        "D01": "dd",
        "H01": "HH",
        "m01": "mm",
        "s01": "ss",
        "f001": "SSS",
        # XPath DEFAULT presentations (round 7): Y/M/D/H default to the
        # unpadded decimal '1' (Java's single letter prints minimum
        # digits); minutes/seconds default to the padded '01'
        "Y": "y",
        "Y1": "y",
        "M": "M",
        "M1": "M",
        "D": "d",
        "D1": "d",
        "H": "H",
        "H1": "H",
        "m": "mm",
        "s": "ss",
    }

    def _compile_dt_picture(self, pic: str) -> str:
        """JSONata/XPath datetime picture -> Spark date_format pattern.
        Raises NotCompilable outside the padded-component subset."""
        out = []
        i = 0
        while i < len(pic):
            c = pic[i]
            if c == "[":
                if pic.startswith("[[", i):
                    out.append("'['")
                    i += 2
                    continue
                end = pic.find("]", i)
                if end < 0:
                    raise NotCompilable("unterminated datetime picture component")
                comp = pic[i + 1 : end].replace(" ", "")
                java = self._DT_PICTURE_COMPONENTS.get(comp)
                if java is None:
                    raise NotCompilable(f"datetime picture component [{comp}]")
                out.append(java)
                i = end + 1
            elif c == "]":
                if pic.startswith("]]", i):
                    out.append("']'")
                    i += 2
                else:
                    i += 1
            else:
                # literal run: quote so date_format can't interpret letters
                j = i
                while j < len(pic) and pic[j] not in "[]":
                    j += 1
                out.append("'" + pic[i:j].replace("'", "''") + "'")
                i = j
        return "".join(out)

    @staticmethod
    def _utc_wall(ts):
        # JSONata renders datetimes in UTC (unless an explicit zone arg,
        # which we don't compile). date_format on a plain TIMESTAMP uses
        # the SESSION timezone — wrong under any non-UTC harness session —
        # so shift to the UTC wall clock as TIMESTAMP_NTZ first. Pure
        # epoch arithmetic (NTZ epoch + unix_micros), NOT
        # convert_timezone(None, UTC, ts): that round-trips through the
        # session zone's wall clock, which is AMBIGUOUS in the DST
        # fall-back overlap and collapsed the two overlap instants to one
        # UTC rendering (round-8 advisor fix, verified under
        # America/New_York 2024-11-03).
        return F.timestamp_add(
            "MICROSECOND",
            F.unix_micros(ts),
            F.expr("TIMESTAMP_NTZ '1970-01-01 00:00:00'"),
        )

    def _fn_fromMillis(self, a, ctx, env, raw):
        if len(a) > 2:
            raise NotCompilable("$fromMillis with timezone")
        ts = self._utc_wall(F.timestamp_millis(a[0].col.cast("long")))
        if len(a) == 2:
            if raw[1].get("type") != "string":
                raise NotCompilable("$fromMillis with dynamic picture")
            pattern = self._compile_dt_picture(raw[1]["value"])
            return Typed(F.date_format(ts, pattern), T.StringType())
        return Typed(
            F.concat(F.date_format(ts, "yyyy-MM-dd'T'HH:mm:ss.SSS"), F.lit("Z")),
            T.StringType(),
        )

    def _fn_toMillis(self, a, ctx, env, raw):
        if len(a) > 2:
            raise NotCompilable("$toMillis with extra args")
        if len(a) == 2:
            # round-7: the padded-component picture subset compiles via the
            # same translation as $fromMillis — parse as NTZ (Spark's
            # missing-field defaults are tier 2's: year 1970, month/day 1,
            # time 0) and reinterpret the wall clock as UTC (zoneless
            # pictures are UTC per the spec; [Z]-bearing pictures stay
            # tier 2 with the rest of the non-padded components).
            if raw[1].get("type") != "string":
                raise NotCompilable("$toMillis with dynamic picture")
            pattern = self._compile_dt_picture(raw[1]["value"])
            ntz = F.to_timestamp_ntz(a[0].col, F.lit(pattern))
            from kafka_connect_jsonata_spark.sources.readers import _ntz_to_instant

            return Typed(F.unix_millis(_ntz_to_instant(ntz)), T.LongType())
        # ISO strings carrying an explicit zone (Z or +hh:mm) parse to the
        # right instant under any session timezone; zoneless strings are
        # UTC per the JSONata spec, but Spark's to_timestamp reads them in
        # the SESSION zone — parse those as NTZ and reinterpret (the same
        # DST-safe epoch arithmetic as sources/readers._ntz_to_instant).
        s = a[0].col
        # Zone designators count only when they FOLLOW a time component:
        # minutes are optional in ISO-8601 offsets (+05 == +05:00, round-3
        # advice), but a bare trailing [+-]dd also matches the day of a
        # date-only string ('2020-01-05'), which must stay on the zoneless
        # NTZ path — anchoring on hh:mm[:ss[.f]] immediately before the
        # designator disambiguates (round-4 review).
        zoned = s.rlike(
            r"[0-9]{2}:[0-9]{2}(:[0-9]{2}(\.[0-9]+)?)?([Zz]|[+-][0-9]{2}(:?[0-9]{2})?)$"
        )
        from kafka_connect_jsonata_spark.sources.readers import _ntz_to_instant

        ntz_instant = _ntz_to_instant(F.to_timestamp_ntz(s))
        return Typed(
            F.when(zoned, F.unix_millis(F.to_timestamp(s))).otherwise(
                F.unix_millis(ntz_instant)
            ),
            T.LongType(),
        )

    def _fn_now(self, a, ctx, env, raw):
        if a:
            raise NotCompilable("$now with picture")
        return Typed(
            F.concat(
                F.date_format(
                    self._utc_wall(F.current_timestamp()), "yyyy-MM-dd'T'HH:mm:ss.SSS"
                ),
                F.lit("Z"),
            ),
            T.StringType(),
        )

    def _fn_millis(self, a, ctx, env, raw):
        return Typed(F.unix_millis(F.current_timestamp()), T.LongType())

    # higher-order over arrays: inline lambdas, block-bound lambdas, and
    # builtin function references all inline by substitution
    def _resolve_lambda(self, raw_fn, env):
        """-> (params, body, base_env) for a HOF's function argument."""
        if raw_fn["type"] == "lambda":
            return raw_fn["args"], raw_fn["body"], env
        if raw_fn["type"] == "variable":
            bound = env.get(raw_fn["value"])
            if isinstance(bound, CompiledLambda):
                return bound.params, bound.body, bound.env
            if bound is None and hasattr(self, "_fn_" + raw_fn["value"]):
                lam = self._builtin_as_lambda(raw_fn["value"], env)
                return lam.params, lam.body, lam.env
        raise NotCompilable("HOF requires a lambda or function reference")

    def _fn_map(self, a, ctx, env, raw):
        params, body, base_env = self._resolve_lambda(raw[1], env)
        arr = a[0]
        if not isinstance(arr.dtype, T.ArrayType):
            # singleton sequence: $map(v, f) == f(v) after the unwrap
            # (round 7; index arg = 0 for the single element)
            child = dict(base_env)
            child[params[0]] = arr
            if len(params) > 1:
                child[params[1]] = Typed(F.lit(0), T.IntegerType())
            if len(params) > 2:
                child[params[2]] = Typed(F.array(arr.col), T.ArrayType(arr.dtype))
            return self._c(body, arr, child)
        et = arr.dtype.elementType
        out_t = [None]

        def fn(x, i=None):
            child = dict(base_env)
            child[params[0]] = Typed(x, et)
            if len(params) > 1 and i is not None:
                child[params[1]] = Typed(i, T.IntegerType())
            if len(params) > 2:
                child[params[2]] = arr  # third param = the whole array
            r = self._c(body, Typed(x, et), child)
            out_t[0] = r.dtype
            return r.col

        if len(params) > 1:
            col = F.transform(arr.col, lambda x, i: fn(x, i))
        else:
            col = F.transform(arr.col, fn)
        return Typed(col, T.ArrayType(out_t[0] or T.StringType()))

    def _fn_filter(self, a, ctx, env, raw):
        params, body, base_env = self._resolve_lambda(raw[1], env)
        arr = a[0]
        if not isinstance(arr.dtype, T.ArrayType):
            # singleton sequence: keep the value iff the predicate holds,
            # else undefined (NULL in the typed tier) — round 7
            child = dict(base_env)
            child[params[0]] = arr
            if len(params) > 1:
                child[params[1]] = Typed(F.lit(0), T.IntegerType())
            if len(params) > 2:
                child[params[2]] = Typed(F.array(arr.col), T.ArrayType(arr.dtype))
            pred = self._truthy(self._c(body, arr, child))
            return Typed(F.when(pred, arr.col), arr.dtype)
        et = arr.dtype.elementType

        def fn(x, i=None):
            child = dict(base_env)
            child[params[0]] = Typed(x, et)
            if len(params) > 1 and i is not None:
                child[params[1]] = Typed(i, T.IntegerType())
            if len(params) > 2:
                child[params[2]] = arr
            return self._truthy(self._c(body, Typed(x, et), child))

        if len(params) > 1:
            col = F.filter(arr.col, lambda x, i: fn(x, i))
        else:
            col = F.filter(arr.col, fn)
        return Typed(col, arr.dtype)

    def _fn_single(self, a, ctx, env, raw):
        """$single(arr, fn): the one element matching the predicate.
        0-or-many matches error in BOTH tiers (interpreter D3138/D3139;
        compiled raise_error at action time — message carries the code)."""
        params, body, base_env = self._resolve_lambda(raw[1], env)
        arr = a[0]
        if not isinstance(arr.dtype, T.ArrayType):
            raise NotCompilable("$single over non-array")
        et = arr.dtype.elementType

        def fn(x):
            child = dict(base_env)
            child[params[0]] = Typed(x, et)
            return self._truthy(self._c(body, Typed(x, et), child))

        matches = F.filter(arr.col, fn)
        col = F.when(F.size(matches) == 1, F.element_at(matches, 1)).otherwise(
            F.raise_error(
                F.lit("D3139: $single matched zero or multiple elements")
            ).cast(et if et else "string")
        )
        return Typed(col, et)

    def _fn_reduce(self, a, ctx, env, raw):
        params, body, base_env = self._resolve_lambda(raw[1], env)
        arr = a[0]
        if not isinstance(arr.dtype, T.ArrayType):
            raise NotCompilable("$reduce over non-array")
        et = arr.dtype.elementType
        if len(a) >= 3:
            init = a[2]
            init_t, init_col = init.dtype, init.col
            seq = arr.col
        else:
            # first-element init: fold the tail onto head; empty -> undefined
            init_t = et
            init_col = F.element_at(arr.col, 1)
            seq = F.slice(arr.col, 2, F.greatest(F.size(arr.col) - 1, F.lit(0)))

        def body_of(acc_typed, x):
            child = dict(base_env)
            child[params[0]] = acc_typed
            child[params[1]] = Typed(x, et)
            return self._c(body, Typed(x, et), child)

        # aggregate() needs merge-output type == accumulator type, but the
        # body may widen (JSONata arithmetic compiles to double while a
        # literal 0 init is long) — probe the body's result type, widen the
        # accumulator to it, and pin the merge output with a cast
        probe = body_of(Typed(F.lit(None).cast(init_t), init_t), F.lit(None).cast(et))
        acc_t = probe.dtype or init_t
        if acc_t.simpleString() != (init_t or acc_t).simpleString():
            reprobe = body_of(Typed(F.lit(None).cast(acc_t), acc_t), F.lit(None).cast(et))
            if (reprobe.dtype or acc_t).simpleString() != acc_t.simpleString():
                raise NotCompilable("$reduce accumulator type does not converge")
            init_col = init_col.cast(acc_t)

        def fn(acc, x):
            return body_of(Typed(acc, acc_t), x).col.cast(acc_t)

        col = F.aggregate(seq, init_col, fn)
        if len(a) < 3:
            col = F.when(F.size(arr.col) >= 1, col)
        return Typed(col, acc_t)


def _elem_type(v: Typed):
    return v.dtype.elementType if isinstance(v.dtype, T.ArrayType) else None


def compile_expression(source: str, schema: T.StructType) -> Typed:
    """Compile a JSONata expression against a DataFrame schema; raises
    NotCompilable when outside the tier-1 subset."""
    return Compiler(schema).compile(source)


# --------------------------------------------------------------------------
# compile-time constant folding (round 8)
#
# The JSONata-level analogue of Catalyst's ConstantFolding rule: a subtree
# that provably reads no input (no context/root/parent references outside a
# constant-rooted path, no data-bound variables, no impure builtins) is
# evaluated ONCE at compile time through the tier-2 spec interpreter and
# emitted as a typed literal Column. This folds the long tail of
# constant-argument library calls the Column subset doesn't model —
# $formatInteger words/roman/ordinals, exponent-notation $formatNumber
# pictures, $parseInteger words, constant lambda pipelines ($fib et al.),
# wildcards/descendants over literal objects — at tier-2 exactness and zero
# runtime cost. Impure builtins ($random/$now/$millis/$shuffle, plus $eval
# whose string may reference the input) never fold.

_FOLD_IMPURE = frozenset({"random", "now", "millis", "shuffle", "eval"})

# node types worth attempting to fold (leaves and function-valued nodes are
# excluded: leaves are already literal, lambdas/binds have no Column value)
_FOLDABLE = frozenset(
    {
        "path_op",
        "filter",
        "object",
        "array",
        "block",
        "binary",
        "unary",
        "condition",
        "call",
        "apply",
        "sort",
        "group",
        "range",
        "keep_array",
        "context_bind",
        "index_bind",
    }
)


def _const_subtree(node, env, bound, item_rel) -> bool:
    """True if ``node`` provably reads no input. ``item_rel`` is set when
    walking path steps / predicates whose items derive from an
    already-constant source (names and ``$``/``%`` there are item-relative,
    not input reads). ``bound`` holds locally-bound variable names; a
    variable in the compile ``env`` (data-dependent binding) blocks
    folding, any other free name resolves to a builtin (or raises) inside
    the interpreter."""
    t = node["type"]
    if t in ("number", "string", "value", "regex", "placeholder"):
        return True
    if t in ("name", "wildcard", "descendant", "parent"):
        return item_rel
    if t == "variable":
        v = node["value"]
        if v == "$":  # $$ — the input root
            return False
        if v == "":  # $ — the current context
            return item_rel
        if v in bound:
            return True
        if v in _FOLD_IMPURE or v in env:
            return False
        return True
    if t == "path_op":
        return _const_subtree(node["lhs"], env, bound, item_rel) and _const_subtree(
            node["rhs"], env, bound, True
        )
    if t == "filter":
        return _const_subtree(node["expr"], env, bound, item_rel) and _const_subtree(
            node["predicate"], env, bound, True
        )
    if t == "group":
        return _const_subtree(node["expr"], env, bound, item_rel) and all(
            _const_subtree(k, env, bound, True) and _const_subtree(v, env, bound, True)
            for k, v in node["pairs"]
        )
    if t == "sort":
        return _const_subtree(node["expr"], env, bound, item_rel) and all(
            _const_subtree(s["expression"], env, bound, True) for s in node["terms"]
        )
    if t in ("context_bind", "index_bind", "keep_array"):
        return _const_subtree(node["expr"], env, bound, item_rel)
    if t == "object":
        return all(
            _const_subtree(k, env, bound, item_rel)
            and _const_subtree(v, env, bound, item_rel)
            for k, v in node["pairs"]
        )
    if t == "array":
        return all(
            _const_subtree(e, env, bound, item_rel) for e in node["expressions"]
        )
    if t == "block":
        b = set(bound)
        for e in node["expressions"]:
            if e["type"] == "bind":
                if not _const_subtree(e["rhs"], env, b, item_rel):
                    return False
                b.add(e["var"])
            elif not _const_subtree(e, env, b, item_rel):
                return False
        return True
    if t == "bind":
        return _const_subtree(node["rhs"], env, bound, item_rel)
    if t in ("binary", "range", "apply"):
        return _const_subtree(node["lhs"], env, bound, item_rel) and _const_subtree(
            node["rhs"], env, bound, item_rel
        )
    if t == "unary":
        return _const_subtree(node["expression"], env, bound, item_rel)
    if t == "condition":
        els = node.get("else")
        return (
            _const_subtree(node["condition"], env, bound, item_rel)
            and _const_subtree(node["then"], env, bound, item_rel)
            and (els is None or _const_subtree(els, env, bound, item_rel))
        )
    if t in ("call", "partial"):
        proc = node["procedure"]
        if (
            t == "call"
            and proc.get("type") == "variable"
            and proc.get("value") == "eval"
            and 1 <= len(node["arguments"]) <= 2
            and node["arguments"][0]["type"] == "string"
        ):
            # $eval is fold-impure IN GENERAL (the evaluated string may
            # read the input), but a LITERAL expression whose parse is
            # itself constant cannot — fold it (round 9). With an explicit
            # literal CONTEXT argument the inner expression's names are
            # context-relative (item_rel), hence also constant.
            try:
                inner = parse(node["arguments"][0]["value"])
            except Exception:
                return False
            has_ctx = len(node["arguments"]) == 2
            if has_ctx and not _const_subtree(
                node["arguments"][1], env, bound, item_rel
            ):
                return False
            return _const_subtree(inner, env, bound, has_ctx)
        return _const_subtree(proc, env, bound, item_rel) and all(
            _const_subtree(a, env, bound, item_rel) for a in node["arguments"]
        )
    if t == "lambda":
        return _const_subtree(
            node["body"], env, bound | set(node["args"]), item_rel
        )
    if t == "transform":
        dele = node.get("delete")
        return (
            _const_subtree(node["pattern"], env, bound, True)
            and _const_subtree(node["update"], env, bound, True)
            and (dele is None or _const_subtree(dele, env, bound, True))
        )
    return False


def _fold_lit(v):
    """Typed literal for an interpreter-computed JSON value, or None when
    the value has no single stable Spark rendering (heterogeneous arrays,
    empty objects, function values, non-finite floats, >64-bit ints)."""
    if isinstance(v, bool):
        return Typed(F.lit(v), T.BooleanType())
    if isinstance(v, int):
        if -(2**63) <= v < 2**63:
            return Typed(F.lit(v), T.LongType())
        return None
    if isinstance(v, float):
        if v != v or v in (float("inf"), float("-inf")):
            return None
        return Typed(F.lit(v), T.DoubleType())
    if isinstance(v, str):
        return Typed(F.lit(v), T.StringType())
    if v is None:
        return Typed(F.lit(None), T.NullType())
    if isinstance(v, list):
        if not v:
            return Typed(
                F.array().cast(T.ArrayType(T.StringType())),
                T.ArrayType(T.StringType()),
            )
        elems = [_fold_lit(e) for e in v]
        if any(e is None for e in elems):
            return None
        dts = {e.dtype.simpleString() for e in elems}
        if dts == {"bigint", "double"}:
            elems = [Typed(e.col.cast("double"), T.DoubleType()) for e in elems]
            dts = {"double"}
        if "void" in dts and len(dts) == 2:  # null elements take the type
            other = next(e.dtype for e in elems if e.dtype.simpleString() != "void")
            elems = [Typed(e.col.cast(other), other) for e in elems]
            dts = {other.simpleString()}
        if len(dts) != 1:
            # an all-object list whose struct shapes differ still lifts
            # when every VALUE type unifies: render as array<map<string,T>>
            # ($spread over a constant — [{a:1},{b:2},{c:3}]; round 12).
            # The engine's map and struct renderings are interchangeable
            # for object values (both collect to dicts).
            if all(isinstance(e, dict) and e for e in v):
                ms = [_fold_map_lit(e) for e in v]
                if all(m is not None for m in ms) and len(
                    {m.dtype.simpleString() for m in ms}
                ) == 1:
                    return Typed(
                        F.array(*[m.col for m in ms]),
                        T.ArrayType(ms[0].dtype),
                    )
            return None
        return Typed(
            F.array(*[e.col for e in elems]), T.ArrayType(elems[0].dtype)
        )
    if isinstance(v, dict):
        if not v:
            # the engine's established empty-object rendering (the object
            # constructor emits the same form when every pair is omitted)
            return Typed(
                F.create_map().cast("map<string,string>"),
                T.MapType(T.StringType(), T.StringType()),
            )
        cols, fields = [], []
        for k, val in v.items():
            tv = _fold_lit(val)
            if tv is None:
                return None
            cols.append(tv.col.alias(k))
            fields.append(T.StructField(k, tv.dtype))
        return Typed(F.struct(*cols), T.StructType(fields))
    return None


def _fold_map_lit(d: dict):
    """Lift a non-empty dict constant as a ``map<string,T>`` literal when
    every value's fold type unifies (bigint/double promote); None
    otherwise. Used by :func:`_fold_lit` for all-object lists whose
    struct shapes differ (round 12)."""
    vals = [_fold_lit(x) for x in d.values()]
    if any(x is None for x in vals):
        return None
    dts = {x.dtype.simpleString() for x in vals}
    if dts == {"bigint", "double"}:
        vals = [Typed(x.col.cast("double"), T.DoubleType()) for x in vals]
        dts = {"double"}
    if len(dts) != 1:
        return None
    entries = []
    for k, tv in zip(d.keys(), vals):
        entries.extend([F.lit(k), tv.col])
    return Typed(
        F.create_map(*entries), T.MapType(T.StringType(), vals[0].dtype)
    )


def _mentions_var(node, name: str) -> bool:
    """True if any variable node in the subtree references ``name`` —
    over-approximates (shadowing in nested lambdas still counts)."""
    if isinstance(node, dict):
        if node.get("type") == "variable" and node.get("value") == name:
            return True
        return any(
            _mentions_var(v, name) for v in node.values() if isinstance(v, (dict, list))
        )
    if isinstance(node, list):
        return any(_mentions_var(v, name) for v in node)
    return False
