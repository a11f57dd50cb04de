"""JSONata Pratt parser (public language spec, jsonata.org).

text -> AST of plain dicts (picklable, so the interpreter tier can ship the
AST inside a pandas UDF closure). Operator binding powers follow the
public spec's operator table. Per-step predicate semantics fall out of
precedence: in ``foo.bar[0]`` the filter binds to the ``bar`` step (lbp 80 >
lbp 75 of ``.``), so the evaluator naturally applies it per-item; a
parenthesized ``(foo.bar)[0]`` filters the whole sequence.
"""

from __future__ import annotations

from kafka_connect_jsonata_spark.jsonata.errors import JsonataParseError
from kafka_connect_jsonata_spark.jsonata.tokenizer import Token, Tokenizer

BP = {
    ".": 75,
    "[": 80,
    "]": 0,
    "{": 70,
    "}": 0,
    "(": 80,
    ")": 0,
    ",": 0,
    "@": 80,
    "#": 80,
    ";": 80,
    ":": 80,
    "?": 20,
    "+": 50,
    "-": 50,
    "*": 60,
    "/": 60,
    "%": 60,
    "|": 20,
    "=": 40,
    "<": 40,
    ">": 40,
    "^": 40,
    "**": 60,
    "..": 20,
    ":=": 10,
    "!=": 40,
    "<=": 40,
    ">=": 40,
    "~>": 40,
    "and": 30,
    "or": 25,
    "in": 40,
    "&": 50,
    "!": 0,
    "~": 0,
    "function": 0,
}

BINARY_OPS = {"+", "-", "*", "/", "%", "=", "!=", "<", "<=", ">", ">=", "&", "and", "or", "in", ".."}

# Only operators that actually have an infix (led) role carry binding power
# in the parse loop; ':'/';'/')' etc. are structural.
LED_BP = {
    op: BP[op]
    for op in (
        ".", "[", "{", "(", "?", ":=", "~>", "^", "@", "#", "..",
        "+", "-", "*", "/", "%", "=", "!=", "<", "<=", ">", ">=", "&", "and", "or", "in",
    )
}


class Parser:
    def __init__(self, source: str):
        self.tokenizer = Tokenizer(source)
        self.token: Token = self.tokenizer.next(prefix=True)

    def advance(self, expected: str | None = None, prefix: bool = False) -> Token:
        if expected is not None and not (
            self.token.type == "operator" and self.token.value == expected
        ):
            raise JsonataParseError(
                "S0202",
                f"expected {expected!r}, got {self.token.value!r}",
                self.token.position,
            )
        self.token = self.tokenizer.next(prefix=prefix)
        return self.token

    def lbp(self, token: Token) -> int:
        if token.type == "operator":
            return LED_BP.get(token.value, 0)
        return 0

    def expression(self, rbp: int) -> dict:
        t = self.token
        self.advance(prefix=self._nud_wants_prefix_next(t))
        left = self.nud(t)
        while rbp < self.lbp(self.token):
            t = self.token
            self.advance(prefix=True)
            left = self.led(t, left)
        return left

    @staticmethod
    def _nud_wants_prefix_next(t: Token) -> bool:
        # after an operand the next token is an operator position; after a
        # prefix operator we still expect an operand (regex-capable)
        if t.type == "operator":
            return True
        return False

    # ------------------------------------------------------------------ nud
    def nud(self, t: Token) -> dict:
        if t.type == "string":
            return {"type": "string", "value": t.value, "pos": t.position}
        if t.type == "number":
            return {"type": "number", "value": t.value, "pos": t.position}
        if t.type == "value":
            return {"type": "value", "value": t.value, "pos": t.position}
        if t.type == "name":
            return {"type": "name", "value": t.value, "pos": t.position}
        if t.type == "variable":
            return {"type": "variable", "value": t.value, "pos": t.position}
        if t.type == "regex":
            return {"type": "regex", "value": t.value, "pos": t.position}
        if t.type == "operator":
            op = t.value
            if op == "-":
                return {"type": "unary", "value": "-", "expression": self.expression(70), "pos": t.position}
            if op == "*":
                return {"type": "wildcard", "pos": t.position}
            if op == "**":
                return {"type": "descendant", "pos": t.position}
            if op == "%":
                return {"type": "parent", "pos": t.position}
            if op == "(":
                # block: (e1; e2; ...). An empty block `()` and a trailing
                # `;` before `)` are parse errors in jsonata-js (S0211 —
                # `)` in operand position) — round-11 suite port.
                exprs = []
                while not self._is_op(")"):
                    exprs.append(self.expression(0))
                    if self._is_op(";"):
                        self.advance(";", prefix=True)
                        if self._is_op(")"):
                            raise JsonataParseError(
                                "S0211",
                                "the symbol ')' cannot be used as a unary "
                                "operator",
                                self.token.position,
                            )
                    else:
                        break
                if not exprs:
                    raise JsonataParseError(
                        "S0211", "the symbol ')' cannot be used as a unary operator",
                        t.position,
                    )
                self.advance(")")
                return {"type": "block", "expressions": exprs, "pos": t.position}
            if op == "[":
                # array constructor
                exprs = []
                while not self._is_op("]"):
                    exprs.append(self.expression(0))
                    if self._is_op(","):
                        self.advance(",", prefix=True)
                    else:
                        break
                self.advance("]")
                return {"type": "array", "expressions": exprs, "pos": t.position}
            if op == "{":
                return self._object_constructor(t)
            if op == "function":
                return self._lambda(t)
            if op == "|":
                # transform pattern: | location | update [, deletes] |
                pattern = self.expression(0)
                self.advance("|", prefix=True)
                update = self.expression(0)
                delete = None
                if self._is_op(","):
                    self.advance(",", prefix=True)
                    delete = self.expression(0)
                self.advance("|")
                return {
                    "type": "transform",
                    "pattern": pattern,
                    "update": update,
                    "delete": delete,
                    "pos": t.position,
                }
        raise JsonataParseError("S0211", f"unexpected token {t.value!r}", t.position)

    def _object_constructor(self, t: Token) -> dict:
        pairs = []
        while not self._is_op("}"):
            key = self.expression(0)
            self.advance(":", prefix=True)
            val = self.expression(0)
            pairs.append([key, val])
            if self._is_op(","):
                self.advance(",", prefix=True)
            else:
                break
        self.advance("}")
        return {"type": "object", "pairs": pairs, "pos": t.position}

    def _lambda(self, t: Token) -> dict:
        self.advance("(", prefix=True)
        args = []
        while not self._is_op(")"):
            if self.token.type != "variable":
                raise JsonataParseError(
                    "S0208", f"parameter of function must be a variable, got {self.token.value!r}",
                    self.token.position,
                )
            args.append(self.token.value)
            self.advance(prefix=True)
            # optional signature annotations like <s:n> are skipped
            if self._is_op("<"):
                depth = 0
                while True:
                    if self._is_op("<"):
                        depth += 1
                    elif self._is_op(">"):
                        depth -= 1
                        if depth == 0:
                            self.advance(prefix=True)
                            break
                    self.advance(prefix=True)
            if self._is_op(","):
                self.advance(",", prefix=True)
            else:
                break
        self.advance(")")
        # optional signature after the param list — function($x)<n:n>{...}
        # (the jsonata-js placement). Round 11: the signature SOURCE is
        # captured so the interpreter can enforce it (T0410) — previously
        # parsed-and-dropped, which silently accepted any argument types.
        signature = None
        if self._is_op("<"):
            sig_start = self.token.position
            depth = 0
            while True:
                if self._is_op("<"):
                    depth += 1
                elif self._is_op(">"):
                    depth -= 1
                    if depth == 0:
                        sig_end = self.token.position
                        self.advance(prefix=True)
                        break
                self.advance(prefix=True)
            signature = self.tokenizer.source[sig_start : sig_end + 1]
        self.advance("{", prefix=True)
        body = self.expression(0)
        self.advance("}")
        node = {"type": "lambda", "args": args, "body": body, "pos": t.position}
        if signature is not None:
            node["signature"] = signature
        return node

    # ------------------------------------------------------------------ led
    def led(self, t: Token, left: dict) -> dict:
        op = t.value
        if op == ".":
            rhs = self.expression(BP["."])
            if rhs["type"] == "array":
                rhs["keep_cons"] = True  # a.[...] keeps per-item arrays whole
            return {"type": "path_op", "lhs": left, "rhs": rhs, "pos": t.position}
        if op == "[":
            if self._is_op("]"):
                self.advance("]")
                return {"type": "keep_array", "expr": left, "pos": t.position}
            pred = self.expression(0)
            self.advance("]")
            return {"type": "filter", "expr": left, "predicate": pred, "pos": t.position}
        if op == "{":
            # group-by applied to a sequence
            obj = self._object_constructor(t)
            return {"type": "group", "expr": left, "pairs": obj["pairs"], "pos": t.position}
        if op == "(":
            args = []
            while not self._is_op(")"):
                if self._is_op("?"):
                    self.advance("?", prefix=True)
                    args.append({"type": "placeholder", "pos": self.token.position})
                else:
                    args.append(self.expression(0))
                if self._is_op(","):
                    self.advance(",", prefix=True)
                else:
                    break
            self.advance(")")
            is_partial = any(a["type"] == "placeholder" for a in args)
            return {
                "type": "partial" if is_partial else "call",
                "procedure": left,
                "arguments": args,
                "pos": t.position,
            }
        if op == "?":
            then = self.expression(0)
            els = None
            if self._is_op(":"):
                self.advance(":", prefix=True)
                els = self.expression(0)
            return {"type": "condition", "condition": left, "then": then, "else": els, "pos": t.position}
        if op == ":=":
            if left.get("type") != "variable":
                raise JsonataParseError("S0212", "left of := must be a variable", t.position)
            rhs = self.expression(BP[":="] - 1)  # right-assoc
            return {"type": "bind", "var": left["value"], "rhs": rhs, "pos": t.position}
        if op == "~>":
            rhs = self.expression(BP["~>"])
            return {"type": "apply", "lhs": left, "rhs": rhs, "pos": t.position}
        if op == "^":
            # order-by: ^(term, >term, ...)
            self.advance("(", prefix=True)
            terms = []
            while not self._is_op(")"):
                desc = False
                if self._is_op("<"):
                    self.advance("<", prefix=True)
                elif self._is_op(">"):
                    self.advance(">", prefix=True)
                    desc = True
                terms.append({"descending": desc, "expression": self.expression(0)})
                if self._is_op(","):
                    self.advance(",", prefix=True)
                else:
                    break
            self.advance(")")
            return {"type": "sort", "expr": left, "terms": terms, "pos": t.position}
        if op == "@":
            if self.token.type != "variable":
                raise JsonataParseError("S0214", "right of @ must be a variable", t.position)
            var = self.token.value
            self.advance(prefix=False)
            return {"type": "context_bind", "expr": left, "var": var, "pos": t.position}
        if op == "#":
            if self.token.type != "variable":
                raise JsonataParseError("S0214", "right of # must be a variable", t.position)
            var = self.token.value
            self.advance(prefix=False)
            return {"type": "index_bind", "expr": left, "var": var, "pos": t.position}
        if op == "..":
            rhs = self.expression(BP[".."])
            return {"type": "range", "lhs": left, "rhs": rhs, "pos": t.position}
        if op in BINARY_OPS:
            rhs = self.expression(BP[op])
            return {"type": "binary", "value": op, "lhs": left, "rhs": rhs, "pos": t.position}
        raise JsonataParseError("S0201", f"unexpected operator {op!r}", t.position)

    def _is_op(self, op: str) -> bool:
        return self.token.type == "operator" and self.token.value == op

    def parse(self) -> dict:
        expr = self.expression(0)
        if self.token.type != "end":
            raise JsonataParseError(
                "S0201", f"unexpected trailing token {self.token.value!r}", self.token.position
            )
        return expr


def parse(source: str) -> dict:
    """Parse a JSONata expression into an AST dict."""
    return Parser(source).parse()
