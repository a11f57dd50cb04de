"""JSONata tokenizer (public language spec, jsonata.org).

Produces a token stream for the Pratt parser. Regex literals are
context-sensitive: ``/`` starts a regex only in prefix position (the parser
passes ``prefix=True`` when it expects an operand).
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from kafka_connect_jsonata_spark.jsonata.errors import JsonataParseError

# Multi-char operators first (longest match wins).
MULTI_OPS = (":=", "!=", "<=", ">=", "~>", "..", "**")
SINGLE_OPS = set(".[]{}()@#;,:?+-*/%|=<>^&!~")

KEYWORDS = {"and", "or", "in", "true", "false", "null"}

ESCAPES = {'"': '"', "'": "'", "\\": "\\", "/": "/", "b": "\b", "f": "\f", "n": "\n", "r": "\r", "t": "\t"}

NAME_END = set(" \t\n\r.[]{}()@#;,:?+-*/%|=<>^&!~\"'`$")


@dataclass
class Token:
    type: str  # operator | string | number | name | variable | regex | end
    value: object
    position: int


class Tokenizer:
    def __init__(self, source: str):
        self.source = source
        self.pos = 0
        self.length = len(source)

    def _skip_ws_and_comments(self) -> None:
        src, n = self.source, self.length
        while self.pos < n:
            c = src[self.pos]
            if c in " \t\n\r\v":
                self.pos += 1
            elif src.startswith("/*", self.pos):
                end = src.find("*/", self.pos + 2)
                if end < 0:
                    raise JsonataParseError("S0106", "comment has no closing tag", self.pos)
                self.pos = end + 2
            else:
                return

    def next(self, prefix: bool = False) -> Token:
        self._skip_ws_and_comments()
        if self.pos >= self.length:
            return Token("end", None, self.pos)
        src, start = self.source, self.pos
        c = src[start]

        # regex literal (only in operand position)
        if prefix and c == "/":
            return self._scan_regex()

        for op in MULTI_OPS:
            if src.startswith(op, start):
                self.pos += len(op)
                return Token("operator", op, start)
        if c in SINGLE_OPS:
            self.pos += 1
            return Token("operator", c, start)
        if c in "\"'":
            return self._scan_string(c)
        if c.isdigit() or (c == "-" and False):
            return self._scan_number()
        if c == "`":
            end = src.find("`", start + 1)
            if end < 0:
                raise JsonataParseError("S0105", "quoted name has no closing backtick", start)
            self.pos = end + 1
            return Token("name", src[start + 1 : end], start)
        if c == "$":
            self.pos += 1
            if self.pos < self.length and src[self.pos] == "$":
                self.pos += 1
                return Token("variable", "$", start)  # root
            name = self._scan_name_chars()
            return Token("variable", name, start)
        # bare name
        name = self._scan_name_chars()
        if not name:
            raise JsonataParseError("S0204", f"unknown symbol {c!r}", start)
        if name in ("true", "false"):
            return Token("value", name == "true", start)
        if name == "null":
            return Token("value", None, start)
        if name in ("and", "or", "in"):
            return Token("operator", name, start)
        if name == "function" or name == "λ":
            return Token("operator", "function", start)
        return Token("name", name, start)

    def _scan_name_chars(self) -> str:
        src, n = self.source, self.length
        start = self.pos
        while self.pos < n and src[self.pos] not in NAME_END:
            self.pos += 1
        return src[start : self.pos]

    def _scan_string(self, quote: str) -> Token:
        src, n = self.source, self.length
        start = self.pos
        self.pos += 1
        out: list[str] = []
        while self.pos < n:
            c = src[self.pos]
            if c == "\\":
                self.pos += 1
                if self.pos >= n:
                    break
                e = src[self.pos]
                if e == "u":
                    hexs = src[self.pos + 1 : self.pos + 5]
                    if len(hexs) < 4 or not re.fullmatch(r"[0-9a-fA-F]{4}", hexs):
                        raise JsonataParseError("S0104", "invalid \\u escape", self.pos)
                    cp = int(hexs, 16)
                    self.pos += 5
                    # surrogate PAIRS combine into one astral codepoint
                    # (JS string semantics — jsonata-js suite "literals";
                    # round 11: two adjacent \u escapes previously stayed
                    # two unpaired surrogates in the Python string)
                    if 0xD800 <= cp <= 0xDBFF and src.startswith(
                        "\\u", self.pos
                    ):
                        lows = src[self.pos + 2 : self.pos + 6]
                        if re.fullmatch(r"[0-9a-fA-F]{4}", lows or ""):
                            lo = int(lows, 16)
                            if 0xDC00 <= lo <= 0xDFFF:
                                cp = 0x10000 + ((cp - 0xD800) << 10) + (
                                    lo - 0xDC00
                                )
                                self.pos += 6
                    out.append(chr(cp))
                elif e in ESCAPES:
                    out.append(ESCAPES[e])
                    self.pos += 1
                else:
                    raise JsonataParseError("S0103", f"unsupported escape \\{e}", self.pos)
            elif c == quote:
                self.pos += 1
                return Token("string", "".join(out), start)
            else:
                out.append(c)
                self.pos += 1
        raise JsonataParseError("S0101", "string literal has no closing quote", start)

    def _scan_number(self) -> Token:
        src = self.source
        start = self.pos
        m = re.match(r"\d+(\.\d+)?([eE][-+]?\d+)?", src[start:])
        if not m:
            raise JsonataParseError("S0102", "invalid number", start)
        text = m.group(0)
        self.pos += len(text)
        if m.group(1) or m.group(2):
            val: object = float(text)
        else:
            val = int(text)
        return Token("number", val, start)

    def _scan_regex(self) -> Token:
        src, n = self.source, self.length
        start = self.pos
        self.pos += 1
        pattern: list[str] = []
        depth = 0
        while self.pos < n:
            c = src[self.pos]
            if c == "\\":
                pattern.append(src[self.pos : self.pos + 2])
                self.pos += 2
                continue
            if c == "[":
                depth += 1
            elif c == "]":
                depth = max(0, depth - 1)
            elif c == "/" and depth == 0:
                self.pos += 1
                flags = 0
                flag_chars = []
                while self.pos < n and src[self.pos] in "ims":
                    flag_chars.append(src[self.pos])
                    self.pos += 1
                if "i" in flag_chars:
                    flags |= re.IGNORECASE
                if "m" in flag_chars:
                    flags |= re.MULTILINE
                if "s" in flag_chars:
                    flags |= re.DOTALL
                pat = "".join(pattern)
                if pat == "":
                    raise JsonataParseError("S0301", "empty regex", start)
                try:
                    return Token("regex", re.compile(pat, flags), start)
                except re.error as e:
                    raise JsonataParseError("S0302", f"invalid regex: {e}", start) from e
            pattern.append(c)
            self.pos += 1
        raise JsonataParseError("S0302", "regex has no closing /", start)
