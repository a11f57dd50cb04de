"""JSONata core function library (public spec, jsonata.org; shipped in the
reference via JSONata4Java 2.4.5, reference pom.xml:45-49).

Pure-Python implementations used by the tier-2 interpreter. Functions that
invoke user lambdas receive the evaluator handle (``ev``) so recursion passes
through the depth/timeout guards (reference JsonataTransformation.java:104).
"""

from __future__ import annotations

import base64 as _b64
import json
import math
import random as _random
import re
import urllib.parse
from datetime import datetime, timedelta, timezone
from decimal import ROUND_HALF_EVEN, Decimal

from kafka_connect_jsonata_spark.jsonata.errors import JsonataError


class Undefined:
    _inst = None

    def __new__(cls):
        if cls._inst is None:
            cls._inst = super().__new__(cls)
        return cls._inst

    def __repr__(self):
        return "<undefined>"

    def __bool__(self):
        return False


UNDEFINED = Undefined()


class JSeq(list):
    """Result sequence: flattens on path steps; singleton unwraps."""

    __slots__ = ("keep_singleton",)

    def __init__(self, items=(), keep_singleton: bool = False):
        super().__init__(items)
        self.keep_singleton = keep_singleton


class JArray(list):
    """Constructed array kept whole when stepped over (the ``.[...]`` idiom)."""

    __slots__ = ()


def is_undef(v) -> bool:
    return v is UNDEFINED


def is_number(v) -> bool:
    return isinstance(v, (int, float)) and not isinstance(v, bool)


def norm_number(v):
    """JS-like numeric normalization: integral floats become ints."""
    if isinstance(v, float):
        if math.isnan(v) or math.isinf(v):
            raise JsonataError("D1001", "number out of range")
        if v.is_integer() and abs(v) < 2**53:
            return int(v)
    return v


def js_number_string(n) -> str:
    """Format a number the way JavaScript's Number#toString does (JSONata's
    $string semantics)."""
    if isinstance(n, bool):  # defensive
        return "true" if n else "false"
    if isinstance(n, int):
        return str(n)
    if n != n or math.isinf(n):
        raise JsonataError("D3001", "number is not finite")
    if n == 0:
        return "0"
    a = abs(n)
    if 1e-6 <= a < 1e21:
        d = Decimal(repr(n))
        s = format(d.normalize(), "f")
        return s
    # exponent form, JS style: 1e+21, 1.5e-7
    s = repr(n)
    m = re.match(r"(-?\d(?:\.\d+)?)e([-+])0*(\d+)", s)
    if m:
        return f"{m.group(1)}e{m.group(2)}{m.group(3)}"
    d = Decimal(repr(n))
    s = format(d.normalize(), "e").replace("E", "e")
    s = re.sub(r"e([-+])0*(\d+)", r"e\1\2", s)
    return s


def jtype(v) -> str:
    if is_undef(v):
        return "undefined"
    if v is None:
        return "null"
    if isinstance(v, bool):
        return "boolean"
    if is_number(v):
        return "number"
    if isinstance(v, str):
        return "string"
    if isinstance(v, list):
        return "array"
    if isinstance(v, dict):
        return "object"
    return "function"


def boolean_of(v):
    """JSONata truthiness ($boolean)."""
    if is_undef(v):
        return UNDEFINED
    t = jtype(v)
    if t == "boolean":
        return v
    if t == "null":
        return False
    if t == "number":
        return v != 0
    if t == "string":
        return len(v) > 0
    if t == "array":
        for item in v:
            b = boolean_of(item)
            if b is True:
                return True
        return False
    if t == "object":
        return len(v) > 0
    return False  # functions


def deep_equal(a, b) -> bool:
    ta, tb = jtype(a), jtype(b)
    if ta != tb:
        return False
    if ta == "number":
        return a == b
    if ta in ("string", "boolean", "null"):
        return a == b
    if ta == "array":
        return len(a) == len(b) and all(deep_equal(x, y) for x, y in zip(a, b))
    if ta == "object":
        return a.keys() == b.keys() and all(deep_equal(a[k], b[k]) for k in a)
    return a is b


def to_json_value(v):
    """Collapse interpreter values into plain JSON (drop UNDEFINED members)."""
    if is_undef(v):
        return None
    if isinstance(v, dict):
        return {k: to_json_value(x) for k, x in v.items() if not is_undef(x)}
    if isinstance(v, list):
        return [to_json_value(x) for x in v if not is_undef(x)]
    if isinstance(v, float):
        return norm_number(v)
    return v


def _json_default(o):
    return None


def json_serialize(v, indent=None) -> str:
    plain = to_json_value(v)

    def enc(x):
        if isinstance(x, dict):
            items = (f"{json.dumps(k)}:{enc(val)}" for k, val in x.items())
            return "{" + ",".join(items) + "}"
        if isinstance(x, list):
            return "[" + ",".join(enc(i) for i in x) + "]"
        if isinstance(x, bool):
            return "true" if x else "false"
        if x is None:
            return "null"
        if is_number(x):
            return js_number_string(x)
        if isinstance(x, str):
            return json.dumps(x)
        return '""'  # functions serialize as empty string

    if indent:
        return json.dumps(plain, indent=indent)
    return enc(plain)


# --------------------------------------------------------------------- string

def fn_string(ev, arg=UNDEFINED, prettify=UNDEFINED):
    if is_undef(arg):
        return UNDEFINED
    t = jtype(arg)
    if t == "string":
        return arg
    if t == "number":
        return js_number_string(arg)
    if t == "boolean":
        return "true" if arg else "false"
    if t == "null":
        return "null"
    if t == "function":
        return ""
    return json_serialize(arg, indent=2 if prettify is True else None)


def fn_length(ev, s=UNDEFINED):
    if is_undef(s):
        return UNDEFINED
    _expect_string(s, "$length")
    return len(s)


def _expect_string(s, fname):
    if not isinstance(s, str):
        raise JsonataError("T0410", f"argument of {fname} must be a string, got {jtype(s)}")


def fn_substring(ev, s=UNDEFINED, start=UNDEFINED, length=UNDEFINED):
    if is_undef(s):
        return UNDEFINED
    _expect_string(s, "$substring")
    # signature <s-nn?:s>: non-number start/length is T0410 (round 11 —
    # previously silently treated a bad start as 0)
    if not is_undef(start) and not is_number(start):
        raise JsonataError("T0410", "argument 2 of $substring must be a number")
    if not is_undef(length) and not is_number(length):
        raise JsonataError("T0410", "argument 3 of $substring must be a number")
    start = int(math.floor(start)) if is_number(start) else 0
    if start < 0:
        start = max(0, len(s) + start)
    if is_undef(length):
        return s[start:]
    n = int(math.floor(length))
    if n < 0:
        return ""
    return s[start : start + n]


def fn_substring_before(ev, s=UNDEFINED, sep=UNDEFINED):
    if is_undef(s):
        return UNDEFINED
    _expect_string(s, "$substringBefore")
    i = s.find(sep)
    return s if i < 0 else s[:i]


def fn_substring_after(ev, s=UNDEFINED, sep=UNDEFINED):
    if is_undef(s):
        return UNDEFINED
    _expect_string(s, "$substringAfter")
    i = s.find(sep)
    return s if i < 0 else s[i + len(sep):]


def fn_uppercase(ev, s=UNDEFINED):
    if is_undef(s):
        return UNDEFINED
    _expect_string(s, "$uppercase")
    return s.upper()


def fn_lowercase(ev, s=UNDEFINED):
    if is_undef(s):
        return UNDEFINED
    _expect_string(s, "$lowercase")
    return s.lower()


def fn_trim(ev, s=UNDEFINED):
    if is_undef(s):
        return UNDEFINED
    _expect_string(s, "$trim")
    return re.sub(r"[ \t\n\r]+", " ", s).strip()


def fn_pad(ev, s=UNDEFINED, width=UNDEFINED, char=UNDEFINED):
    if is_undef(s):
        return UNDEFINED
    _expect_string(s, "$pad")
    pad_char = char if isinstance(char, str) and char else " "
    w = int(width)
    if len(s) >= abs(w):
        return s
    padding = (pad_char * (abs(w) - len(s)))[: abs(w) - len(s)]
    return padding + s if w < 0 else s + padding


def _as_regex(pat):
    if isinstance(pat, re.Pattern):
        return pat
    if isinstance(pat, str):
        return None
    raise JsonataError("T0410", "pattern must be a string or regex")


def fn_contains(ev, s=UNDEFINED, pat=UNDEFINED):
    if is_undef(s):
        return UNDEFINED
    _expect_string(s, "$contains")
    rx = _as_regex(pat)
    if rx is None:
        return pat in s
    return rx.search(s) is not None


def fn_split(ev, s=UNDEFINED, sep=UNDEFINED, limit=UNDEFINED):
    if is_undef(s):
        return UNDEFINED
    _expect_string(s, "$split")
    if is_number(limit) and limit < 0:
        raise JsonataError("D3020", "limit of $split must be non-negative")
    rx = _as_regex(sep)
    if rx is None:
        parts = [p for p in s.split(sep)] if sep != "" else list(s)
    else:
        parts = rx.split(s)
        parts = [p for p in parts if p is not None]
    if is_number(limit):
        parts = parts[: int(limit)]
    return parts


def fn_join(ev, arr=UNDEFINED, sep=UNDEFINED):
    if is_undef(arr):
        return UNDEFINED
    if isinstance(arr, str):
        arr = [arr]
    if is_undef(sep):
        sep = ""
    elif not isinstance(sep, str):
        raise JsonataError("T0410", "argument 2 of $join must be a string")
    for x in arr:
        if not isinstance(x, str):
            raise JsonataError("T0412", "argument of $join must be an array of strings")
    return sep.join(arr)


def fn_match(ev, s=UNDEFINED, pat=UNDEFINED, limit=UNDEFINED):
    if is_undef(s):
        return UNDEFINED
    _expect_string(s, "$match")
    rx = _as_regex(pat)
    if rx is None:
        rx = re.compile(pat)
    out = []
    for m in rx.finditer(s):
        if m.group(0) == "" and m.start() == m.end():
            # avoid infinite zero-width semantics; JSONata errors D1004
            raise JsonataError("D1004", "regular expression matches zero length string")
        out.append(
            {
                "match": m.group(0),
                "index": m.start(),
                "groups": [g if g is not None else UNDEFINED for g in m.groups()],
            }
        )
        if is_number(limit) and len(out) >= limit:
            break
    for o in out:
        o["groups"] = [g for g in o["groups"] if not is_undef(g)]
    return JSeq(out)


def fn_replace(ev, s=UNDEFINED, pat=UNDEFINED, repl=UNDEFINED, limit=UNDEFINED):
    if is_undef(s):
        return UNDEFINED
    _expect_string(s, "$replace")
    if isinstance(pat, str) and pat == "":
        raise JsonataError("D3010", "second argument of $replace must not be empty")
    if is_number(limit) and limit < 0:
        raise JsonataError("D3011", "limit of $replace must be non-negative")
    # limit 0 means ZERO replacements (jsonata-js iterates while
    # count < limit) — distinct from an absent limit (replace all); the
    # previous `count if count else -1` conflated them (round-8 fix)
    count = int(limit) if is_number(limit) else None
    rx = _as_regex(pat)
    if rx is None:
        if not isinstance(repl, str):
            raise JsonataError("T0410", "replacement must be a string for string pattern")
        return s.replace(pat, repl, -1 if count is None else count)
    if count == 0:
        return s
    if callable(repl) or hasattr(repl, "jsonata_callable"):
        def py_repl(m):
            res = ev.invoke(repl, [{
                "match": m.group(0),
                "index": m.start(),
                "groups": [g for g in m.groups() if g is not None],
            }])
            if not isinstance(res, str):
                raise JsonataError("D3012", "replacement function must return a string")
            return res
        return rx.sub(py_repl, s, count=count or 0)
    # $N group references -> \N ; $$ -> $
    def conv(mtext: str) -> str:
        out, i = [], 0
        while i < len(mtext):
            c = mtext[i]
            if c == "\\":
                out.append("\\\\")
                i += 1
            elif c == "$":
                if i + 1 < len(mtext) and mtext[i + 1] == "$":
                    out.append("$")
                    i += 2
                elif i + 1 < len(mtext) and mtext[i + 1].isdigit():
                    j = i + 1
                    while j < len(mtext) and mtext[j].isdigit():
                        j += 1
                    out.append("\\g<" + mtext[i + 1 : j] + ">")
                    i = j
                else:
                    out.append("$")
                    i += 1
            else:
                out.append(c)
                i += 1
        return "".join(out)

    try:
        return rx.sub(conv(repl), s, count=count or 0)
    except re.error as e:
        # out-of-range $N group reference (round-6 fix: surface as a
        # JSONata evaluation error, not a raw Python re.error)
        raise JsonataError("D1004", f"invalid group reference in $replace: {e}")


def fn_base64encode(ev, s=UNDEFINED):
    if is_undef(s):
        return UNDEFINED
    return _b64.b64encode(s.encode("utf-8")).decode("ascii")


def fn_base64decode(ev, s=UNDEFINED):
    if is_undef(s):
        return UNDEFINED
    return _b64.b64decode(s.encode("ascii")).decode("utf-8")


def fn_encode_url_component(ev, s=UNDEFINED):
    if is_undef(s):
        return UNDEFINED
    return urllib.parse.quote(s, safe="-_.!~*'()")


def fn_decode_url_component(ev, s=UNDEFINED):
    if is_undef(s):
        return UNDEFINED
    return urllib.parse.unquote(s)


def fn_encode_url(ev, s=UNDEFINED):
    if is_undef(s):
        return UNDEFINED
    return urllib.parse.quote(s, safe="-_.!~*'();/?:@&=+$,#")


def fn_decode_url(ev, s=UNDEFINED):
    if is_undef(s):
        return UNDEFINED
    return urllib.parse.unquote(s)


# -------------------------------------------------------------------- numeric

def fn_number(ev, arg=UNDEFINED):
    if is_undef(arg):
        return UNDEFINED
    if isinstance(arg, bool):
        return 1 if arg else 0
    if is_number(arg):
        return arg
    if isinstance(arg, str):
        t = arg.strip()
        try:
            if re.fullmatch(r"[-+]?0x[0-9a-fA-F]+", t):
                return int(t, 16)
            # 0b / 0o accepted alongside 0x since jsonata 1.7 (the
            # functions.js number() regex covers all three) — round 11
            if re.fullmatch(r"[-+]?0[bB][01]+", t):
                return int(t, 2)
            if re.fullmatch(r"[-+]?0[oO][0-7]+", t):
                return int(t, 8)
            if re.fullmatch(r"[-+]?(\d+(\.\d+)?|\.\d+)([eE][-+]?\d+)?", t):
                v = float(t)
                return norm_number(v)
        except ValueError:
            pass
        raise JsonataError("D3030", f"unable to cast {arg!r} to a number")
    raise JsonataError("D3030", f"unable to cast {jtype(arg)} to a number")


def _expect_number(n, fname):
    if not is_number(n):
        raise JsonataError("T0410", f"argument of {fname} must be a number, got {jtype(n)}")


def fn_abs(ev, n=UNDEFINED):
    if is_undef(n):
        return UNDEFINED
    _expect_number(n, "$abs")
    return norm_number(abs(n))


def fn_floor(ev, n=UNDEFINED):
    if is_undef(n):
        return UNDEFINED
    _expect_number(n, "$floor")
    return int(math.floor(n))


def fn_ceil(ev, n=UNDEFINED):
    if is_undef(n):
        return UNDEFINED
    _expect_number(n, "$ceil")
    return int(math.ceil(n))


def fn_round(ev, n=UNDEFINED, precision=UNDEFINED):
    if is_undef(n):
        return UNDEFINED
    _expect_number(n, "$round")
    p = int(precision) if is_number(precision) else 0
    d = Decimal(repr(n)).quantize(Decimal(1).scaleb(-p), rounding=ROUND_HALF_EVEN)
    return norm_number(float(d))


def fn_power(ev, b=UNDEFINED, e=UNDEFINED):
    if is_undef(b):
        return UNDEFINED
    _expect_number(b, "$power")
    _expect_number(e, "$power")
    try:
        r = float(b) ** float(e)
    except (OverflowError, ZeroDivisionError) as exc:
        raise JsonataError("D3061", f"$power result out of range: {b}^{e}") from exc
    if isinstance(r, complex) or r != r or math.isinf(r):
        raise JsonataError("D3061", f"$power result not a finite number: {b}^{e}")
    return norm_number(r)


def fn_sqrt(ev, n=UNDEFINED):
    if is_undef(n):
        return UNDEFINED
    _expect_number(n, "$sqrt")
    if n < 0:
        raise JsonataError("D3060", "$sqrt of negative number")
    return norm_number(math.sqrt(n))


def fn_random(ev):
    return _random.random()


def fn_format_base(ev, n=UNDEFINED, radix=UNDEFINED):
    if is_undef(n):
        return UNDEFINED
    _expect_number(n, "$formatBase")
    r = int(radix) if is_number(radix) else 10
    if not (2 <= r <= 36):
        raise JsonataError("D3100", "radix of $formatBase must be 2..36")
    n = int(fn_round(ev, n))
    neg = n < 0
    n = abs(n)
    digits = "0123456789abcdefghijklmnopqrstuvwxyz"
    if n == 0:
        s = "0"
    else:
        out = []
        while n:
            n, d = divmod(n, r)
            out.append(digits[d])
        s = "".join(reversed(out))
    return "-" + s if neg else s


def fn_format_number(ev, n=UNDEFINED, picture=UNDEFINED, options=UNDEFINED):
    """Subset of the XPath picture string: 0 # . , % and per-mille, with a
    pos;neg split. Covers the patterns the JSONata docs exercise."""
    if is_undef(n):
        return UNDEFINED
    _expect_number(n, "$formatNumber")
    if not isinstance(picture, str):
        raise JsonataError("T0410", "picture of $formatNumber must be a string")
    opts = options if isinstance(options, dict) else {}
    decimal_sep = opts.get("decimal-separator", ".")
    group_sep = opts.get("grouping-separator", ",")
    minus = opts.get("minus-sign", "-")
    pct_char = opts.get("percent", "%")
    pmille_char = opts.get("per-mille", "‰")
    zero_digit = opts.get("zero-digit", "0")

    pics = picture.split(";")
    sub = pics[0] if n >= 0 or len(pics) < 2 else pics[1]
    explicit_neg = len(pics) >= 2 and n < 0
    value = n
    suffix = prefix = ""
    if pct_char in sub:
        value = value * 100
    if pmille_char in sub:
        value = value * 1000
    # XPath decimal-digit-family: ANY decimal digit in the picture is a
    # mandatory-digit character ('01%' == '00%' — jsonata docs format 0.14
    # as "14%"); normalize 1-9 to 0 before parsing
    sub = re.sub(r"[1-9]", "0", sub)

    # scientific notation: '<mantissa>e<exp-digits>' (XPath exponent
    # separator). The value is scaled so the mantissa's integer part has
    # exactly the picture's mandatory integer digits; the exponent is
    # zero-padded to the exponent picture's width, minus sign only when
    # negative. ('0.######e0' formats 0.00001 as '1e-5'.)
    exp_sep = opts.get("exponent-separator", "e")
    if exp_sep in sub:
        mant_pic, _, epart = sub.partition(exp_sep)
        em = re.match(r"^([0#]+)([^0#]*)$", epart)
        if em and re.search(r"[0#]", mant_pic):
            mm = re.match(r"^([^0#]*)([0#.,]*[0#])([^0#]*)$", mant_pic)
            if not mm:
                raise JsonataError("D3080", f"invalid picture string {picture!r}")
            mbody = mm.group(2)
            m_int = mbody.split(".", 1)[0].replace(",", "")
            min_int_m = max(m_int.count("0"), 1)
            max_frac_m = len(mbody.split(".", 1)[1]) if "." in mbody else 0
            v = float(value)
            if v == 0:
                exp10, mant_v = 0, 0.0
            else:
                exp10 = math.floor(math.log10(abs(v))) - (min_int_m - 1)
                mant_v = v / (10.0 ** exp10)
                q = Decimal(repr(abs(mant_v))).quantize(
                    Decimal(1).scaleb(-max_frac_m), rounding=ROUND_HALF_EVEN
                )
                if q >= Decimal(10) ** min_int_m:  # rounding overflowed width
                    exp10 += 1
                    mant_v = v / (10.0 ** exp10)
            mant_str = fn_format_number(ev, mant_v, mant_pic, options)
            digits = em.group(1).count("0")
            e_str = str(abs(exp10)).zfill(digits)
            if exp10 < 0:
                e_str = minus + e_str
            return mant_str + exp_sep + e_str + em.group(2)

    m = re.match(r"^([^0#]*)([0#.,]*[0#])([^0#]*)$", sub)
    if not m:
        raise JsonataError("D3080", f"invalid picture string {picture!r}")
    prefix, body, suffix = m.group(1), m.group(2), m.group(3)
    if "." in body:
        int_part, frac_part = body.split(".", 1)
    else:
        int_part, frac_part = body, ""
    min_int = int_part.replace(",", "").count("0")
    min_frac = frac_part.count("0")
    max_frac = len(frac_part)
    # grouping size from the rightmost separator in the integer part
    group_size = 0
    if "," in int_part:
        group_size = len(int_part) - int_part.rindex(",") - 1
    q = Decimal(repr(float(value))).quantize(
        Decimal(1).scaleb(-max_frac), rounding=ROUND_HALF_EVEN
    )
    # is_signed, not < 0: a negative value rounding to zero keeps its minus
    # sign ("-0.00"), matching java.text.DecimalFormat — what the reference
    # (JSONata4Java) emits — and XPath fn:format-number's negative zero
    neg = q.is_signed()
    q = abs(q)
    s = format(q, "f")
    if "." in s:
        ip, fp = s.split(".")
    else:
        ip, fp = s, ""
    fp = fp[:max_frac].rstrip("0")
    while len(fp) < min_frac:
        fp += "0"
    while len(ip) < min_int:
        ip = "0" + ip
    if zero_digit != "0":
        off = ord(zero_digit) - ord("0")
        ip = "".join(chr(ord(c) + off) for c in ip)
        fp = "".join(chr(ord(c) + off) for c in fp)
    if group_size:
        rev = ip[::-1]
        chunks = [rev[i : i + group_size] for i in range(0, len(rev), group_size)]
        ip = group_sep.join(chunks)[::-1]
    out = prefix + ip + (decimal_sep + fp if fp else "") + suffix
    if neg and not explicit_neg:
        out = minus + out
    return out


_ONES = ["zero", "one", "two", "three", "four", "five", "six", "seven", "eight", "nine",
         "ten", "eleven", "twelve", "thirteen", "fourteen", "fifteen", "sixteen",
         "seventeen", "eighteen", "nineteen"]
_TENS = ["", "", "twenty", "thirty", "forty", "fifty", "sixty", "seventy", "eighty", "ninety"]
_SCALES = [(10**12, "trillion"), (10**9, "billion"), (10**6, "million"), (10**3, "thousand"), (100, "hundred")]


def _to_words(n: int) -> str:
    if n < 0:
        return "minus " + _to_words(-n)
    if n < 20:
        return _ONES[n]
    if n < 100:
        t, r = divmod(n, 10)
        return _TENS[t] + ("-" + _ONES[r] if r else "")
    for scale, name in _SCALES:
        if n >= scale:
            head, rest = divmod(n, scale)
            out = _to_words(head) + " " + name
            if rest:
                joiner = " and " if rest < 100 else " "
                out += joiner + _to_words(rest)
            return out
    return str(n)


_ORD_EXCEPTIONS = {"one": "first", "two": "second", "three": "third", "five": "fifth",
                   "eight": "eighth", "nine": "ninth", "twelve": "twelfth"}


def _to_words_ordinal(n: int) -> str:
    words = _to_words(n)
    for ws, wo in _ORD_EXCEPTIONS.items():
        if words.endswith(ws):
            return words[: -len(ws)] + wo
    if words.endswith("y"):
        return words[:-1] + "ieth"
    return words + "th"


_ROMAN = [(1000, "m"), (900, "cm"), (500, "d"), (400, "cd"), (100, "c"), (90, "xc"),
          (50, "l"), (40, "xl"), (10, "x"), (9, "ix"), (5, "v"), (4, "iv"), (1, "i")]


def _to_roman(n: int) -> str:
    out = []
    for val, sym in _ROMAN:
        while n >= val:
            out.append(sym)
            n -= val
    return "".join(out)


def _to_alpha(n: int) -> str:
    out = []
    while n > 0:
        n, r = divmod(n - 1, 26)
        out.append(chr(ord("a") + r))
    return "".join(reversed(out))


def _ordinal_suffix(n: int) -> str:
    if 10 <= n % 100 <= 20:
        return "th"
    return {1: "st", 2: "nd", 3: "rd"}.get(n % 10, "th")


def fn_format_integer(ev, n=UNDEFINED, picture=UNDEFINED):
    if is_undef(n):
        return UNDEFINED
    _expect_number(n, "$formatInteger")
    n = int(fn_round(ev, n))
    if not isinstance(picture, str):
        raise JsonataError("T0410", "picture of $formatInteger must be a string")
    pic = picture
    ordinal = False
    if ";o" in pic:
        pic, ordinal = pic.split(";")[0], True
    if pic in ("w", "W", "Ww"):
        words = _to_words_ordinal(n) if ordinal else _to_words(n)
        if pic == "W":
            return words.upper()
        if pic == "Ww":
            return " ".join(w.capitalize() for w in words.split(" "))
        return words
    if pic == "i":
        return _to_roman(abs(n)) if n >= 0 else "-" + _to_roman(-n)
    if pic == "I":
        return _to_roman(abs(n)).upper() if n >= 0 else "-" + _to_roman(-n).upper()
    if pic == "a":
        return _to_alpha(n)
    if pic == "A":
        return _to_alpha(n).upper()
    # decimal-digit-family applies here too: '1;o' == '0;o' ("12th")
    if re.fullmatch(r"[0#,]*0", re.sub(r"[1-9]", "0", pic)):
        s = fn_format_number(ev, n, pic)
        return s + (_ordinal_suffix(n) if ordinal else "")
    raise JsonataError("D3130", f"unsupported $formatInteger picture {picture!r}")


def fn_parse_integer(ev, s=UNDEFINED, picture=UNDEFINED):
    if is_undef(s):
        return UNDEFINED
    _expect_string(s, "$parseInteger")
    pic = picture if isinstance(picture, str) else "0"
    if pic in ("i", "I"):
        vals = {"i": 1, "v": 5, "x": 10, "l": 50, "c": 100, "d": 500, "m": 1000}
        total, prev = 0, 0
        for c in reversed(s.lower()):
            v = vals.get(c)
            if v is None:
                raise JsonataError("D3137", f"cannot parse roman numeral {s!r}")
            total = total - v if v < prev else total + v
            prev = max(prev, v)
        return total
    if pic in ("a", "A"):
        total = 0
        for c in s.lower():
            total = total * 26 + (ord(c) - ord("a") + 1)
        return total
    if pic in ("w", "W", "Ww"):
        return _parse_words(s)
    t = re.sub(r"[^0-9-]", "", s)
    if not re.fullmatch(r"-?\d+", t):
        raise JsonataError("D3137", f"cannot parse integer from {s!r}")
    return int(t)


def _parse_words(s: str) -> int:
    words = re.split(r"[\s-]+", s.lower().replace(" and ", " "))
    small = {w: i for i, w in enumerate(_ONES)}
    small.update({w: i * 10 for i, w in enumerate(_TENS) if w})
    scales = {"hundred": 100, "thousand": 10**3, "million": 10**6,
              "billion": 10**9, "trillion": 10**12}
    total = cur = 0
    neg = False
    for w in words:
        if w in ("minus", "negative"):
            neg = True
        elif w in small:
            cur += small[w]
        elif w == "hundred":
            cur *= 100
        elif w in scales:
            total += cur * scales[w]
            cur = 0
        elif w:
            raise JsonataError("D3137", f"cannot parse number word {w!r}")
    total += cur
    return -total if neg else total


# ---------------------------------------------------------------- aggregation

def fn_sum(ev, arr=UNDEFINED):
    if is_undef(arr):
        return UNDEFINED
    arr = arr if isinstance(arr, list) else [arr]
    total = 0
    for x in arr:
        if not is_number(x):
            raise JsonataError("T0412", "argument of $sum must be an array of numbers")
        total += x
    return norm_number(total)


def fn_max(ev, arr=UNDEFINED):
    if is_undef(arr):
        return UNDEFINED
    arr = arr if isinstance(arr, list) else [arr]
    if not arr:
        return UNDEFINED
    for x in arr:
        if not is_number(x):
            raise JsonataError("T0412", "argument of $max must be an array of numbers")
    return norm_number(max(arr))


def fn_min(ev, arr=UNDEFINED):
    if is_undef(arr):
        return UNDEFINED
    arr = arr if isinstance(arr, list) else [arr]
    if not arr:
        return UNDEFINED
    for x in arr:
        if not is_number(x):
            raise JsonataError("T0412", "argument of $min must be an array of numbers")
    return norm_number(min(arr))


def fn_average(ev, arr=UNDEFINED):
    if is_undef(arr):
        return UNDEFINED
    arr = arr if isinstance(arr, list) else [arr]
    if not arr:
        return UNDEFINED
    return norm_number(fn_sum(ev, arr) / len(arr))


def fn_count(ev, arr=UNDEFINED):
    if is_undef(arr):
        return 0
    return len(arr) if isinstance(arr, list) else 1


# -------------------------------------------------------------------- boolean

def fn_boolean(ev, arg=UNDEFINED):
    return boolean_of(arg)


def fn_not(ev, arg=UNDEFINED):
    if is_undef(arg):
        return UNDEFINED
    return not boolean_of(arg)


def fn_exists(ev, arg=UNDEFINED):
    return not is_undef(arg)


# ---------------------------------------------------------------------- array

def fn_append(ev, a=UNDEFINED, b=UNDEFINED):
    if is_undef(a):
        return b
    if is_undef(b):
        return a
    a = a if isinstance(a, list) else [a]
    b = b if isinstance(b, list) else [b]
    return JSeq(list(a) + list(b))


def fn_reverse(ev, arr=UNDEFINED):
    if is_undef(arr):
        return UNDEFINED
    arr = arr if isinstance(arr, list) else [arr]
    return list(reversed(arr))


def fn_shuffle(ev, arr=UNDEFINED):
    if is_undef(arr):
        return UNDEFINED
    arr = list(arr) if isinstance(arr, list) else [arr]
    _random.shuffle(arr)
    return arr


def fn_distinct(ev, arr=UNDEFINED):
    if is_undef(arr):
        return UNDEFINED
    arr = arr if isinstance(arr, list) else [arr]
    out = []
    for x in arr:
        if not any(deep_equal(x, y) for y in out):
            out.append(x)
    return out


def fn_zip(ev, *arrays):
    if not arrays:
        raise JsonataError("T0410", "$zip requires at least one argument")
    arrs = [a if isinstance(a, list) else [a] for a in arrays if not is_undef(a)]
    if not arrs:
        return []
    n = min(len(a) for a in arrs)
    return [[a[i] for a in arrs] for i in range(n)]


def fn_sort(ev, arr=UNDEFINED, comparator=UNDEFINED):
    if is_undef(arr):
        return UNDEFINED
    arr = list(arr) if isinstance(arr, list) else [arr]
    if len(arr) <= 1:
        return arr
    if is_undef(comparator):
        kinds = {jtype(x) for x in arr}
        if kinds <= {"number"}:
            return sorted(arr)
        if kinds <= {"string"}:
            return sorted(arr)
        raise JsonataError("D3070", "$sort default comparator requires all numbers or all strings")

    def swap(a, b) -> bool:
        return boolean_of(ev.invoke(comparator, [a, b])) is True

    return _merge_sort(arr, swap)


def _merge_sort(arr, swap) -> list:
    if len(arr) <= 1:
        return arr
    mid = len(arr) // 2
    left = _merge_sort(arr[:mid], swap)
    right = _merge_sort(arr[mid:], swap)
    out, i, j = [], 0, 0
    while i < len(left) and j < len(right):
        if swap(left[i], right[j]):
            out.append(right[j])
            j += 1
        else:
            out.append(left[i])
            i += 1
    out.extend(left[i:])
    out.extend(right[j:])
    return out


# --------------------------------------------------------------------- object

def fn_keys(ev, obj=UNDEFINED):
    if is_undef(obj):
        return UNDEFINED
    if isinstance(obj, list):
        seen: list[str] = []
        for item in obj:
            ks = fn_keys(ev, item)
            if isinstance(ks, list):
                for k in ks:
                    if k not in seen:
                        seen.append(k)
            elif isinstance(ks, str) and ks not in seen:
                seen.append(ks)
        return JSeq(seen)
    if isinstance(obj, dict):
        return JSeq(obj.keys())
    return UNDEFINED


def fn_lookup(ev, obj=UNDEFINED, key=UNDEFINED):
    if is_undef(obj):
        return UNDEFINED
    if isinstance(obj, list):
        out = []
        for item in obj:
            v = fn_lookup(ev, item, key)
            if is_undef(v):
                continue
            if isinstance(v, list):
                out.extend(v)
            else:
                out.append(v)
        if not out:
            return UNDEFINED
        return out[0] if len(out) == 1 else out
    if isinstance(obj, dict):
        return obj.get(key, UNDEFINED)
    return UNDEFINED


def fn_spread(ev, obj=UNDEFINED):
    if is_undef(obj):
        return UNDEFINED
    if isinstance(obj, list):
        out = []
        for item in obj:
            s = fn_spread(ev, item)
            if isinstance(s, list):
                out.extend(s)
        return JSeq(out)
    if isinstance(obj, dict):
        return JSeq({k: v} for k, v in obj.items())
    return obj


def fn_merge(ev, arr=UNDEFINED):
    if is_undef(arr):
        return UNDEFINED
    arr = arr if isinstance(arr, list) else [arr]
    out: dict = {}
    for item in arr:
        if not isinstance(item, dict):
            raise JsonataError("T0412", "argument of $merge must be an array of objects")
        out.update(item)
    return out


def fn_type(ev, v=UNDEFINED):
    if is_undef(v):
        return UNDEFINED
    return jtype(v)


def fn_error(ev, message=UNDEFINED):
    raise JsonataError("D3137", message if isinstance(message, str) else "$error() function evaluated")


def fn_assert(ev, cond=UNDEFINED, message=UNDEFINED):
    if boolean_of(cond) is not True:
        raise JsonataError("D3141", message if isinstance(message, str) else "$assert() statement failed")
    return UNDEFINED


# ------------------------------------------------------------------ date/time

_MONTHS = ["January", "February", "March", "April", "May", "June", "July",
           "August", "September", "October", "November", "December"]
_DAYS = ["Monday", "Tuesday", "Wednesday", "Thursday", "Friday", "Saturday", "Sunday"]


def _parse_tz(tz) -> timezone:
    if is_undef(tz) or tz in (None, "", "Z"):
        return timezone.utc
    m = re.fullmatch(r"([+-])(\d{2}):?(\d{2})", tz)
    if not m:
        raise JsonataError("D3134", f"invalid timezone {tz!r}")
    sign = 1 if m.group(1) == "+" else -1
    return timezone(sign * timedelta(hours=int(m.group(2)), minutes=int(m.group(3))))


def _format_datetime(dt: datetime, picture: str) -> str:
    out = []
    i = 0
    while i < len(picture):
        c = picture[i]
        if c == "[":
            if picture.startswith("[[", i):
                out.append("[")
                i += 2
                continue
            end = picture.index("]", i)
            comp = picture[i + 1 : end].replace(" ", "")
            out.append(_format_component(dt, comp))
            i = end + 1
        elif c == "]":
            if picture.startswith("]]", i):
                out.append("]")
                i += 2
            else:
                i += 1
        else:
            out.append(c)
            i += 1
    return "".join(out)


def _format_component(dt: datetime, comp: str) -> str:
    spec = comp[0]
    mods = comp[1:]
    if spec == "Y":
        v = dt.year
    elif spec == "M":
        v = dt.month
    elif spec == "D":
        v = dt.day
    elif spec == "d":
        v = (dt - dt.replace(month=1, day=1)).days + 1
    elif spec == "F":
        v = dt.isoweekday()
    elif spec == "W":
        v = dt.isocalendar()[1]
    elif spec == "H":
        v = dt.hour
    elif spec == "h":
        v = dt.hour % 12 or 12
    elif spec == "P":
        return ("am" if dt.hour < 12 else "pm") if mods != "N" else ("AM" if dt.hour < 12 else "PM")
    elif spec == "m":
        v = dt.minute
    elif spec == "s":
        v = dt.second
    elif spec == "f":
        v = dt.microsecond // 1000
        width = len(mods) if mods and set(mods) <= set("0123456789") else 3
        return str(v).zfill(3)[:width]
    elif spec in ("Z", "z"):
        off = dt.utcoffset() or timedelta(0)
        total = int(off.total_seconds() // 60)
        sign = "+" if total >= 0 else "-"
        total = abs(total)
        if mods == "" and spec == "Z" and total == 0:
            return "+00:00" if False else "Z" if comp == "Z" else "+0000"
        hhmm = f"{sign}{total // 60:02d}:{total % 60:02d}" if ":" in mods or mods == "" else f"{sign}{total // 60:02d}{total % 60:02d}"
        return ("GMT" + hhmm) if spec == "z" else hhmm
    else:
        raise JsonataError("D3132", f"unsupported date picture component [{comp}]")

    if mods.startswith("N"):
        if spec == "M":
            name = _MONTHS[v - 1]
        elif spec == "F":
            name = _DAYS[v - 1]
        else:
            name = str(v)
        if mods.startswith("Nn"):
            return name
        if mods.startswith("N") and len(mods) > 1 and mods[1] != "n":
            return name.upper()
        return name.upper() if mods == "N" else name
    if mods.startswith("n"):
        name = (_MONTHS[v - 1] if spec == "M" else _DAYS[v - 1] if spec == "F" else str(v))
        return name.lower()
    if mods.endswith("o"):
        digits = mods[:-1]
        pad = len(digits) if digits else 0
        return str(v).zfill(pad) + _ordinal_suffix(v)
    if mods and set(mods) <= set("0123456789#"):
        # '#' is the OPTIONAL-digit marker: '[D#1]' pads to width 1, not 2
        # (docs: '[D#1]/[M#1]/[Y0001]' -> '7/11/2017')
        return str(v).zfill(sum(1 for c in mods if c != "#"))
    if mods == "":
        if spec == "F":
            # XPath/XSLT default presentation for F is 'n' (lowercase name),
            # not a number — [F] -> 'tuesday' (conformance fix, round 5)
            return _DAYS[v - 1].lower()
        return str(v)
    raise JsonataError("D3132", f"unsupported date picture component [{comp}]")


def fn_from_millis(ev, ms=UNDEFINED, picture=UNDEFINED, tz=UNDEFINED):
    if is_undef(ms):
        return UNDEFINED
    _expect_number(ms, "$fromMillis")
    dt = datetime.fromtimestamp(ms / 1000.0, tz=_parse_tz(tz))
    if is_undef(picture) or picture is None:
        iso = dt.strftime("%Y-%m-%dT%H:%M:%S")
        iso += f".{dt.microsecond // 1000:03d}"
        off = dt.utcoffset() or timedelta(0)
        if off == timedelta(0):
            return iso + "Z"
        total = int(off.total_seconds() // 60)
        sign = "+" if total >= 0 else "-"
        total = abs(total)
        return iso + f"{sign}{total // 60:02d}:{total % 60:02d}"
    return _format_datetime(dt, picture)


_PICTURE_TO_RE = {
    "Y": r"(?P<Y>\d{1,4})", "M": r"(?P<M>\d{1,2})", "D": r"(?P<D>\d{1,2})",
    "H": r"(?P<H>\d{1,2})", "h": r"(?P<h>\d{1,2})", "m": r"(?P<m>\d{1,2})",
    "s": r"(?P<s>\d{1,2})", "f": r"(?P<f>\d{1,9})", "P": r"(?P<P>[AaPp][Mm])",
    "Z": r"(?P<Z>Z|[+-]\d{2}:?\d{2})",
}


def fn_to_millis(ev, s=UNDEFINED, picture=UNDEFINED):
    if is_undef(s):
        return UNDEFINED
    _expect_string(s, "$toMillis")
    if is_undef(picture) or picture is None:
        t = s
        if t.endswith("Z"):
            t = t[:-1] + "+00:00"
        try:
            dt = datetime.fromisoformat(t)
        except ValueError as e:
            raise JsonataError("D3110", f"cannot parse timestamp {s!r}") from e
        if dt.tzinfo is None:
            dt = dt.replace(tzinfo=timezone.utc)
        return int(dt.timestamp() * 1000)
    # picture-driven parse
    rx = []
    i = 0
    while i < len(picture):
        c = picture[i]
        if c == "[":
            end = picture.index("]", i)
            comp = picture[i + 1 : end]
            spec = comp[0]
            if spec not in _PICTURE_TO_RE:
                raise JsonataError("D3136", f"unsupported parse component [{comp}]")
            rx.append(_PICTURE_TO_RE[spec])
            i = end + 1
        else:
            rx.append(re.escape(c))
            i += 1
    m = re.fullmatch("".join(rx), s)
    if not m:
        raise JsonataError("D3136", f"timestamp {s!r} does not match picture {picture!r}")
    g = m.groupdict()
    hour = int(g.get("H") or 0)
    if g.get("h"):
        hour = int(g["h"]) % 12
        if (g.get("P") or "").lower() == "pm":
            hour += 12
    frac = g.get("f") or "0"
    micro = int(float("0." + frac) * 1e6)
    tz = _parse_tz(g.get("Z") or "Z")
    dt = datetime(int(g.get("Y") or 1970), int(g.get("M") or 1), int(g.get("D") or 1),
                  hour, int(g.get("m") or 0), int(g.get("s") or 0), micro, tzinfo=tz)
    return int(dt.timestamp() * 1000)


def fn_now(ev, picture=UNDEFINED, tz=UNDEFINED):
    ms = ev.timestamp_ms
    if is_undef(picture):
        return fn_from_millis(ev, ms)
    return fn_from_millis(ev, ms, picture, tz)


def fn_millis(ev):
    return ev.timestamp_ms


# ---------------------------------------------------------------- higher-order

def _arity(ev, func) -> int:
    return ev.arity(func)


def fn_map(ev, arr=UNDEFINED, func=UNDEFINED):
    if is_undef(arr):
        return UNDEFINED
    arr = arr if isinstance(arr, list) else [arr]
    n = _arity(ev, func)
    out = JSeq()
    for i, x in enumerate(arr):
        args = [x, i, arr][:max(1, n)]
        r = ev.invoke(func, args)
        if not is_undef(r):
            out.append(r)
    return out


def fn_filter(ev, arr=UNDEFINED, func=UNDEFINED):
    if is_undef(arr):
        return UNDEFINED
    arr = arr if isinstance(arr, list) else [arr]
    n = _arity(ev, func)
    out = JSeq()
    for i, x in enumerate(arr):
        args = [x, i, arr][:max(1, n)]
        if boolean_of(ev.invoke(func, args)) is True:
            out.append(x)
    return out


def fn_single(ev, arr=UNDEFINED, func=UNDEFINED):
    if is_undef(arr):
        return UNDEFINED
    arr = arr if isinstance(arr, list) else [arr]
    found = UNDEFINED
    n = _arity(ev, func) if not is_undef(func) else 0
    for i, x in enumerate(arr):
        ok = True
        if not is_undef(func):
            args = [x, i, arr][:max(1, n)]
            ok = boolean_of(ev.invoke(func, args)) is True
        if ok:
            if not is_undef(found):
                raise JsonataError("D3138", "$single found more than one matching element")
            found = x
    if is_undef(found):
        raise JsonataError("D3139", "$single found no matching element")
    return found


def fn_reduce(ev, arr=UNDEFINED, func=UNDEFINED, init=UNDEFINED):
    if is_undef(arr):
        return UNDEFINED
    arr = arr if isinstance(arr, list) else [arr]
    if _arity(ev, func) < 2:
        raise JsonataError("D3050", "$reduce function must accept at least two arguments")
    if is_undef(init):
        if not arr:
            return UNDEFINED
        acc, rest, start = arr[0], arr[1:], 1
    else:
        acc, rest, start = init, arr, 0
    for i, x in enumerate(rest):
        acc = ev.invoke(func, [acc, x, i + start, arr][: max(2, _arity(ev, func))])
    return acc


def fn_sift(ev, obj=UNDEFINED, func=UNDEFINED):
    if is_undef(obj):
        return UNDEFINED
    if not isinstance(obj, dict):
        return UNDEFINED
    n = _arity(ev, func)
    out = {}
    for k, v in obj.items():
        args = [v, k, obj][:max(1, n)]
        if boolean_of(ev.invoke(func, args)) is True:
            out[k] = v
    if not out:
        return UNDEFINED
    return out


def fn_each(ev, obj=UNDEFINED, func=UNDEFINED):
    if is_undef(obj):
        return UNDEFINED
    if not isinstance(obj, dict):
        return UNDEFINED
    n = _arity(ev, func)
    out = JSeq()
    for k, v in obj.items():
        args = [v, k, obj][:max(1, n)]
        r = ev.invoke(func, args)
        if not is_undef(r):
            out.append(r)
    return out


def fn_eval(ev, expr=UNDEFINED, context=UNDEFINED):
    if is_undef(expr):
        return UNDEFINED
    _expect_string(expr, "$eval")
    return ev.eval_string(expr, context)


# ----------------------------------------------------------------- registry

# name -> (fn, min_args_for_context_insertion or None)
# Context insertion: when the function is called with one argument short AND
# the first parameter accepts the evaluation context (signature '-' in the
# public spec), the context value is prepended.
REGISTRY: dict[str, tuple] = {
    "string": (fn_string, 1),
    "length": (fn_length, 1),
    "substring": (fn_substring, 2),
    "substringBefore": (fn_substring_before, 2),
    "substringAfter": (fn_substring_after, 2),
    "uppercase": (fn_uppercase, 1),
    "lowercase": (fn_lowercase, 1),
    "trim": (fn_trim, 1),
    "pad": (fn_pad, 2),
    "contains": (fn_contains, 2),
    "split": (fn_split, 2),
    "join": (fn_join, None),
    "match": (fn_match, 2),
    "replace": (fn_replace, 3),
    "base64encode": (fn_base64encode, 1),
    "base64decode": (fn_base64decode, 1),
    "encodeUrlComponent": (fn_encode_url_component, 1),
    "decodeUrlComponent": (fn_decode_url_component, 1),
    "encodeUrl": (fn_encode_url, 1),
    "decodeUrl": (fn_decode_url, 1),
    "number": (fn_number, 1),
    "abs": (fn_abs, 1),
    "floor": (fn_floor, 1),
    "ceil": (fn_ceil, 1),
    "round": (fn_round, 1),
    "power": (fn_power, 2),
    "sqrt": (fn_sqrt, 1),
    "random": (fn_random, None),
    "formatNumber": (fn_format_number, 2),
    "formatBase": (fn_format_base, 1),
    "formatInteger": (fn_format_integer, 2),
    "parseInteger": (fn_parse_integer, 2),
    "sum": (fn_sum, None),
    "max": (fn_max, None),
    "min": (fn_min, None),
    "average": (fn_average, None),
    "count": (fn_count, None),
    "boolean": (fn_boolean, 1),
    "not": (fn_not, 1),
    "exists": (fn_exists, None),
    "append": (fn_append, None),
    "reverse": (fn_reverse, None),
    "shuffle": (fn_shuffle, None),
    "distinct": (fn_distinct, None),
    "zip": (fn_zip, None),
    "sort": (fn_sort, None),
    "keys": (fn_keys, 1),
    "lookup": (fn_lookup, 2),
    "spread": (fn_spread, 1),
    "merge": (fn_merge, None),
    "type": (fn_type, 1),
    "error": (fn_error, None),
    "assert": (fn_assert, None),
    "fromMillis": (fn_from_millis, None),
    "toMillis": (fn_to_millis, 1),
    "now": (fn_now, None),
    "millis": (fn_millis, None),
    "map": (fn_map, None),
    "filter": (fn_filter, None),
    "single": (fn_single, None),
    "reduce": (fn_reduce, None),
    "sift": (fn_sift, 2),
    "each": (fn_each, 2),
    "eval": (fn_eval, None),
}
