"""Parser for the Fluent Bit stream-processor SQL dialect.

Grammar re-derived from the EBNF in the reference's
src/stream_processor/README.md:5-29 and the bison grammar
(src/stream_processor/parser/sql.y); AST shapes mirror
include/fluent-bit/stream_processor/flb_sp_parser.h:143-186. This is a
fresh hand-written tokenizer + recursive-descent parser (the reference
uses flex/bison).

    CREATE STREAM name [WITH (k='v',...)] AS <select>
    CREATE SNAPSHOT name [WITH (limit='N')] AS <select>
    FLUSH SNAPSHOT name
    <select> := SELECT keys FROM STREAM:name|TAG:'pattern'
                [WHERE cond] [WINDOW TUMBLING (n SECOND) |
                              HOPPING (n SECOND, ADVANCE BY m SECOND)]
                [GROUP BY keys] [LIMIT n]

Keys: '*', identifiers, subkey paths key['a']['b'], AS aliases, and the
function set MIN/MAX/SUM/AVG/COUNT, NOW, UNIX_TIMESTAMP, RECORD_TAG,
RECORD_TIME, TIMESERIES_FORECAST/FORECAST_R.
Conditions: AND/OR/NOT, parens, = != <> < <= > >=, IS [NOT] NULL,
@record.contains(key), literals bool/int/float/'string'.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field


class SpParseError(ValueError):
    pass


# ---------------------------------------------------------------------------
# AST

@dataclass
class Subkey:
    name: str
    path: list[str] = field(default_factory=list)


@dataclass
class Key:
    """Projection item: bare key, subkey path, or function call."""
    func: str | None = None       # MIN/MAX/SUM/AVG/COUNT/NOW/.../None
    key: Subkey | None = None     # None for COUNT(*), NOW(), ...
    alias: str | None = None
    args: list[object] = field(default_factory=list)  # extra fn args
    star: bool = False

    def display(self) -> str:
        """Output column name, reference-style: alias or 'SUM(key)'
        (flb_sp.c package_results :1224-1331)."""
        if self.alias:
            return self.alias
        if self.func:
            inner = "*" if self.key is None and self.func == "COUNT" else (
                self.key.name if self.key else ""
            )
            return f"{self.func}({inner})"
        return ".".join([self.key.name] + self.key.path) if self.key.path else self.key.name


@dataclass
class Literal:
    value: object  # bool | int | float | str | None


@dataclass
class Comparison:
    op: str  # = != < <= > >=
    left: object
    right: object


@dataclass
class BoolOp:
    op: str  # AND OR NOT
    operands: list[object]


@dataclass
class IsNull:
    key: Subkey
    negated: bool = False


@dataclass
class RecordContains:
    key: Subkey


@dataclass
class Window:
    kind: str  # TUMBLING | HOPPING
    size_sec: int
    advance_sec: int | None = None


@dataclass
class Select:
    keys: list[Key]
    source_type: str  # STREAM | TAG
    source: str
    where: object | None = None
    window: Window | None = None
    group_by: list[Subkey] = field(default_factory=list)
    limit: int | None = None


@dataclass
class CreateStream:
    name: str
    props: dict[str, str]
    select: Select


@dataclass
class CreateSnapshot:
    name: str
    props: dict[str, str]
    select: Select


@dataclass
class FlushSnapshot:
    name: str


AGG_FUNCS = {"MIN", "MAX", "SUM", "AVG", "COUNT"}
SCALAR_FUNCS = {"NOW", "UNIX_TIMESTAMP", "RECORD_TAG", "RECORD_TIME"}
TS_FUNCS = {"TIMESERIES_FORECAST", "FORECAST_R"}


# ---------------------------------------------------------------------------
# tokenizer

_TOKEN_RE = re.compile(
    r"""
    (?P<ws>\s+)
  | (?P<string>'(?:[^']|'')*')
  | (?P<float>\d+\.\d+)
  | (?P<int>\d+)
  | (?P<record>@record\.contains)
  | (?P<ident>[A-Za-z_][A-Za-z0-9_]*)
  | (?P<op><>|!=|<=|>=|=|<|>)
  | (?P<punct>[(),;:\[\]*.])
    """,
    re.VERBOSE,
)


def tokenize(sql: str) -> list[tuple[str, str]]:
    out = []
    pos = 0
    while pos < len(sql):
        m = _TOKEN_RE.match(sql, pos)
        if not m:
            raise SpParseError(f"bad character at {pos}: {sql[pos:pos + 10]!r}")
        pos = m.end()
        kind = m.lastgroup
        if kind == "ws":
            continue
        out.append((kind, m.group()))
    out.append(("eof", ""))
    return out


# ---------------------------------------------------------------------------
# parser

class Parser:
    def __init__(self, sql: str):
        self.toks = tokenize(sql)
        self.i = 0

    # -- token helpers
    def peek(self) -> tuple[str, str]:
        return self.toks[self.i]

    def next(self) -> tuple[str, str]:
        t = self.toks[self.i]
        self.i += 1
        return t

    def accept_kw(self, *kws: str) -> str | None:
        kind, val = self.peek()
        if kind == "ident" and val.upper() in kws:
            self.next()
            return val.upper()
        return None

    def expect_kw(self, *kws: str) -> str:
        got = self.accept_kw(*kws)
        if not got:
            raise SpParseError(f"expected {'/'.join(kws)}, got {self.peek()[1]!r}")
        return got

    def accept_punct(self, p: str) -> bool:
        kind, val = self.peek()
        if (kind in ("punct", "op")) and val == p:
            self.next()
            return True
        return False

    def expect_punct(self, p: str) -> None:
        if not self.accept_punct(p):
            raise SpParseError(f"expected {p!r}, got {self.peek()[1]!r}")

    def ident(self) -> str:
        kind, val = self.next()
        if kind != "ident":
            raise SpParseError(f"expected identifier, got {val!r}")
        return val

    def string(self) -> str:
        kind, val = self.next()
        if kind != "string":
            raise SpParseError(f"expected string, got {val!r}")
        return val[1:-1].replace("''", "'")

    # -- entry
    def parse(self):
        if self.accept_kw("CREATE"):
            what = self.expect_kw("STREAM", "SNAPSHOT")
            name = self.ident()
            props: dict[str, str] = {}
            if self.accept_kw("WITH"):
                self.expect_punct("(")
                while True:
                    k = self.ident()
                    self.expect_punct("=")
                    props[k.lower()] = self.string()
                    if not self.accept_punct(","):
                        break
                self.expect_punct(")")
            self.expect_kw("AS")
            sel = self.select()
            self.end()
            cls = CreateStream if what == "STREAM" else CreateSnapshot
            return cls(name=name, props=props, select=sel)
        if self.accept_kw("FLUSH"):
            self.expect_kw("SNAPSHOT")
            name = self.ident()
            self.end()
            return FlushSnapshot(name)
        sel = self.select()
        self.end()
        return sel

    def end(self) -> None:
        self.accept_punct(";")
        if self.peek()[0] != "eof":
            raise SpParseError(f"trailing input: {self.peek()[1]!r}")

    # -- select
    def select(self) -> Select:
        self.expect_kw("SELECT")
        keys = self.key_list()
        self.expect_kw("FROM")
        src_type = self.expect_kw("STREAM", "TAG")
        self.expect_punct(":")
        if src_type == "TAG":
            kind, val = self.peek()
            source = self.string() if kind == "string" else self.ident()
        else:
            source = self.ident()
        where = None
        if self.accept_kw("WHERE"):
            where = self.condition()
        window = None
        if self.accept_kw("WINDOW"):
            window = self.window()
        group_by: list[Subkey] = []
        if self.accept_kw("GROUP"):
            self.expect_kw("BY")
            group_by.append(self.subkey())
            while self.accept_punct(","):
                group_by.append(self.subkey())
        limit = None
        if self.accept_kw("LIMIT"):
            kind, val = self.next()
            if kind != "int":
                raise SpParseError("LIMIT expects an integer")
            limit = int(val)
        return Select(keys, src_type, source, where, window, group_by, limit)

    _UNIT_SEC = {"SECOND": 1, "MINUTE": 60, "HOUR": 3600}

    def window(self) -> Window:
        kind = self.expect_kw("TUMBLING", "HOPPING")
        self.expect_punct("(")
        size = self._duration()
        advance = None
        if kind == "HOPPING":
            self.expect_punct(",")
            self.expect_kw("ADVANCE")
            self.expect_kw("BY")
            advance = self._duration()
        self.expect_punct(")")
        return Window(kind, size, advance)

    def _duration(self) -> int:
        kind, val = self.next()
        if kind != "int":
            raise SpParseError("window size expects an integer")
        unit = self.expect_kw("SECOND", "MINUTE", "HOUR")
        return int(val) * self._UNIT_SEC[unit]

    def key_list(self) -> list[Key]:
        keys = [self.key()]
        while self.accept_punct(","):
            keys.append(self.key())
        return keys

    def key(self) -> Key:
        if self.accept_punct("*"):
            return Key(star=True)
        kind, val = self.peek()
        if kind != "ident":
            raise SpParseError(f"expected key, got {val!r}")
        name = self.ident()
        upper = name.upper()
        if upper in AGG_FUNCS | SCALAR_FUNCS | TS_FUNCS and self.peek()[1] == "(":
            self.expect_punct("(")
            k = Key(func=upper)
            if upper in AGG_FUNCS:
                if self.accept_punct("*"):
                    if upper != "COUNT":
                        raise SpParseError(f"{upper}(*) not allowed")
                else:
                    k.key = self.subkey()
            elif upper in TS_FUNCS:
                k.key = self.subkey()  # x
                self.expect_punct(",")
                k.args.append(self.subkey())  # y
                while self.accept_punct(","):
                    kind, val = self.next()
                    if kind not in ("int", "float"):
                        raise SpParseError("numeric arg expected")
                    k.args.append(float(val) if kind == "float" else int(val))
            self.expect_punct(")")
            k.alias = self.maybe_alias()
            return k
        sub = self.subkey(first=name)
        return Key(key=sub, alias=self.maybe_alias())

    def maybe_alias(self) -> str | None:
        if self.accept_kw("AS"):
            return self.ident()
        return None

    def subkey(self, first: str | None = None) -> Subkey:
        name = first if first is not None else self.ident()
        path: list[str] = []
        while self.accept_punct("["):
            path.append(self.string())
            self.expect_punct("]")
        return Subkey(name, path)

    # -- conditions (precedence: OR < AND < NOT < atom)
    def condition(self):
        return self.or_expr()

    def or_expr(self):
        node = self.and_expr()
        while self.accept_kw("OR"):
            right = self.and_expr()
            node = BoolOp("OR", [node, right])
        return node

    def and_expr(self):
        node = self.not_expr()
        while self.accept_kw("AND"):
            right = self.not_expr()
            node = BoolOp("AND", [node, right])
        return node

    def not_expr(self):
        if self.accept_kw("NOT"):
            return BoolOp("NOT", [self.not_expr()])
        return self.atom()

    def atom(self):
        if self.accept_punct("("):
            node = self.condition()
            self.expect_punct(")")
            return node
        kind, val = self.peek()
        if kind == "record":
            self.next()
            self.expect_punct("(")
            sub = self.subkey()
            self.expect_punct(")")
            return RecordContains(sub)
        left = self.operand()
        kind, val = self.peek()
        if kind == "ident" and val.upper() == "IS":
            self.next()
            negated = bool(self.accept_kw("NOT"))
            self.expect_kw("NULL")
            if not isinstance(left, Subkey):
                raise SpParseError("IS NULL applies to keys")
            return IsNull(left, negated)
        if kind == "op":
            op = self.next()[1]
            if op == "<>":
                op = "!="
            right = self.operand()
            return Comparison(op, left, right)
        if isinstance(left, Subkey):
            # bare key used as boolean (reference requires explicit ops)
            raise SpParseError(f"expected operator after {left.name!r}")
        return left

    def operand(self):
        kind, val = self.peek()
        if kind == "string":
            return Literal(self.string())
        if kind == "float":
            self.next()
            return Literal(float(val))
        if kind == "int":
            self.next()
            return Literal(int(val))
        if kind == "ident":
            if val.upper() in ("TRUE", "FALSE"):
                self.next()
                return Literal(val.upper() == "TRUE")
            if val.upper() == "NULL":
                self.next()
                return Literal(None)
            return self.subkey()
        raise SpParseError(f"bad operand {val!r}")


def parse(sql: str):
    return Parser(sql).parse()
