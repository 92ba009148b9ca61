"""SQL-dump source — SURVEY.md §2.A (src_sqldump_parse).

The reference parses dumps with regexes (CREATE TABLE name at
data_to_orc_converter.sh:329, INSERT rows at sh:343/353/357, naive
``split(',')`` + quote-strip at sh:360-363) and loads everything as an
untyped, unnamed DataFrame (sh:382). That corrupts any string literal
containing a comma, parenthesis, or semicolon, and throws away the
DDL's column names and types.

This module is the deliberate divergence (SURVEY.md §7): a real
tokenizer that is quote-, escape-, and comment-aware, plus a
CREATE TABLE reader that yields a typed Spark schema. Statements are
split in a streaming pass (bounded memory — the reference reads the
whole dump twice, sh:325/371); parsed rows are batched into Arrow-
backed DataFrames, so the dump's rows are distributed the moment they
leave the parser.

Scale posture: a .sql dump is an inherently serial, single-machine
ingest format — the parse is driver-side by design, but memory is
O(batch), and everything downstream (type casting, ORC write) runs on
executors. For 100 TB ingest use the JDBC or columnar sources.
"""

from __future__ import annotations

import re
from collections.abc import Iterator
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

# ---------------------------------------------------------------------------
# MySQL type name → Spark type (per the documented mapping,
# reference README.md:253-259: INT→LONG, VARCHAR→STRING,
# DECIMAL→DECIMAL, DATE→DATE, DATETIME→TIMESTAMP)
# ---------------------------------------------------------------------------

_DECIMAL_RE = re.compile(r"(?:DECIMAL|NUMERIC)\s*\(\s*(\d+)\s*(?:,\s*(\d+))?\s*\)", re.I)


def mysql_type_to_spark(type_sql: str) -> T.DataType:
    t = type_sql.strip().upper()
    m = _DECIMAL_RE.match(t)
    if m:
        return T.DecimalType(int(m.group(1)), int(m.group(2) or 0))
    base = re.split(r"[(\s]", t, 1)[0]
    if base in ("TINYINT", "SMALLINT", "MEDIUMINT", "INT", "INTEGER", "BIGINT"):
        return T.LongType()
    if base in ("FLOAT", "DOUBLE", "REAL"):
        return T.DoubleType()
    if base in ("BOOL", "BOOLEAN"):
        return T.BooleanType()
    if base == "DATE":
        return T.DateType()
    if base in ("DATETIME", "TIMESTAMP"):
        return T.TimestampType()
    if base in ("BLOB", "BINARY", "VARBINARY", "LONGBLOB", "MEDIUMBLOB", "TINYBLOB"):
        return T.BinaryType()
    # VARCHAR/CHAR/TEXT/ENUM/SET/JSON/... — string is the safe default
    return T.StringType()


# ---------------------------------------------------------------------------
# Streaming statement splitter (quote/escape/comment aware)
# ---------------------------------------------------------------------------


class StatementSplitter:
    """Incremental quote/escape/comment-aware statement splitter.

    ``feed(text)`` returns the statements completed (by a top-level
    ``;``) within the text fed so far; ``pending`` is the unterminated
    tail still buffered. State persists across ``feed`` calls, so a
    caller can stream a file line-by-line without re-scanning — the
    distributed dump reader uses this to handle multiple statements on
    one physical line (and statements spanning several lines) without
    dropping or duplicating any.
    """

    def __init__(self) -> None:
        self._buf: list[str] = []
        self._state: str | None = None  # None | "'" | '"' | '`' | '--' | '/*'
        self._escape = False
        self._prev = ""

    def feed(self, text: str) -> list[str]:
        out: list[str] = []
        buf, state, escape, prev = self._buf, self._state, self._escape, self._prev
        for ch in text:
            if state in ("'", '"', "`"):
                buf.append(ch)
                if escape:
                    escape = False
                elif ch == "\\" and state in ("'", '"'):
                    escape = True
                elif ch == state:
                    state = None
            elif state == "--":
                if ch == "\n":
                    state = None
                    buf.append(ch)
            elif state == "/*":
                if prev == "*" and ch == "/":
                    state = None
            elif ch == ";":
                stmt = "".join(buf).strip()
                buf.clear()
                if stmt:
                    out.append(stmt)
            else:
                if ch in ("'", '"', "`"):
                    state = ch
                    buf.append(ch)
                elif prev == "-" and ch == "-" and state is None:
                    state = "--"
                    if buf and buf[-1] == "-":
                        buf.pop()
                elif prev == "/" and ch == "*":
                    state = "/*"
                    if buf and buf[-1] == "/":
                        buf.pop()
                else:
                    buf.append(ch)
            prev = ch
        self._state, self._escape, self._prev = state, escape, prev
        return out

    @property
    def pending(self) -> str:
        return "".join(self._buf).strip()


def split_statements(chunks: Iterator[str]) -> Iterator[str]:
    """Yield complete SQL statements from a stream of text chunks.
    Semicolons inside 'single', "double", `backtick` quotes (with
    backslash and doubled-quote escapes), -- line comments, and
    /* block comments */ do NOT terminate a statement — exactly the
    cases the reference's regex splitter corrupts."""
    sp = StatementSplitter()
    for chunk in chunks:
        yield from sp.feed(chunk)
    tail = sp.pending
    if tail:
        yield tail


def _file_chunks(path: str, size: int = 1 << 20) -> Iterator[str]:
    with open(path, encoding="utf-8", errors="replace") as f:
        while True:
            chunk = f.read(size)
            if not chunk:
                return
            yield chunk


# ---------------------------------------------------------------------------
# CREATE TABLE / INSERT parsing
# ---------------------------------------------------------------------------

_CREATE_RE = re.compile(r"^\s*CREATE\s+TABLE\s+(?:IF\s+NOT\s+EXISTS\s+)?[`\"]?(\w+)[`\"]?\s*\(", re.I | re.S)
_INSERT_RE = re.compile(
    r"^\s*INSERT\s+(?:IGNORE\s+)?INTO\s+[`\"]?(\w+)[`\"]?\s*(\([^)]*\))?\s*VALUES\s*",
    re.I | re.S,
)
_CONSTRAINT_PREFIX = re.compile(
    r"^(PRIMARY|UNIQUE|KEY|INDEX|CONSTRAINT|FOREIGN|FULLTEXT|SPATIAL|CHECK)\b", re.I
)


@dataclass
class TableDef:
    name: str
    columns: list[tuple[str, T.DataType]] = field(default_factory=list)

    @property
    def schema(self) -> T.StructType:
        return T.StructType(
            [T.StructField(c, t, True) for c, t in self.columns]
        )


def _split_top_level(s: str, sep: str = ",") -> list[str]:
    """Split on ``sep`` ignoring separators nested in parens/quotes."""
    parts, depth, cur, state, escape = [], 0, [], None, False
    for ch in s:
        if state:
            cur.append(ch)
            if escape:
                escape = False
            elif ch == "\\" and state in ("'", '"'):
                escape = True
            elif ch == state:
                state = None
        elif ch in ("'", '"', "`"):
            state = ch
            cur.append(ch)
        elif ch == "(":
            depth += 1
            cur.append(ch)
        elif ch == ")":
            depth -= 1
            cur.append(ch)
        elif ch == sep and depth == 0:
            parts.append("".join(cur))
            cur = []
        else:
            cur.append(ch)
    if cur:
        parts.append("".join(cur))
    return parts


def parse_create_table(stmt: str) -> TableDef | None:
    m = _CREATE_RE.match(stmt)
    if not m:
        return None
    body_start = stmt.index("(", m.start()) + 1
    # match the closing paren of the column list
    depth, end = 1, None
    state = None
    for i in range(body_start, len(stmt)):
        ch = stmt[i]
        if state:
            if ch == state:
                state = None
        elif ch in ("'", '"', "`"):
            state = ch
        elif ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
            if depth == 0:
                end = i
                break
    body = stmt[body_start:end] if end else stmt[body_start:]
    td = TableDef(m.group(1))
    for coldef in _split_top_level(body):
        coldef = coldef.strip()
        if not coldef or _CONSTRAINT_PREFIX.match(coldef):
            continue
        cm = re.match(r"^[`\"]?(\w+)[`\"]?\s+(.+)$", coldef, re.S)
        if cm:
            td.columns.append((cm.group(1), mysql_type_to_spark(cm.group(2))))
    return td


_ESCAPES = {
    "n": "\n",
    "t": "\t",
    "r": "\r",
    "0": "\x00",
    "b": "\b",
    "Z": "\x1a",
}


def _parse_value(tok: str):
    tok = tok.strip()
    if not tok or tok.upper() == "NULL":
        return None
    if tok[0] in ("'", '"') and tok[-1] == tok[0] and len(tok) >= 2:
        # Single left-to-right scan: backslash escapes and doubled-quote
        # escapes are consumed together, so the output of one rule can
        # never be re-consumed by another ('a\'\'b' is a''b, not a'b —
        # MySQL semantics, where \x for unknown x is x).
        q = tok[0]
        inner = tok[1:-1]
        out: list[str] = []
        i, n = 0, len(inner)
        while i < n:
            ch = inner[i]
            if ch == "\\" and i + 1 < n:
                nxt = inner[i + 1]
                out.append(_ESCAPES.get(nxt, nxt))
                i += 2
            elif ch == q and i + 1 < n and inner[i + 1] == q:
                out.append(q)
                i += 2
            else:
                out.append(ch)
                i += 1
        return "".join(out)
    return tok  # numeric / literal — cast later against the schema


def parse_insert(stmt: str) -> tuple[str, list[str] | None, list[list]] | None:
    """Return (table, explicit columns or None, rows of raw values)."""
    m = _INSERT_RE.match(stmt)
    if not m:
        return None
    table = m.group(1)
    cols = None
    if m.group(2):
        cols = [c.strip().strip('`"') for c in m.group(2)[1:-1].split(",")]
    values_part = stmt[m.end() :].strip()
    # tolerate a statement that still carries its terminator
    if values_part.endswith(";"):
        values_part = values_part[:-1]
    rows = []
    for tup in _split_top_level(values_part):
        tup = tup.strip()
        if not (tup.startswith("(") and tup.endswith(")")):
            continue
        rows.append([_parse_value(v) for v in _split_top_level(tup[1:-1])])
    return table, cols, rows


# ---------------------------------------------------------------------------
# Public API
# ---------------------------------------------------------------------------


def parse_dump(
    spark: SparkSession,
    path: str,
    tables: list[str] | None = None,
    batch_rows: int = 50_000,
) -> dict[str, DataFrame]:
    """Parse a .sql dump into typed DataFrames, one per table.

    Values are materialized as strings and cast to the DDL's types on
    the executors (a narrow, codegen'd projection) — the driver never
    does per-value type conversion. ``tables`` filters which tables to
    load (the reference's table-subset option, sh:332-333)."""
    defs: dict[str, TableDef] = {}
    pending: dict[str, list[list]] = {}
    frames: dict[str, list[DataFrame]] = {}

    def flush(tname: str) -> None:
        rows = pending.get(tname)
        if not rows:
            return
        td = defs[tname]
        raw_schema = T.StructType(
            [T.StructField(c, T.StringType(), True) for c, _ in td.columns]
        )
        width = len(td.columns)
        norm = [r[:width] + [None] * (width - len(r)) for r in rows]
        raw = spark.createDataFrame(norm, raw_schema)
        typed = raw.select(
            *[F.col(c).cast(t).alias(c) for c, t in td.columns]
        )
        frames.setdefault(tname, []).append(typed)
        pending[tname] = []

    for stmt in split_statements(_file_chunks(path)):
        td = parse_create_table(stmt)
        if td is not None:
            if tables is None or td.name in tables:
                defs[td.name] = td
            continue
        ins = parse_insert(stmt)
        if ins is None:
            continue
        tname, cols, rows = ins
        if tname not in defs:
            continue
        if cols:  # reorder/drop to DDL column order
            order = {c: i for i, c in enumerate(cols)}
            full = []
            for r in rows:
                full.append(
                    [
                        r[order[c]] if c in order and order[c] < len(r) else None
                        for c, _ in defs[tname].columns
                    ]
                )
            rows = full
        buf = pending.setdefault(tname, [])
        buf.extend([[None if v is None else str(v) for v in r] for r in rows])
        if len(buf) >= batch_rows:
            flush(tname)

    for tname in list(defs):
        flush(tname)

    out: dict[str, DataFrame] = {}
    for tname, td in defs.items():
        parts = frames.get(tname)
        if parts:
            df = parts[0]
            for p in parts[1:]:
                df = df.unionByName(p)
            out[tname] = df
        else:
            out[tname] = spark.createDataFrame([], td.schema)
    return out


def dump_to_orc(
    spark: SparkSession,
    dump_path: str,
    output_dir: str,
    compression: str = "snappy",
    tables: list[str] | None = None,
    report=None,
) -> dict[str, str]:
    """The reference's EP3 end-to-end (sql_dump_to_orc_converter.py,
    sh:403-415): dump file → typed tables → ORC directory per table.
    ``report`` narrates per-table progress (progress.py)."""
    import os

    from ..progress import write_with_progress
    from ..sinks.orc import write_orc

    written = {}
    parsed = parse_dump(spark, dump_path, tables)
    for i, (name, df) in enumerate(parsed.items(), 1):
        table_dir = os.path.join(output_dir, name)
        write_with_progress(
            spark, df, name, i, len(parsed), report,
            lambda d, out=table_dir: write_orc(d, out, compression=compression),
        )
        written[name] = table_dir
    return written
