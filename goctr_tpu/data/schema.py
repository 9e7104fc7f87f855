"""Database schema scanners + row cursors.

Parity with /root/reference/schema/ (TableScanner scan.go:7-10; SQLite
PRAGMA table_info introspection sqlite.go:32-66; MySQL SHOW CREATE TABLE
mysql.go:78-107). SQLite uses the stdlib driver; MySQL is gated on an
optional driver being installed (none is baked into this image).
"""
from __future__ import annotations

import dataclasses
import sqlite3
from typing import Any, Iterator, Optional, Protocol, Sequence


@dataclasses.dataclass
class Column:
    name: str
    type: str
    nullable: bool = True
    primary_key: bool = False
    size: str = ""
    comment: str = ""


class TableScanner(Protocol):
    def get_schema(self, table: str) -> list[Column]: ...

    def scan_rows(self, query: str,
                  params: Sequence[Any] = ()) -> Iterator[tuple]: ...


class SqliteScanner:
    """SQLite schema scanner (reference sqlite.go)."""

    def __init__(self, path: str, read_only: bool = True):
        uri = f"file:{path}?mode=ro" if read_only else path
        self.conn = sqlite3.connect(uri, uri=read_only,
                                    check_same_thread=False)

    def get_schema(self, table: str) -> list[Column]:
        cur = self.conn.execute(f"PRAGMA table_info({table})")
        cols = []
        for _, name, ctype, notnull, _, pk in cur.fetchall():
            cols.append(Column(name=name, type=(ctype or "").upper(),
                               nullable=not notnull, primary_key=bool(pk)))
        if not cols:
            raise ValueError(f"table {table!r} not found")
        return cols

    def tables(self) -> list[str]:
        cur = self.conn.execute(
            "SELECT name FROM sqlite_master WHERE type='table'")
        return [r[0] for r in cur.fetchall()]

    def scan_rows(self, query: str,
                  params: Sequence[Any] = ()) -> Iterator[tuple]:
        cur = self.conn.execute(query, tuple(params))
        while True:
            rows = cur.fetchmany(4096)
            if not rows:
                return
            yield from rows

    def close(self):
        self.conn.close()


class MysqlScanner:
    """MySQL scanner; requires an optional driver (pymysql/mysqlclient)."""

    def __init__(self, dsn: str):
        try:
            import pymysql  # noqa: F401
        except ImportError as e:
            raise ImportError(
                "MySQL support needs pymysql (not bundled); use "
                "SqliteScanner or install a driver") from e
        import pymysql
        self.conn = pymysql.connect(**_parse_mysql_dsn(dsn))

    def get_schema(self, table: str) -> list[Column]:
        with self.conn.cursor() as cur:
            cur.execute(
                "SELECT column_name, data_type, is_nullable, column_key "
                "FROM information_schema.columns WHERE table_name=%s "
                "ORDER BY ordinal_position", (table,))
            cols = [Column(name=r[0], type=r[1].upper(),
                           nullable=r[2] == "YES", primary_key=r[3] == "PRI")
                    for r in cur.fetchall()]
        if not cols:
            raise ValueError(f"table {table!r} not found")
        return cols

    def scan_rows(self, query: str,
                  params: Sequence[Any] = ()) -> Iterator[tuple]:
        with self.conn.cursor() as cur:
            cur.execute(query, tuple(params))
            while True:
                rows = cur.fetchmany(4096)
                if not rows:
                    return
                yield from rows


_CONSTRAINT_PREFIXES = ("PRIMARY KEY", "UNIQUE KEY", "KEY", "INDEX",
                        "CONSTRAINT", "FOREIGN KEY", "FULLTEXT", "SPATIAL",
                        "CHECK")


def parse_mysql_ddl(ddl: str) -> tuple[str, list[Column]]:
    """Parse `SHOW CREATE TABLE` output into (table_name, columns).

    Pure-function twin of the reference's sqlparser-backed ParseMysqlDDL
    (/root/reference/schema/mysql.go:117-151): extracts per-column name,
    base type, declared length/size, COMMENT, NOT NULL, and PRIMARY KEY
    membership. Raises ValueError on non-CREATE statements (ErrNotDDL).
    """
    import re

    text = ddl.strip()
    m = re.match(r"(?is)CREATE\s+(?:TEMPORARY\s+)?TABLE\s+(?:IF\s+NOT\s+"
                 r"EXISTS\s+)?[`\"]?([\w$]+)[`\"]?\s*\(", text)
    if not m:
        raise ValueError("not a CREATE TABLE statement")
    table = m.group(1)
    body_start = m.end() - 1
    # body = balanced (...) after the table name
    depth, end = 0, -1
    for i in range(body_start, len(text)):
        if text[i] == "(":
            depth += 1
        elif text[i] == ")":
            depth -= 1
            if depth == 0:
                end = i
                break
    if end < 0:
        raise ValueError("unbalanced CREATE TABLE body")
    body = text[body_start + 1:end]

    # split on top-level commas only (types like DECIMAL(10,2) nest commas)
    defs, depth, cur = [], 0, []
    for ch in body:
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        if ch == "," and depth == 0:
            defs.append("".join(cur).strip())
            cur = []
        else:
            cur.append(ch)
    if cur and "".join(cur).strip():
        defs.append("".join(cur).strip())

    cols: list[Column] = []
    pk_names: set[str] = set()
    for d in defs:
        upper = d.upper()
        if any(upper.startswith(p) for p in _CONSTRAINT_PREFIXES):
            if upper.startswith("PRIMARY KEY"):
                pk_names = {n.strip(" `\"") for n in
                            re.findall(r"\(([^)]*)\)", d)[0].split(",")} \
                    if "(" in d else set()
            continue
        cm = re.match(r"[`\"]?([\w$]+)[`\"]?\s+([\w]+)(?:\(([^)]*)\))?", d)
        if not cm:
            continue
        name, ctype, size = cm.group(1), cm.group(2).lower(), cm.group(3) or ""
        comment_m = re.search(r"(?i)COMMENT\s+'((?:[^']|'')*)'", d)
        cols.append(Column(
            name=name, type=ctype,
            nullable="NOT NULL" not in upper,
            primary_key="PRIMARY KEY" in upper,
            size=size.strip(),
            comment=comment_m.group(1).replace("''", "'") if comment_m
            else ""))
    for c in cols:
        if c.name in pk_names:
            c.primary_key = True
    if not cols:
        raise ValueError("CREATE TABLE with no parseable columns")
    return table, cols


def _parse_mysql_dsn(dsn: str) -> dict:
    """user:pass@host:port/dbname (reference Go DSN style)."""
    creds, _, rest = dsn.rpartition("@")
    user, _, password = creds.partition(":")
    hostport, _, db = rest.partition("/")
    host, _, port = hostport.partition(":")
    return {"user": user or "root", "password": password,
            "host": host or "localhost", "port": int(port or 3306),
            "database": db}
