"""Rule layer: table / row / column selection rules (SURVEY.md §2.2).

Reference semantics (documented at config/application.yml:24-100,
parsed by datachecker-check/.../modules/rule/RuleParser.java:42-70):

* **TABLE rules** — regex white/black lists of table names; the white
  list wins when both are set (P5).
* **ROW rules** — per-table ``"offset,count"`` → ``order by pk asc
  limit offset,count`` (P4; ConditionLimit.java).
* **COLUMN rules** — include/exclude column lists, primary key always
  retained (P1; SelectSqlBuilder.java:54-120).
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


@dataclass
class TableRules:
    white: list[str] | None = None  # regex list; wins over black
    black: list[str] | None = None

    def select_tables(self, names: list[str]) -> list[str]:
        if self.white:
            pats = [re.compile(p) for p in self.white]
            return [n for n in names if any(p.fullmatch(n) for p in pats)]
        if self.black:
            pats = [re.compile(p) for p in self.black]
            return [n for n in names if not any(p.fullmatch(n) for p in pats)]
        return list(names)


@dataclass
class RowRule:
    """``limit offset,count`` over PK order — the reference applies it
    in SQL; here it's offset+limit over an ordered frame. NOTE: a
    global order-by is inherently a scale smell; the reference uses it
    only to spot-check table prefixes, and so do we."""

    offset: int
    count: int

    @classmethod
    def parse(cls, text: str) -> "RowRule":
        off, cnt = (int(x) for x in text.split(","))
        return cls(off, cnt)

    def apply(self, df: DataFrame, pk_cols: list[str]) -> DataFrame:
        return df.orderBy(*[F.col(c).asc() for c in pk_cols]).offset(self.offset).limit(self.count)


@dataclass
class ColumnRule:
    """include xor exclude column name list; PK columns always kept."""

    include: list[str] | None = None
    exclude: list[str] | None = None

    def apply(self, df: DataFrame, pk_cols: list[str]) -> DataFrame:
        names = [f.name for f in df.schema.fields]
        if self.include is not None:
            keep = [n for n in names if n in set(self.include) | set(pk_cols)]
        elif self.exclude is not None:
            keep = [n for n in names if n not in set(self.exclude) or n in pk_cols]
        else:
            keep = names
        return df.select(*keep)
