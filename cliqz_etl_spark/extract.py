"""Declarative extraction compiler — the rebuild of the reference's
``ColumnConfig`` / ``DataFrameConfig`` spec system
(/root/reference/cliqz_etl/testpilot_data.py:10-31).

The reference's spec drove a row-at-a-time Python pipeline:
``get_pings_properties`` flattened nested dicts per ping, then per-cell
cleaning functions ran under try/except->NULL (testpilot_data.py:41-66).
Here the same spec compiles to a list of ``Column`` expressions evaluated
in one ``df.select(...)`` — nested-path projection becomes struct/map/array
access (column-pruned into the scan), and error-tolerant cleaning becomes
``try_cast``/``try_*`` expressions, with a guarded Arrow UDF only as the
escape hatch for genuinely opaque Python transforms.

Semantics preserved from the reference:
- every output column nullable (testpilot_data.py:24);
- a failing transform yields NULL for that cell, never a failed row/job
  (build_cell, testpilot_data.py:53-63);
- a ping_filter predicate applied before projection (testpilot_data.py:41-42).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field
from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import DataType


def path_col(path: str, sep: str = "/") -> Column:
    """Reference-style '/'-separated nested path -> Column.

    ``"environment/settings/locale"`` addresses struct fields, map keys and
    array indices uniformly via getItem (the columnar twin of
    get_pings_properties' dict-walking). The path must exist in the schema
    — at a true schemaless boundary, read with a permissive schema first.
    """
    head, *rest = path.split(sep)
    return reduce(lambda c, seg: c.getItem(int(seg) if seg.isdigit() else seg),
                  rest, F.col(head))


def guarded_udf(fn: Callable, return_type: DataType | str) -> Callable[[Column], Column]:
    """Escape hatch: wrap an arbitrary Python transform with the
    reference's exception->NULL cell semantics. Only for transforms no
    built-in expression can express — it leaves whole-stage codegen."""
    def wrapper(value):
        try:
            return fn(value)
        except Exception:
            return None

    udf = F.udf(wrapper, return_type)

    def apply(col: Column) -> Column:
        return udf(col)

    return apply


@dataclass(frozen=True)
class ColumnSpec:
    """One output column: source path/expression, optional columnar
    transform, optional target type applied with try_cast (error->NULL)."""

    name: str
    source: str | Column
    transform: Callable[[Column], Column] | None = None
    dtype: str | None = None

    def compile(self) -> Column:
        col = path_col(self.source) if isinstance(self.source, str) else self.source
        if self.transform is not None:
            col = self.transform(col)
        if self.dtype is not None:
            col = col.try_cast(self.dtype)
        return col.alias(self.name)


@dataclass(frozen=True)
class ExtractConfig:
    """A full extraction: the rebuild of DataFrameConfig
    (testpilot_data.py:17-31) plus the post-projection filter the
    reference applied ad hoc (:138, :167)."""

    columns: list[ColumnSpec]
    row_filter: Column | None = None      # pre-projection (ping_filter)
    post_filter: Column | None = None     # post-projection (SQL-string filter)
    extra: dict = field(default_factory=dict)

    def names(self) -> list[str]:
        return [c.name for c in self.columns]

    def apply(self, df: DataFrame) -> DataFrame:
        """filter -> single select -> filter. One logical plan; Catalyst
        pushes predicates and prunes the scan to the referenced paths."""
        out = df
        if self.row_filter is not None:
            out = out.where(self.row_filter)
        out = out.select(*[c.compile() for c in self.columns])
        if self.post_filter is not None:
            out = out.where(self.post_filter)
        return out
