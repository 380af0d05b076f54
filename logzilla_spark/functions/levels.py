"""Level normalization (reference: processor/util.go:9-24).

Exact contract: input is lowercased, then only the five exact strings
debug/info/warn/error/fatal map to a level; everything else — including
"warning", "trace", "" — is UNKNOWN. Both a Column expression (JVM-side,
codegen'd) and a pandas/numpy variant (for use inside Arrow UDF batches)
are provided; they must agree byte-for-byte (tested).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F

_LEVEL_MAP = {
    "debug": "DEBUG",
    "info": "INFO",
    "warn": "WARN",
    "error": "ERROR",
    "fatal": "FATAL",
}


def parse_level_col(col: Column | str) -> Column:
    """JVM-side level normalization; whole-stage-codegen friendly."""
    c = F.lower(F.col(col) if isinstance(col, str) else col)
    expr = F.lit("UNKNOWN")
    # build when-chain; order irrelevant (keys disjoint)
    out = None
    for raw, norm in _LEVEL_MAP.items():
        cond = c == raw
        out = F.when(cond, norm) if out is None else out.when(cond, norm)
    return out.otherwise(expr)


def parse_level_pd(s: pd.Series) -> pd.Series:
    """Vectorized pandas variant for use inside Arrow UDFs."""
    return s.fillna("").str.lower().map(_LEVEL_MAP).fillna("UNKNOWN")


def level_sql_case(col_sql: str) -> str:
    """ANSI SQL CASE expression for the DuckDB oracle (same table)."""
    whens = "\n".join(
        f"WHEN lower({col_sql}) = '{raw}' THEN '{norm}'" for raw, norm in _LEVEL_MAP.items()
    )
    return f"CASE {whens} ELSE 'UNKNOWN' END"
