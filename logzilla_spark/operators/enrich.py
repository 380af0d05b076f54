"""G2 — broadcast-hash-join enrichment against dimension tables.

The reference stores `level` as a ClickHouse Enum8 and `source` as a
plain tag; the graft replaces the enum with a severity dimension and
adds a language dimension (SURVEY.md §2.5 G2, FIXTURES.md §2). Both
dims are tiny, so the joins are explicit ``F.broadcast`` hash joins —
no shuffle of the fact side, which is the only plan that survives at
100 TB (a sort-merge join here would shuffle the whole record stream).

Left joins: pages.lang values missing from dim_lang produce NULL
lang_name/lang_family (tested via the two unmatched dim codes).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def enrich_records(records: DataFrame, dim_lang: DataFrame, dim_severity: DataFrame) -> DataFrame:
    """records + lang dim + severity dim via broadcast hash joins."""
    return records.join(
        F.broadcast(dim_lang), on="lang", how="left"
    ).join(F.broadcast(dim_severity), on="level", how="left")
