"""Multi-line record reassembly (stack traces, wrapped lines).

The reference's source splits strictly on newline (source/file.go:
101-117), so a Java stack trace becomes N broken records — a classic
log-pipeline gap this operator closes. A line that does NOT match the
record-start pattern is a continuation of the record above it
(Filebeat/Fluentd ``multiline`` semantics, re-expressed relationally):

    is_start  = line rlike start_pattern
    rec_no    = running sum of is_start per url, in line order
    record    = lines of each (url, rec_no) island, newline-joined

Plan shape: one shuffle on url (the window partition), then a
same-keyed groupBy that reuses the partitioning — Catalyst plans a
single Exchange for both. Leading continuations with no start line
(rec_no = 0) stay a record of their own rather than being dropped —
the same never-drop tolerance as the parse stage.

The DuckDB twin is ``oracle.multiline_sql`` (gaps-and-islands with
``string_agg ... ORDER BY pos``); differential-tested per the repo's
oracle gate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

# a record starts with JSON ('{') or a digit (ip / timestamp); anything
# else ("  at com.example...", "garbage ...") continues the record above
DEFAULT_START_RE = r"^\s*\{|^[0-9]"


def reassemble_multiline(
    lines: DataFrame, start_pattern: str = DEFAULT_START_RE
) -> DataFrame:
    """lines(url, pos, line, ...) -> one row per reassembled record.

    Output: url, rec_no, pos (first line's), n_lines, record.
    """
    w = (
        Window.partitionBy("url")
        .orderBy("pos")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    flagged = lines.withColumn(
        "rec_no", F.sum(F.col("line").rlike(start_pattern).cast("int")).over(w)
    )
    return (
        flagged.groupBy("url", "rec_no")
        .agg(
            F.min("pos").alias("pos"),
            F.count(F.lit(1)).alias("n_lines"),
            F.concat_ws(
                "\n",
                F.expr(
                    "transform(array_sort(collect_list(struct(pos, line))), x -> x.line)"
                ),
            ).alias("record"),
        )
    )
