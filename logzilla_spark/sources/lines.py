"""The engine's lines-shape contract, in ONE place.

Every source (file explode, Kafka, TCP, UDP, Redis) must emit the same
six columns before entering the parser chain:

    url string, warc_ts timestamp, lang string, source string,
    pos long/int, line string

Each network source previously restated this select by hand; a future
contract change (new column, a lang-derivation rule) then had to land
in every copy and a missed one only failed downstream in
``records_from_lines``. The per-source parts stay with the source (url
layout, identity/pos semantics — they ARE the source's contract); only
the column frame is shared here.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# THE column contract, single definition. lines_shape emits exactly
# these; explode_lines (operators/parse.py) and the Kafka mapping
# validate against it.
LINES_COLUMNS = ("url", "warc_ts", "lang", "source", "pos", "line")


def lines_shape(
    df: DataFrame,
    url: Column,
    warc_ts: Column,
    source: Column | str,
    pos: Column,
    line: Column,
    lang: Column | None = None,
) -> DataFrame:
    """Project a source frame to the engine's lines shape."""
    src = F.lit(source) if isinstance(source, str) else source
    out = df.select(
        url.alias("url"),
        warc_ts.alias("warc_ts"),
        (lang if lang is not None else F.lit(None).cast("string")).alias("lang"),
        src.alias("source"),
        pos.alias("pos"),
        line.alias("line"),
    )
    assert tuple(out.columns) == LINES_COLUMNS
    return out
