"""Raw log FILES as a source — the reference's primary input (O1).

The reference engine's bread-and-butter source tails plain text log
files (reference: source/file.go:52-126 — open, scan lines, tag with
the file's source name). The engine's other ingestion path here goes
through the pages table; this module reads actual ``*.log``-style text
files into the SAME lines shape, batch and streaming:

- each FILE is read whole (``wholetext``) and split JVM-side, so a
  line's position within its file is deterministic — record ids are
  ``file_url#pos`` exactly like the pages path (no
  monotonically_increasing_id, which is partition-layout-dependent);
- ``url`` = the file's URI, ``warc_ts`` = the file's modification time
  (the deterministic analog of the reference stamping records at read
  time, source/file.go:104-107);
- streaming uses the file stream source: every NEW file in the watched
  directory is picked up by the next micro-batch — which is also the
  rotation story (O5): a rotated-out file is a new path, hence new
  urls, no re-read of the old one (checkpointed file tracking).

Scale notes: wholetext means one task per file — right for log-rotation
corpora (many medium files); a single giant file should go through the
pages/staging path instead, and the docstring of the reader says so
rather than silently degrading. Splitting is split+posexplode, zero
Python, no shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .lines import LINES_COLUMNS

__all__ = ["text_file_lines", "text_file_lines_stream"]


def _to_lines(files: DataFrame, source: str | None) -> DataFrame:
    src = (
        F.lit(source)
        if source is not None
        # default source tag: the file's base name (the reference tags
        # records with the configured source name per file)
        else F.element_at(F.split(F.col("_metadata.file_path"), "/"), -1)
    )
    out = files.select(
        F.col("_metadata.file_path").alias("url"),
        F.col("_metadata.file_modification_time").alias("warc_ts"),
        F.lit(None).cast("string").alias("lang"),
        src.alias("source"),
        # a trailing newline must not fabricate an empty final line
        # (the reference's scanner never yields one); mid-file blank
        # lines are kept — they flow through the chain as 'unparsed',
        # the never-drop contract
        F.posexplode(
            F.split(F.regexp_replace("value", r"\n$", ""), r"\n")
        ).alias("pos", "line"),
    )
    assert tuple(out.columns) == LINES_COLUMNS
    return out


def text_file_lines(
    spark: SparkSession, path: str, source: str | None = None
) -> DataFrame:
    """Batch: every text file under ``path`` -> lines shape."""
    files = spark.read.format("text").option("wholetext", "true").load(path)
    return _to_lines(files, source)


def text_file_lines_stream(
    spark: SparkSession,
    path: str,
    source: str | None = None,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """Streaming: new files under ``path`` arrive as micro-batches —
    the tail-follow loop, file-granular (new file == rotation or a
    closed chunk; the reference's per-line tail maps to this because
    its own flush/commit unit is also a batch, engine/processor.go)."""
    reader = spark.readStream.format("text").option("wholetext", "true")
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", int(max_files_per_trigger))
    return _to_lines(reader.load(path), source)
