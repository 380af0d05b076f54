"""logzilla_spark — a PySpark-native log/telemetry analytics engine.

A from-scratch reimagining of the capabilities of the `thisisjab/logzilla`
reference (a Go file-tail -> parse -> buffer -> ClickHouse pipeline plus a
filter-tree query API) as an idiomatic Spark DataFrame engine:

- parse:    vectorized grok/regex/JSON parsing of log lines embedded in
            Common-Crawl-style web pages (Arrow pandas UDF + a pure
            built-in-functions twin used for differential testing)
- enrich:   broadcast-hash-join lookups against lang/severity dimensions
- route:    fan-out of parsed records to per-category sink tables
            (snapshot-committed, Iceberg-style)
- aggregate: windowed group-by counts per sink, with salted two-phase
            aggregation for hot keys
- query:    the reference's filter-tree search API (AND/OR/NOT trees,
            9 comparison operators, whitelisted sort, top-k limit)
            compiled to Catalyst Column expressions
- extras:   dedup (exact / MinHash-LSH / SimHash / n-gram Jaccard),
            similarity search over embeddings, text-quality analysis,
            multimodal binary-column plumbing

Everything is DataFrame/SQL-first: Catalyst plans the execution, Python
crosses into the JVM only through Arrow batches.
"""

__version__ = "0.1.0"
