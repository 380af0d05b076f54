from .sketch import read_hll_distinct, start_hll_stream, upsert_hll_batch
from .stream_pipeline import (
    route_batch,
    start_agg_stream,
    start_logfile_routing_stream,
    start_routing_stream,
    stream_pages,
    streaming_windowed_counts,
    upsert_agg_batch,
)

__all__ = [
    "stream_pages",
    "streaming_windowed_counts",
    "start_routing_stream",
    "start_logfile_routing_stream",
    "start_agg_stream",
    "start_hll_stream",
    "route_batch",
    "upsert_agg_batch",
    "upsert_hll_batch",
    "read_hll_distinct",
]
