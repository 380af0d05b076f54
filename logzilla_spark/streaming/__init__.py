from .alerts import (
    AlertRule,
    absence_alert_batch,
    alert_batch,
    evaluate_alerts,
    start_absence_alert_stream,
    start_alert_stream,
    start_logfile_alert_stream,
)
from .quota import (
    quota_batch,
    start_quota_stream,
)
from .metrics import (
    read_metric_series,
    start_metrics_stream,
    upsert_metrics_batch,
)
from .recordings import (
    RecordingRule,
    read_recording,
    record_rule_window,
    recording_rules_from_config,
)
from .sketch import read_hll_distinct, start_hll_stream, upsert_hll_batch
from .templates import (
    read_templates,
    start_templates_stream,
    upsert_templates_batch,
)
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
    "AlertRule",
    "evaluate_alerts",
    "absence_alert_batch",
    "alert_batch",
    "start_absence_alert_stream",
    "start_alert_stream",
    "start_logfile_alert_stream",
    "quota_batch",
    "start_quota_stream",
    "read_templates",
    "start_templates_stream",
    "upsert_templates_batch",
    "read_metric_series",
    "start_metrics_stream",
    "upsert_metrics_batch",
    "RecordingRule",
    "record_rule_window",
    "read_recording",
    "recording_rules_from_config",
]
