from pyogrio_spark.streaming.events import windowed_event_counts, sessionize_events  # noqa: F401
