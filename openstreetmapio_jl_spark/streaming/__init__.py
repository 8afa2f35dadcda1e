from openstreetmapio_jl_spark.streaming.pipelines import (  # noqa: F401
    pip_enrich_stream,
    read_events_stream,
    read_pages_stream,
    run_available_now,
    sessionize_stream,
    tumbling_counts_stream,
)
