from openstreetmapio_jl_spark.streaming.pipelines import (  # noqa: F401
    read_events_stream,
    run_available_now,
    sessionize_stream,
    tumbling_counts_stream,
)
