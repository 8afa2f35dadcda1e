from openstreetmapio_jl_spark.sinks.pbf_sink import write_bundle_pbf, write_pbf_sharded

__all__ = ["write_bundle_pbf", "write_pbf_sharded"]
