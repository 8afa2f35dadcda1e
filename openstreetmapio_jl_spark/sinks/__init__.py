from openstreetmapio_jl_spark.sinks.pbf_sink import write_bundle_pbf, write_pbf_sharded
from openstreetmapio_jl_spark.sinks.xml_sink import write_bundle_xml, write_xml_sharded

__all__ = [
    "write_bundle_pbf",
    "write_bundle_xml",
    "write_pbf_sharded",
    "write_xml_sharded",
]
