"""Block-parallel OSM PBF codec: hand-rolled proto2 subset + vectorized decode kernel.

The wire format (``/root/reference/generate/proto/{fileformat,osmformat}.proto``) is
columnar and delta-compressed per block; each PrimitiveBlock is independently parsable
(``osmformat.proto:39-44``) — the natural Spark partition unit.
"""
