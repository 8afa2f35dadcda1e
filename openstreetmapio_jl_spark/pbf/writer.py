"""OSM PBF encoder — fixture generation and a ``write_pbf`` sink.

Produces files byte-compatible with the wire format the reference reads
(``/root/reference/generate/proto/{fileformat,osmformat}.proto``): zlib-compressed
blobs with correct ``raw_size``, DenseNodes with delta+zigzag id/lat/lon and sentinel
``keys_vals``, delta-coded way refs / relation memids, optional DenseInfo.

The reference has no write path at all (sinks: in-memory dicts only — SURVEY.md §2
Table B "Scans/sources"); this is new engine surface.
"""

from __future__ import annotations

from openstreetmapio_jl_spark.pbf import blocks, proto

GRANULARITY = 100
DATE_GRANULARITY = 1000


class StringTableBuilder:
    """Index 0 reserved blank (osmformat.proto:129-137)."""

    def __init__(self) -> None:
        self._index: dict[str, int] = {"": 0}
        self.strings: list[str] = [""]

    def sid(self, s: str) -> int:
        i = self._index.get(s)
        if i is None:
            i = len(self.strings)
            self._index[s] = i
            self.strings.append(s)
        return i

    def encode(self) -> bytes:
        return b"".join(proto.field_bytes(1, s.encode("utf-8")) for s in self.strings)


def _coord_raw(deg: float, offset: int = 0, granularity: int = GRANULARITY) -> int:
    return round((deg * 1e9 - offset) / granularity)


def _encode_info(info: dict, st: StringTableBuilder) -> bytes:
    out = b""
    if info.get("version") is not None:
        out += proto.field_varint(1, info["version"])
    if info.get("timestamp") is not None:  # epoch seconds → date_granularity units
        out += proto.field_varint(2, int(info["timestamp"] * 1000 / DATE_GRANULARITY))
    if info.get("changeset") is not None:
        out += proto.field_varint(3, info["changeset"])
    if info.get("uid") is not None:
        out += proto.field_varint(4, info["uid"])
    if info.get("user") is not None:
        # reference reads user_sid 1-based (src/load_pbf.jl:469-474): python st[sid-1]
        out += proto.field_varint(5, st.sid(info["user"]) + 1)
    if info.get("visible") is not None:
        out += proto.field_varint(6, 1 if info["visible"] else 0)
    return out


def encode_header_block(meta: dict) -> bytes:
    out = b""
    bbox = meta.get("bbox")
    if bbox:
        bb = (
            proto.field_varint(1, proto.zigzag_encode(int(bbox["left_lon"] * 1e9)))
            + proto.field_varint(2, proto.zigzag_encode(int(bbox["right_lon"] * 1e9)))
            + proto.field_varint(3, proto.zigzag_encode(int(bbox["top_lat"] * 1e9)))
            + proto.field_varint(4, proto.zigzag_encode(int(bbox["bottom_lat"] * 1e9)))
        )
        out += proto.field_bytes(1, bb)
    for feat in meta.get("required_features", ["OsmSchema-V0.6", "DenseNodes"]):
        out += proto.field_string(4, feat)
    for feat in meta.get("optional_features", []):
        out += proto.field_string(5, feat)
    if meta.get("writingprogram"):
        out += proto.field_string(16, meta["writingprogram"])
    if meta.get("source"):
        out += proto.field_string(17, meta["source"])
    if meta.get("osmosis_replication_timestamp"):
        out += proto.field_varint(32, meta["osmosis_replication_timestamp"])
    if meta.get("osmosis_replication_sequence_number"):
        out += proto.field_varint(33, meta["osmosis_replication_sequence_number"])
    if meta.get("osmosis_replication_base_url"):
        out += proto.field_string(34, meta["osmosis_replication_base_url"])
    return out


def encode_dense_nodes(nodes: list[dict], st: StringTableBuilder, *, with_info: bool) -> bytes:
    """nodes: [{id, lat, lon, tags: dict|None, info: dict|None}] — sorted by caller."""
    ids = proto.delta_encode([n["id"] for n in nodes])
    lats = proto.delta_encode([_coord_raw(n["lat"]) for n in nodes])
    lons = proto.delta_encode([_coord_raw(n["lon"]) for n in nodes])
    keys_vals: list[int] = []
    for n in nodes:
        for k, v in (n.get("tags") or {}).items():
            keys_vals.append(st.sid(k))
            keys_vals.append(st.sid(v))
        keys_vals.append(0)
    dense = proto.packed_varints(1, ids, zigzag=True)
    if with_info and any(n.get("info") for n in nodes):
        infos = [n.get("info") or {} for n in nodes]
        versions = [i.get("version", -1) if i.get("version") is not None else -1 for i in infos]
        ts = proto.delta_encode(
            [int((i.get("timestamp") or 0) * 1000 / DATE_GRANULARITY) for i in infos]
        )
        cs = proto.delta_encode([i.get("changeset") or 0 for i in infos])
        uids = proto.delta_encode([i.get("uid") or 0 for i in infos])
        # dense user lookup is st[sid] in Julia (src/load_pbf.jl:773-778) ⇒ py st[sid-1]
        usids = proto.delta_encode(
            [st.sid(i["user"]) + 1 if i.get("user") is not None else 0 for i in infos]
        )
        vis = [1 if i.get("visible") else 0 for i in infos]
        di = (
            proto.packed_varints(1, versions)
            + proto.packed_varints(2, ts, zigzag=True)
            + proto.packed_varints(3, cs, zigzag=True)
            + proto.packed_varints(4, uids, zigzag=True)
            + proto.packed_varints(5, usids, zigzag=True)
            + proto.packed_varints(6, vis)
        )
        dense += proto.field_bytes(5, di)
    dense += proto.packed_varints(8, lats, zigzag=True)
    dense += proto.packed_varints(9, lons, zigzag=True)
    dense += proto.packed_varints(10, keys_vals)
    return proto.field_bytes(2, dense)  # PrimitiveGroup.dense = 2


def encode_regular_node(n: dict, st: StringTableBuilder) -> bytes:
    tags = n.get("tags") or {}
    msg = proto.field_varint(1, proto.zigzag_encode(n["id"]))
    if tags:
        msg += proto.packed_varints(2, [st.sid(k) for k in tags])
        msg += proto.packed_varints(3, [st.sid(v) for v in tags.values()])
    if n.get("info"):
        msg += proto.field_bytes(4, _encode_info(n["info"], st))
    msg += proto.field_varint(8, proto.zigzag_encode(_coord_raw(n["lat"])))
    msg += proto.field_varint(9, proto.zigzag_encode(_coord_raw(n["lon"])))
    return proto.field_bytes(1, msg)  # PrimitiveGroup.nodes = 1


def encode_way(w: dict, st: StringTableBuilder) -> bytes:
    tags = w.get("tags") or {}
    msg = proto.field_varint(1, w["id"])
    if tags:
        msg += proto.packed_varints(2, [st.sid(k) for k in tags])
        msg += proto.packed_varints(3, [st.sid(v) for v in tags.values()])
    if w.get("info"):
        msg += proto.field_bytes(4, _encode_info(w["info"], st))
    msg += proto.packed_varints(8, proto.delta_encode(w["refs"]), zigzag=True)
    if w.get("positions"):
        lats = proto.delta_encode([_coord_raw(p[0]) for p in w["positions"]])
        lons = proto.delta_encode([_coord_raw(p[1]) for p in w["positions"]])
        msg += proto.packed_varints(9, lats, zigzag=True)
        msg += proto.packed_varints(10, lons, zigzag=True)
    return proto.field_bytes(3, msg)  # PrimitiveGroup.ways = 3


_TYPE_ENUM = {"node": 0, "way": 1, "relation": 2}


def encode_relation(r: dict, st: StringTableBuilder) -> bytes:
    tags = r.get("tags") or {}
    msg = proto.field_varint(1, r["id"])
    if tags:
        msg += proto.packed_varints(2, [st.sid(k) for k in tags])
        msg += proto.packed_varints(3, [st.sid(v) for v in tags.values()])
    if r.get("info"):
        msg += proto.field_bytes(4, _encode_info(r["info"], st))
    members = r.get("members", [])
    msg += proto.packed_varints(8, [st.sid(m["role"]) for m in members])
    msg += proto.packed_varints(
        9, proto.delta_encode([m["ref"] for m in members]), zigzag=True
    )
    msg += proto.packed_varints(10, [_TYPE_ENUM[m["type"]] for m in members])
    return proto.field_bytes(4, msg)  # PrimitiveGroup.relations = 4


def encode_primitive_block(
    nodes: list[dict] | None = None,
    ways: list[dict] | None = None,
    relations: list[dict] | None = None,
    *,
    dense: bool = True,
    with_info: bool = True,
) -> bytes:
    st = StringTableBuilder()
    groups = b""
    if nodes:
        if dense:
            groups += proto.field_bytes(
                2, encode_dense_nodes(nodes, st, with_info=with_info)
            )
        else:
            grp = b"".join(encode_regular_node(n, st) for n in nodes)
            groups += proto.field_bytes(2, grp)
    if ways:
        groups += proto.field_bytes(2, b"".join(encode_way(w, st) for w in ways))
    if relations:
        groups += proto.field_bytes(
            2, b"".join(encode_relation(r, st) for r in relations)
        )
    block = proto.field_bytes(1, st.encode()) + groups
    # granularity/date_granularity/offsets: defaults (100/1000/0) — omit like real writers
    return block


def write_pbf(
    path: str,
    meta: dict,
    nodes: list[dict],
    ways: list[dict],
    relations: list[dict],
    *,
    nodes_per_block: int = 8000,
    dense: bool = True,
    with_info: bool = True,
    compress: bool = True,
) -> None:
    """Write a complete .pbf: OSMHeader blob + one-or-more OSMData blobs.

    Elements are split across blobs so the read path genuinely exercises block
    parallelism even on fixtures.
    """
    with open(path, "wb") as f:
        f.write(blocks.frame_blob("OSMHeader", encode_header_block(meta), compress=compress))
        node_chunks = [
            nodes[i : i + nodes_per_block] for i in range(0, len(nodes), nodes_per_block)
        ] or []
        for chunk in node_chunks:
            f.write(
                blocks.frame_blob(
                    "OSMData",
                    encode_primitive_block(nodes=chunk, dense=dense, with_info=with_info),
                    compress=compress,
                )
            )
        if ways or relations:
            f.write(
                blocks.frame_blob(
                    "OSMData",
                    encode_primitive_block(
                        ways=ways, relations=relations, with_info=with_info
                    ),
                    compress=compress,
                )
            )
