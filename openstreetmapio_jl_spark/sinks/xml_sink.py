"""Distributed sharded OSM XML sink.

Mirror of :mod:`~openstreetmapio_jl_spark.sinks.pbf_sink` for the ``.osm`` XML
format the reference's ``load_osm`` reads (``/root/reference/src/load_xml.jl``):
entity DataFrames → ``{kind}-NNNNN.osm`` shard files, each a complete
standalone OSM XML document (header + ``<bounds>`` + elements), encoded
executor-side per partition. Same scale shape as the PBF sink: range-sharded +
sorted by ``id``, streaming batch encode, temp-file + ``os.replace`` task-retry
idempotence, shard-count-sized manifest back to the driver.

Format notes (matching the engine's own XML reader and the reference's):

- coordinates print at 7 decimal places — exact for anything that came through
  PBF (granularity 100 ⇒ 1e-7°), and the OSM XML convention;
- ``info`` becomes ``version``/``user`` attributes when present, but the XML
  READ path drops Info entirely (``src/load_xml.jl:215,230,245`` — preserved
  asymmetry), so a write→read round trip returns NULL info by design;
- attribute escaping matches ``xml.sax.saxutils`` with quote/apostrophe
  entities plus ``&#10;``/``&#9;``/``&#13;`` for literal whitespace (attribute
  values are whitespace-normalized on re-read unless char-ref'd); remaining C0
  control chars are stripped (unrepresentable in XML 1.0 — PBF is the lossless
  path for those).
"""

from __future__ import annotations

import os
import uuid
from typing import TYPE_CHECKING, Iterator
from xml.sax.saxutils import escape as xml_escape

import pyarrow as pa

from openstreetmapio_jl_spark.sinks.pbf_sink import (
    MANIFEST_DDL,
    _ENTITY_COLS,
    _row_to_element,
)

if TYPE_CHECKING:
    from pyspark.sql import DataFrame


import re as _re

# C0 controls other than \t\n\r are unrepresentable in XML 1.0 (even as char
# refs) — strip them; the PBF sink is the lossless path for such payloads
_C0_RE = _re.compile(r"[\x00-\x08\x0b\x0c\x0e-\x1f]")

_ESC_ENTITIES = {
    '"': "&quot;",
    "'": "&#39;",
    # literal whitespace in attribute values is NORMALIZED to spaces by any
    # conforming XML parser on re-read; character references are exempt from
    # that normalization, so \n/\t/\r only round-trip as &#10;/&#9;/&#13;
    "\n": "&#10;",
    "\t": "&#9;",
    "\r": "&#13;",
}


def _esc(s: str) -> str:
    return xml_escape(_C0_RE.sub("", s), _ESC_ENTITIES)


def _tag_lines(el: dict, indent: str) -> list[str]:
    return [
        f'{indent}<tag k="{_esc(k)}" v="{_esc(v)}"/>'
        for k, v in (el.get("tags") or {}).items()
    ]


def _info_attrs(el: dict) -> str:
    info = el.get("info")
    if not info:
        return ""
    out = ""
    if info.get("version") is not None:
        out += f' version="{info["version"]}"'
    if info.get("user") is not None:
        out += f' user="{_esc(info["user"])}"'
    return out


def _element_lines(el: dict, kind: str) -> list[str]:
    if kind == "nodes":
        attrs = (
            f'id="{el["id"]}" lat="{el["lat"]:.7f}" lon="{el["lon"]:.7f}"'
            + _info_attrs(el)
        )
        tags = _tag_lines(el, "    ")
        if tags:
            return [f"  <node {attrs}>", *tags, "  </node>"]
        return [f"  <node {attrs}/>"]
    if kind == "ways":
        return [
            f'  <way id="{el["id"]}"{_info_attrs(el)}>',
            *(f'    <nd ref="{r}"/>' for r in el["refs"] or []),
            *_tag_lines(el, "    "),
            "  </way>",
        ]
    return [
        f'  <relation id="{el["id"]}"{_info_attrs(el)}>',
        *(
            f'    <member type="{m["type"]}" ref="{m["ref"]}" role="{_esc(m["role"])}"/>'
            for m in el.get("members") or []
        ),
        *_tag_lines(el, "    "),
        "  </relation>",
    ]


def _xml_header(meta: dict) -> str:
    lines = [
        '<?xml version="1.0" encoding="UTF-8"?>',
        '<osm version="0.6" generator="openstreetmapio_jl_spark sharded sink">',
    ]
    bb = meta.get("bbox")
    if bb:
        lines.append(
            f'  <bounds minlat="{bb["bottom_lat"]}" minlon="{bb["left_lon"]}" '
            f'maxlat="{bb["top_lat"]}" maxlon="{bb["right_lon"]}"/>'
        )
    return "\n".join(lines) + "\n"


def _shard_kernel(kind: str, out_dir: str, meta: dict):
    def kernel(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        final = os.path.join(out_dir, f"{kind}-{pid:05d}.osm")
        tmp = f"{final}.tmp-{uuid.uuid4().hex}"
        rows = 0
        min_id = max_id = None
        f = None
        try:
            for rb in batches:
                elements = [_row_to_element(r, kind) for r in rb.to_pylist()]
                if not elements:
                    continue
                if f is None:
                    f = open(tmp, "w", encoding="utf-8")
                    f.write(_xml_header(meta))
                min_id = elements[0]["id"] if min_id is None else min_id
                max_id = elements[-1]["id"]
                rows += len(elements)
                f.write(
                    "\n".join(
                        line for el in elements for line in _element_lines(el, kind)
                    )
                    + "\n"
                )
            if f is None:
                return
            f.write("</osm>\n")
            f.close()
            f = None
            size = os.path.getsize(tmp)
            os.replace(tmp, final)
        finally:
            if f is not None:
                f.close()
            if os.path.exists(tmp):
                os.remove(tmp)
        yield pa.RecordBatch.from_pylist(
            [
                {
                    "path": final,
                    "kind": kind,
                    "rows": rows,
                    "bytes": size,
                    "blobs": 1,  # XML has no blob framing; one document per shard
                    "min_id": min_id,
                    "max_id": max_id,
                }
            ]
        )

    return kernel


def write_xml_sharded(
    df: "DataFrame",
    kind: str,
    out_dir: str,
    *,
    shards: int | None = None,
    meta: dict | None = None,
) -> list[dict]:
    """Write one entity kind as ``{out_dir}/{kind}-NNNNN.osm`` shards."""
    if kind not in _ENTITY_COLS:
        raise ValueError(f"kind must be one of {sorted(_ENTITY_COLS)}, got {kind!r}")
    cols = [c for c in _ENTITY_COLS[kind] if c in df.columns]
    if "id" not in cols:
        raise ValueError(f"{kind} DataFrame needs an 'id' column; has {df.columns}")
    plan = df.select(*cols)
    # ALWAYS range-partition by id: with the incoming hash/arbitrary
    # partitioning, shards would be internally sorted but their id-spans could
    # overlap, breaking the manifest's tight-span property and the
    # id-sorted-file OSM convention. Default from defaultParallelism, not
    # df.rdd (which materializes AQE stages just to read a partition count).
    plan = plan.repartitionByRange(
        shards
        if shards is not None
        else max(1, df.sparkSession.sparkContext.defaultParallelism),
        "id",
    )
    plan = plan.sortWithinPartitions("id")
    os.makedirs(out_dir, exist_ok=True)
    manifest = plan.mapInArrow(
        _shard_kernel(kind, out_dir, meta or {}), MANIFEST_DDL
    ).collect()
    return [r.asDict() for r in manifest]


def write_bundle_xml(bundle, out_dir: str, *, shards: int | None = None) -> list[dict]:
    """Write an ``OSMBundle`` as a sharded ``.osm`` directory; reads back via
    :func:`~openstreetmapio_jl_spark.sources.xml_source.read_osm` (one parse
    task per shard)."""
    manifest: list[dict] = []
    for kind, df in (
        ("nodes", bundle.nodes),
        ("ways", bundle.ways),
        ("relations", bundle.relations),
    ):
        manifest.extend(
            write_xml_sharded(df, kind, out_dir, shards=shards, meta=bundle.meta or {})
        )
    return manifest
