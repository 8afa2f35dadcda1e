"""Vectorized element predicates — the Spark-native replacement for the reference's
per-element callback API (``/root/reference/src/load_pbf.jl:47-52,596-605``).

A predicate compiles two ways:

- :meth:`ElementPredicate.column` — a Catalyst ``Column`` for declarative filtering
  (pushdown, codegen, the normal path);
- :meth:`ElementPredicate.arrow_mask` — a NumPy boolean mask over a decoded Arrow
  RecordBatch, applied INSIDE the ``mapInArrow`` decode kernel ("filter during
  read"), the analog of the reference's callback-pushdown: elements failing the
  predicate never materialize into the DataFrame at all.

Both forms implement the same semantics; tests assert they agree.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np
import pyarrow as pa
from pyspark.sql import Column
from pyspark.sql import functions as F


def _map_entry_mask(tags: pa.Array, want_n: int, entry_pred) -> np.ndarray:
    """True for elements whose tags map has >=1 entry satisfying entry_pred(keys, vals)
    — vectorized over the flattened map buffers."""
    if isinstance(tags, pa.ChunkedArray):
        tags = tags.combine_chunks()
    offsets = np.asarray(tags.offsets)
    # null maps: offsets validity — use is_valid
    keys = np.asarray(tags.keys.to_pandas(), dtype=object)
    vals = np.asarray(tags.items.to_pandas(), dtype=object)
    hit = entry_pred(keys, vals)
    out = np.zeros(want_n, dtype=bool)
    if hit.any():
        pos = np.flatnonzero(hit)
        elem = np.searchsorted(offsets, pos, side="right") - 1
        out[np.unique(elem)] = True
    return out


@dataclass
class ElementPredicate:
    """Conjunction of simple element filters (the reference's documented callback
    patterns: tag equality ``docs/src/examples.md:58-67``, bbox containment
    ``test/test_load_pbf.jl:443-451``, size predicates ``:163-178``)."""

    tag_equals: dict[str, str] = field(default_factory=dict)
    has_tags: list[str] = field(default_factory=list)
    bbox: tuple[float, float, float, float] | None = None  # (bottom, left, top, right)
    min_refs: int | None = None
    require_tags: bool = False

    # ---- Catalyst form -------------------------------------------------
    def column(self) -> Column:
        cond = F.lit(True)
        for k, v in self.tag_equals.items():
            cond = cond & (F.col("tags").getItem(k) == F.lit(v))
        for k in self.has_tags:
            cond = cond & F.col("tags").getItem(k).isNotNull()
        if self.require_tags:
            cond = cond & F.col("tags").isNotNull()
        if self.bbox is not None:
            b, l, t, r = self.bbox
            cond = (
                cond
                & F.col("lat").between(b, t)
                & F.col("lon").between(l, r)
            )
        if self.min_refs is not None:
            cond = cond & (F.size(F.col("refs")) > F.lit(self.min_refs))
        return cond

    # ---- kernel form ---------------------------------------------------
    def arrow_mask(self, batch: pa.RecordBatch) -> np.ndarray:
        n = batch.num_rows
        mask = np.ones(n, dtype=bool)
        names = set(batch.schema.names)
        if (self.tag_equals or self.has_tags or self.require_tags) and "tags" in names:
            tags = batch.column("tags")
            valid = np.asarray(tags.is_valid())
            if self.require_tags:
                mask &= valid
            for k, v in self.tag_equals.items():
                mask &= _map_entry_mask(
                    tags, n, lambda ks, vs, k=k, v=v: (ks == k) & (vs == v)
                )
            for k in self.has_tags:
                mask &= _map_entry_mask(tags, n, lambda ks, vs, k=k: ks == k)
        if self.bbox is not None and "lat" in names:
            b, l, t, r = self.bbox
            lat = np.asarray(batch.column("lat"))
            lon = np.asarray(batch.column("lon"))
            mask &= (lat >= b) & (lat <= t) & (lon >= l) & (lon <= r)
        if self.min_refs is not None and "refs" in names:
            refs = batch.column("refs")
            if isinstance(refs, pa.ChunkedArray):
                refs = refs.combine_chunks()
            counts = np.diff(np.asarray(refs.offsets))
            mask &= counts > self.min_refs
        return mask

    def apply_arrow(self, batch: pa.RecordBatch) -> pa.RecordBatch:
        mask = self.arrow_mask(batch)
        if mask.all():
            return batch
        return batch.filter(pa.array(mask))
