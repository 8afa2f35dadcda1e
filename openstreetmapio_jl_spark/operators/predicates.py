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


@dataclass
class ElementTransform:
    """Vectorized element REBUILD — the analog of the reference's
    transform-during-decode callbacks, which can return a modified element, not
    just filter it (``test/test_load_pbf.jl:268-302`` asserts an injected tag).

    Two forms with identical semantics (contract-tested):

    - :meth:`apply_column` — Catalyst map_filter/map_concat rewrite (codegen,
      the downstream path);
    - :meth:`apply_arrow` — in-kernel rewrite of the Arrow map buffers inside
      ``mapInArrow`` ("transform during read"): tag injection happens before
      the rows ever materialize into a DataFrame.

    Semantics: ``drop_tags`` keys are removed; ``set_tags`` entries are
    upserted (existing values overwritten); when ``set_tags`` is non-empty,
    elements with NULL tags get a fresh map of exactly the injected entries.
    """

    set_tags: dict[str, str] = field(default_factory=dict)
    drop_tags: list[str] = field(default_factory=list)

    # ---- Catalyst form -------------------------------------------------
    def tags_column(self, tags: Column | None = None) -> Column:
        tags = F.col("tags") if tags is None else tags
        remove = sorted(set(self.drop_tags) | set(self.set_tags))
        out = tags
        if remove:
            # pre-dropping upserted keys keeps map_concat clear of duplicate
            # keys (Spark's default mapKeyDedupPolicy=EXCEPTION would throw)
            out = F.map_filter(out, lambda k, v: ~k.isin(*remove))
        if self.set_tags:
            inj = F.create_map(
                *[F.lit(x) for kv in sorted(self.set_tags.items()) for x in kv]
            )
            out = F.when(tags.isNull(), inj).otherwise(F.map_concat(out, inj))
        return out

    def apply_column(self, df) -> "DataFrame":  # noqa: F821
        if not (self.set_tags or self.drop_tags):
            return df
        return df.withColumn("tags", self.tags_column())

    # ---- kernel form ---------------------------------------------------
    def apply_arrow(self, batch: pa.RecordBatch) -> pa.RecordBatch:
        if not (self.set_tags or self.drop_tags) or "tags" not in batch.schema.names:
            return batch
        idx = batch.schema.get_field_index("tags")
        tags = batch.column(idx)
        if isinstance(tags, pa.ChunkedArray):
            tags = tags.combine_chunks()
        n = batch.num_rows
        valid = np.asarray(tags.is_valid()) if n else np.zeros(0, dtype=bool)
        offsets = np.asarray(tags.offsets)
        keys = np.asarray(tags.keys.to_pandas(), dtype=object)
        vals = np.asarray(tags.items.to_pandas(), dtype=object)
        remove = sorted(set(self.drop_tags) | set(self.set_tags))
        if len(keys) and remove:
            keep = ~np.isin(keys, remove)
        else:
            keep = np.ones(len(keys), dtype=bool)
        entry_elem = np.searchsorted(offsets, np.arange(len(keys)), side="right") - 1
        kept_elem = entry_elem[keep]
        kept_keys, kept_vals = keys[keep], vals[keep]
        inj = sorted(self.set_tags.items())
        kept_counts = np.bincount(kept_elem, minlength=n) if n else np.zeros(0, int)
        out_valid = valid | bool(inj)
        counts = kept_counts + (len(inj) if inj else 0)
        counts[~out_valid] = 0
        new_offsets = np.concatenate([[0], np.cumsum(counts)]).astype(np.int64)
        total = int(new_offsets[-1])
        out_keys = np.empty(total, dtype=object)
        out_vals = np.empty(total, dtype=object)
        if len(kept_elem):
            # rank of each kept entry within its element (kept_elem is sorted)
            rank = np.arange(len(kept_elem)) - np.searchsorted(
                kept_elem, kept_elem, side="left"
            )
            pos = new_offsets[kept_elem] + rank
            out_keys[pos] = kept_keys
            out_vals[pos] = kept_vals
        if inj and n:
            base = new_offsets[:-1] + kept_counts
            targets = np.flatnonzero(out_valid)
            for i, (k, v) in enumerate(inj):
                p = base[targets] + i
                out_keys[p] = k
                out_vals[p] = v
        # null slots follow the Arrow list/map convention: null marker at
        # offsets[i]; the final offset must stay non-null
        off_list = [
            int(new_offsets[i]) if out_valid[i] else None for i in range(n)
        ] + [total]
        new_map = pa.MapArray.from_arrays(
            pa.array(off_list, pa.int32()),
            pa.array(list(out_keys), pa.string()),
            pa.array(list(out_vals), pa.string()),
        )
        return batch.set_column(idx, batch.schema.field(idx), new_map)
