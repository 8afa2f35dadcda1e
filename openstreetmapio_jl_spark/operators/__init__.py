"""Engine operators: predicates, spatial joins, kNN, tiling, dedup, similarity, lineage."""
