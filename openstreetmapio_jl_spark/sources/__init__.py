"""Sources: block-parallel PBF, OSM XML, Overpass HTTP, pages parquet/Iceberg-style."""
