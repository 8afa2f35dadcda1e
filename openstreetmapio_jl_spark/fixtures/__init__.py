"""Deterministic synthetic fixtures: OSM PBF/XML pairs + Common-Crawl-style pages."""
