"""Corpus acquisition and curation tooling (offline, host-side)."""
