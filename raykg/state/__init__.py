"""Checkpoint manifests + per-stage metrics/lineage."""
