"""Checkpoint manifests, per-partition lineage, per-stage metrics."""
