"""The spatial-join + tiling core (BASELINE.json north_rule)."""
