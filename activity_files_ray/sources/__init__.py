"""Format parser / encoder batch kernels (GPX, TCX, CSV, GeoJSON,
FIT) + content-based format detection."""
