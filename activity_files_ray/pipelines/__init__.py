"""End-to-end composed pipelines and the driver-facing query registry."""
