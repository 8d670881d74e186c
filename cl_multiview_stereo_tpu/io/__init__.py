"""Host I/O: image-array loading and stage-artifact dumps."""
