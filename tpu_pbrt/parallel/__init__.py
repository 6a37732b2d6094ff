"""Multi-chip scaling: device mesh, pixel-tile sharding, collectives."""
