"""Multi-chip scale-out over a particle-sharded device mesh."""
