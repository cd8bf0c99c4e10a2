"""Multi-chip scale-out: sharded bundle adjustment and matching."""
