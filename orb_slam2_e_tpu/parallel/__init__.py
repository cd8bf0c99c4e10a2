"""Multi-chip scale-out: sharded bundle adjustment, batched lane tracking,
and keyframe-sharded place-recognition queries."""
