"""Multi-chip scale-out: corpus-sharded routing + cross-chip top-k merge."""
