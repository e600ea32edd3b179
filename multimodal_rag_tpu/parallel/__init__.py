"""Device mesh utilities and collectives-based distributed search."""
