"""Runtime utilities: profiling, stage timing."""
