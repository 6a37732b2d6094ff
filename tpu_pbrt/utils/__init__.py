"""Host utilities: config, image IO, metrics, profiling."""
