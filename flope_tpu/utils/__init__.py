"""Host-side utilities: dataset I/O, config, logging, profiling, plotting."""
