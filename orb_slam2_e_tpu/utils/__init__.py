"""Config, IO, metrics, profiling, synthetic data."""
