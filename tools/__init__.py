"""CLI drivers (train/evaluate/visualize/benchmark) — importable so tests can
exercise the driver-level wiring, not just the library functions."""
