"""Driver-side pipeline plan/stage runner."""
