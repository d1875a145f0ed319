"""Gradient-based fitting pipelines (AMASS per-frame/temporal, PROX)."""
