"""PROX sliding-window fitting pipeline (RGB-D scene capture)."""
