"""Data plumbing: marker sets, motion-image representations, AMASS/PROX IO."""
