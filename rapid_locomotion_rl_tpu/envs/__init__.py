"""Task environments: the vectorized legged-robot velocity-tracking task."""
