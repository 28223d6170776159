"""Experiment management: metric logging, checkpoint/resume."""
