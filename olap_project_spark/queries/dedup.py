"""Placeholder — filled in by the training-data ops milestone."""
