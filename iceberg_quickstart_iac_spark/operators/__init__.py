"""Data-processing operators (SURVEY §2.3-§2.5, §2.13)."""
