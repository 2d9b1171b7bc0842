"""Data sources: testdata table registry and granule-style readers."""
