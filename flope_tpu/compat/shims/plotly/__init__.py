"""Shim for `plotly` (not installed): import-time placeholder. The reference
imports plotly.graph_objects at module scope in utils/plot.py; the A/B path
never builds a figure."""
