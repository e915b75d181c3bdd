"""Utility helpers: 16-bit PNG codec, loading, formatting."""
