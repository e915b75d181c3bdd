"""Evaluation: score computation, result saving, reporting — matching the
reference protocol (boundary_ignore=40, uint16 2^14 quantization)."""
