"""Data pipeline: on-device synthetic burst generation + host-side readers."""

from dbsr_tpu.data import synthetic
