"""Jittable TPU-native primitives (NHWC, channels-last)."""

from dbsr_tpu.ops import camera
from dbsr_tpu.ops import interp
from dbsr_tpu.ops import filtering
from dbsr_tpu.ops import raw
from dbsr_tpu.ops import metrics
from dbsr_tpu.ops import correlation
from dbsr_tpu.ops import augment
