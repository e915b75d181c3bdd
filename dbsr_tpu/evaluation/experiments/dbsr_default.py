"""Default eval spec: the latest synthetic-trained DBSR checkpoint
(reference ``evaluation/synburst/experiments/dbsr_default.py:4-11``)."""

from dbsr_tpu.evaluation.network_param import NetworkParam


def main():
    return [
        NetworkParam(module="dbsr", parameter="default_synthetic",
                     net_name="dbsr_synthetic"),
    ]
