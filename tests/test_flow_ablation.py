import sys

import pytest

sys.path.insert(0, "util_scripts")

import flow_ablation  # noqa: E402


def test_arm_table_covers_protocols():
    assert set(flow_ablation.ARM_OVERRIDES) == {"frozen", "e2e", "scratch"}
    assert "train_alignment=False" in flow_ablation.ARM_OVERRIDES["frozen"]
    assert "train_alignment=True" in flow_ablation.ARM_OVERRIDES["e2e"]
    # scratch must clear the pretrained checkpoint override
    assert "pwc_checkpoint=" in flow_ablation.ARM_OVERRIDES["scratch"]


def test_unknown_arm_rejected(tmp_path):
    with pytest.raises(SystemExit):
        flow_ablation.main(["--workspace", str(tmp_path),
                            "--arms", "frozen,bogus"])
