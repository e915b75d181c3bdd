"""PWC-Net training configs."""
