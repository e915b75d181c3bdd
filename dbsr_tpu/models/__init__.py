"""flax.linen model components: DBSR net, PWC-Net flow, SCA, LPIPS."""
