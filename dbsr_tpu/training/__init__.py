"""Training runtime: train state, trainer loop, checkpointing, stats,
logging, actors."""
