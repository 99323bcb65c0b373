"""Training core: losses, metrics, jitted trainer, SGHMC, checkpointing."""
