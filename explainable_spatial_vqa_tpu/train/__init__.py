"""Training: losses, the unified trainer, checkpointing, metrics."""
