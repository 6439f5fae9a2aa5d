"""Training/evaluation engine: losses, trainer, checkpoints, metrics, OOD."""
