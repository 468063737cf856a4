"""Training: losses, per-group Adam with schedules, jitted step,
densification, checkpointing."""
