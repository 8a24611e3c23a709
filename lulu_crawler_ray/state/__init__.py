"""Actor-held state: sharded URL-seen set, metrics, checkpoints."""
