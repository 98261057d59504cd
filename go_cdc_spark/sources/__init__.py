"""Capture layer: change-event envelope, snapshot sources, checkpoints."""
