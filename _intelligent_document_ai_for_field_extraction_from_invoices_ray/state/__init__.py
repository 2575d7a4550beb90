"""Checkpoint manifest + broadcast state."""
