"""Utilities: logging, visualization, checkpointing."""
