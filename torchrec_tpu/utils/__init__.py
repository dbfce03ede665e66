"""Utility subpackage: checkpointing, metrics, torch-checkpoint interop."""
