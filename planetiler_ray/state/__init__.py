"""Checkpoint/lineage state for resumable pipelines."""

from .checkpoint import CheckpointStore
