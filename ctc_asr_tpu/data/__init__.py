"""Data layer: manifests, bucketed sharded loading, corpus generation.

Replaces the reference's CSV-manifest + tf.data input pipeline
(``asr/input_functions.py`` + ``asr/dataset/*``, SURVEY.md §2a) with a
tf.data-free, deterministic, ``(shard_idx, num_shards)``-parameterized
loader producing fixed-shape padded batches (BASELINE.json:5 "grain/
tf.data-free sharded loader").
"""

from .manifest import Manifest, Utterance, read_manifest, write_manifest
from .loader import BatchSpec, Batch, DataLoader

__all__ = ["Manifest", "Utterance", "read_manifest", "write_manifest",
           "BatchSpec", "Batch", "DataLoader"]
