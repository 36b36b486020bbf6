"""Parallelism: device meshes, shardings, multi-host init, distributed decode.

New capability vs the reference (SURVEY.md §2c: the reference is
single-process/single-GPU with no communication layer at all). The
TPU-native design follows BASELINE.json:5:

- data parallel is primary: per-host manifest shards (data/loader.py),
  batch sharded over the ``data`` mesh axis, gradients psum'd by XLA
  under jit-with-shardings;
- GSPMD tensor parallel over the ``model`` axis for the RNN hidden /
  projection dims when the encoder exceeds one chip;
- multi-host process groups via ``jax.distributed`` over DCN;
- distributed beam decode exchanges per-shard top-K beam state with ICI
  collectives (ops/beam.py + shard_map, see ``dist.py``).
"""

from .mesh import build_mesh, batch_sharding, param_shardings
from .dist import initialize_distributed

__all__ = ["build_mesh", "batch_sharding", "param_shardings",
           "initialize_distributed"]
