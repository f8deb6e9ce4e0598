"""Parallelism: device meshes and sharded variants of the hot paths.

The reference is strictly single-device (SURVEY.md §2.2); this package is the
TPU-native scaling layer it lacks: entity-table tensor parallelism and batch
data parallelism over a ``jax.sharding.Mesh``, with XLA collectives riding ICI.
"""

from probgan_tpu.parallel.mesh import make_mesh, resolve_mesh
from probgan_tpu.parallel.sharded_rank import sharded_rank_topk

__all__ = ["make_mesh", "resolve_mesh", "sharded_rank_topk"]
# dp_train / sharded_image import the engine (jit-decorated steps); they are
# imported lazily at their call sites to keep `import probgan_tpu.parallel`
# light for CLI --help paths.
