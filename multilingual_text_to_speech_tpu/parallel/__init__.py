"""SPMD parallelism over a TPU device mesh.

The reference parallelizes with single-host ``torch.nn.DataParallel``
(replicate/scatter/gather, train.py:173-179,255-256).  Here parallelism is
expressed through ``jax.sharding``: a named mesh ``(data, model)``, batches
sharded over ``data``, parameters replicated (the model is ~30M params), and
XLA inserting the gradient ``psum`` over ICI automatically.

The ``model`` axis is reserved for language-group parallelism: the grouped
encoders' ``[B/L, T, L*C]`` channel blocks are language-independent, so the
group dimension shards cleanly across devices.
"""

from multilingual_text_to_speech_tpu.parallel.mesh import (
    batch_sharding,
    make_mesh,
    replicate,
    shard_batch,
)

__all__ = ["make_mesh", "batch_sharding", "shard_batch", "replicate"]
