"""Multi-chip sharding and the batched asset pipeline.

The reference is single-threaded C++ with no parallelism of any kind
(SURVEY.md section 2: no threads, no SIMD, no devices). Here parallelism is
first-class and TPU-native:

  * within a chip: the block-batch axis feeds the VPU via XLA/Pallas
  * across chips: jax.sharding.Mesh data-parallelism over the image batch
    (and optionally the block axis of one huge atlas), with ICI collectives
    only for metric reductions
"""

from texcomp.dist.mesh import (
    dxt1_pipeline_sharded,
    make_mesh,
    training_step_multichip,
)

__all__ = ["dxt1_pipeline_sharded", "make_mesh", "training_step_multichip"]
