"""Multi-host (DCN) asset-pipeline sharding — BASELINE config 5 at pod
scale.

The reference is a single-threaded, single-process library; its 10k-texture
analog here runs one *process per host* of a TPU pod slice. Texture
encoding has no cross-image coupling, so the TPU-native decomposition is:

  * hosts partition the ASSET LIST (round-robin by global index) over DCN
    — no image bytes ever cross hosts;
  * each host encodes its partition on its LOCAL chips through the
    ordinary :class:`~texcomp.dist.pipeline.AssetPipeline` (shard_map over
    a host-local mesh riding ICI only);
  * results stay host-local (each host owns its shard of the output
    store) — the only DCN traffic is jax.distributed's control plane.

This mirrors SURVEY §5's note: ICI for in-batch parallelism, "DCN only
for the host-side asset-pipeline sharding of the 10k-texture config".

Validated by a 2-process CPU dryrun (tests/test_multihost.py and
``__graft_entry__.dryrun_multichip``): both processes encode disjoint
partitions whose union is byte-identical to a single-process run.
"""

from __future__ import annotations

from typing import Sequence

import jax
import numpy as np
from jax.sharding import Mesh

from texcomp.dist.pipeline import AssetPipeline, TextureAsset


def initialize(coordinator_address: str, num_processes: int,
               process_id: int) -> None:
    """Join the pod-wide jax.distributed runtime (DCN control plane).

    On a real pod each host calls this once before touching jax.devices();
    the CPU dryrun passes localhost coordinates."""
    jax.distributed.initialize(coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id)


def local_mesh() -> Mesh:
    """1-D "data" mesh over THIS host's chips (ICI only — asset batches
    never shard across DCN)."""
    return Mesh(np.asarray(jax.local_devices()), axis_names=("data",))


def partition(assets: Sequence[TextureAsset]) -> list[TextureAsset]:
    """This process's round-robin share of the global asset list.

    Round-robin (not contiguous slabs) so the size-skewed fleets typical
    of game asset stores balance: consecutive assets of one size class
    spread across hosts instead of landing on one."""
    idx = jax.process_index()
    n = jax.process_count()
    return [a for i, a in enumerate(assets) if i % n == idx]


def run_fleet(assets: Sequence[TextureAsset], *, mipmaps: bool = False,
              batch_size: int = 64, pipeline: AssetPipeline | None = None):
    """Encode this host's partition of a global asset fleet.

    Every process passes the SAME global asset list (cheap: assets are
    names + references); each encodes only its partition on its local
    chips and returns those results. The union over processes covers the
    fleet exactly once."""
    if pipeline is None:
        pipeline = AssetPipeline(mesh=local_mesh(), batch_size=batch_size)
    return pipeline.run(partition(assets), mipmaps=mipmaps)


def fleet_quality(images: np.ndarray, codec: str = "dxt1", *,
                  pipeline: AssetPipeline | None = None) -> float:
    """Global-fleet PSNR across every host: each process encodes+decodes
    its round-robin partition of ``images`` on its LOCAL mesh
    (pipeline.quality_sums — in-host reduction is an ICI psum), then the
    per-host (sum squared error, count) pairs — two scalars per host —
    cross DCN once and combine before the log. Every process passes the
    SAME global image batch and returns the SAME global PSNR; averaging
    per-host PSNRs instead would be wrong for heterogeneous partitions."""
    from jax.experimental import multihost_utils

    from texcomp.dist.pipeline import psnr_from_sums, quality_sums

    if pipeline is None:
        pipeline = AssetPipeline(mesh=local_mesh())
    idx, n = jax.process_index(), jax.process_count()
    mine = images[idx::n]
    se, cnt = (quality_sums(pipeline, mine, codec) if len(mine)
               else (0.0, 0.0))
    sums = multihost_utils.process_allgather(
        np.asarray([se, cnt], np.float64))
    return psnr_from_sums(float(sums[..., 0].sum()),
                          float(sums[..., 1].sum()))
