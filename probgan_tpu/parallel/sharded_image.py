"""Data-parallel image generation over a device mesh.

Latents shard over the ``data`` axis, generator params replicate, and the
jitted generator graph (engine/image.py:generate_fn) partitions automatically
under the shardings — XLA inserts no collectives for this embarrassingly
parallel forward, so throughput scales linearly with chips over ICI-connected
slices. The reference has no parallelism of any kind (SURVEY.md §2.2); this
is the DP serving path for the image family (the KG family's TP path is
sharded_rank.py).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from probgan_tpu.engine.image import generate_fn
from probgan_tpu.models.pro_gan import ProGANConfig


def dp_generate(
    mesh: Mesh,
    g_params,
    z: jax.Array,
    config: ProGANConfig,
    stage: int,
    alpha: float = 1.0,
    dtype=jnp.float32,
    precision=None,
    packed: bool = False,
) -> jax.Array:
    """Generate a latent batch sharded over the mesh's ``data`` axis.

    ``z`` is [B, latent_dim] with B divisible by the TOTAL device count
    (every mesh axis data-parallelizes this embarrassingly parallel forward,
    so a (data=2, model=4) serving mesh still uses all 8 chips).
    Returns uint8 images [B, R, R, 3], sharded over the mesh.

    Runs under shard_map (not bare jit-with-shardings) so the phase-blocked
    Pallas late-stage path (``packed=True``) executes per-device — XLA's
    automatic partitioner has no rule for pallas_call and would replicate it.
    """
    n_dev = mesh.devices.size
    if z.shape[0] % n_dev != 0:
        raise ValueError(
            f"batch {z.shape[0]} must be divisible by device count {n_dev}"
        )
    axes = tuple(mesh.axis_names)
    repl = NamedSharding(mesh, P())
    batch_shard = NamedSharding(mesh, P(axes))
    g_params = jax.device_put(g_params, repl)
    z = jax.device_put(z, batch_shard)

    def local_gen(params, z_local):
        return generate_fn(
            params, z_local, jnp.float32(alpha), config, stage, dtype, False,
            precision, packed,
        )

    fn = jax.shard_map(
        local_gen,
        mesh=mesh,
        in_specs=(P(), P(axes)),
        out_specs=P(axes),
        check_vma=False,
    )
    return fn(g_params, z)
