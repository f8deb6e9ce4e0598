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


from functools import partial


@partial(
    jax.jit,
    static_argnames=("mesh", "config", "stage", "dtype", "precision", "packed"),
)
def _dp_score_fn(d_params, images, alpha, mesh, config, stage, dtype,
                 precision, packed):
    from probgan_tpu.models import pro_gan

    axes = tuple(mesh.axis_names)

    def local_score(params, x_local, a):
        return pro_gan.discriminator_apply(
            params, x_local, config, stage, a, dtype, precision,
            packed=packed, stddev_axis=axes,
        )

    fn = jax.shard_map(
        local_score,
        mesh=mesh,
        in_specs=(P(), P(axes), P()),
        out_specs=P(axes),
        check_vma=False,
    )
    return fn(d_params, images, alpha)


def replicate_params(mesh: Mesh, params):
    """Place a params pytree replicated over every mesh device ONCE (the
    engine caches the result) — re-placing per call would transfer the full
    tree from its single home device on every request."""
    return jax.device_put(params, NamedSharding(mesh, P()))


def dp_score(
    mesh: Mesh,
    d_params,
    images: jax.Array,
    config: ProGANConfig,
    stage: int,
    alpha: float = 1.0,
    dtype=jnp.float32,
    precision=None,
    packed: bool = False,
) -> jax.Array:
    """Score an image batch sharded over the mesh (all axes data-parallel).

    The discriminator's minibatch-stddev channel is batch-COUPLED, so the
    sharded forward computes its statistics over the GLOBAL batch with a
    pmean (models/pro_gan.py minibatch_stddev) — mathematically identical
    to the single-device logits, equal up to float reduction order (tested
    to 1e-5 in tests/test_parallel.py). Batch must divide the device count
    (padding would change the batch statistics)."""
    n_dev = mesh.devices.size
    if images.shape[0] % n_dev != 0:
        raise ValueError(
            f"batch {images.shape[0]} must be divisible by device count "
            f"{n_dev} (minibatch stddev forbids padding)"
        )
    d_params = jax.device_put(d_params, NamedSharding(mesh, P()))
    images = jax.device_put(
        images, NamedSharding(mesh, P(tuple(mesh.axis_names)))
    )
    return _dp_score_fn(
        d_params, images, jnp.float32(alpha), mesh, config, stage, dtype,
        precision, packed,
    )


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
