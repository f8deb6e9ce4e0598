"""Data-parallel progressive-GAN TRAINING over a device mesh.

The serving DP path (sharded_image.py) scales the forward; this scales the
full G/D train step: params and optimizer state replicate, the global batch
shards over every mesh axis, each device runs the complete step body on its
shard — including the phase-blocked Pallas kernels with their custom VJPs,
which is why this runs under ``jax.shard_map`` rather than bare
jit-with-shardings (XLA's automatic partitioner has no rule for pallas_call)
— and gradients are pmean'd over ICI (engine/train.py progan_train_step's
``axis_names`` plumbing, which also computes the discriminator's
minibatch-stddev statistics over the GLOBAL batch). With equal shard sizes
the math is identical to a single-device step on the concatenated batch
(tested to float-reduction-order tolerance in tests/test_parallel.py), so
checkpoints are interchangeable between single- and multi-device training —
the per-shard updates coincide and params stay replicated with no explicit
broadcast.

The reference is strictly single-device (SURVEY.md §2.2); this is the
framework's scale-out training path (``prot_b_gan.py --model image --mesh``).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from probgan_tpu.engine.train import ProGANTrainState, progan_train_step
from probgan_tpu.models.pro_gan import ProGANConfig


@partial(
    jax.jit,
    static_argnames=("mesh", "config", "stage", "lr", "dtype", "ema_beta",
                     "packed_fake", "remat", "packed_d", "packed_g",
                     "packed_train_mode", "r1_gamma"),
)
def _dp_step(state, real_images, z, alpha, mesh, config, stage, lr, dtype,
             ema_beta, packed_fake, remat, packed_d, packed_g,
             packed_train_mode, r1_gamma):
    axes = tuple(mesh.axis_names)

    def body(st, real_local, z_local, a):
        return progan_train_step(
            st, real_local, z_local, a, config, stage, lr,
            dtype=dtype, ema_beta=ema_beta, packed_fake=packed_fake,
            remat=remat, packed_d=packed_d, packed_g=packed_g,
            packed_train_mode=packed_train_mode, axis_names=axes,
            r1_gamma=r1_gamma,
        )

    fn = jax.shard_map(
        body,
        mesh=mesh,
        in_specs=(P(), P(axes), P(axes), P()),
        out_specs=(P(), P()),
        check_vma=False,
    )
    return fn(state, real_images, z, alpha)


def replicate_state(mesh: Mesh, state: ProGANTrainState) -> ProGANTrainState:
    """Place the train state replicated over the mesh ONCE (start of
    training / after a resume load). The step keeps it replicated."""
    return jax.device_put(state, NamedSharding(mesh, P()))


def shard_kg_state(mesh: Mesh, state):
    """Place a KGTrainState for mesh training: the entity table row-shards
    over the ``model`` axis (it dominates memory at production N — 120k×128
    fp32 is 61 MB but 100M-entity tables are 51 GB), everything else
    replicates. The jitted kg_train_step / kg_eval_hits graphs partition
    under these shardings via GSPMD — XLA gathers only the batch's table
    rows and psums the table-row gradient scatter over ICI (the step is
    pure XLA, so automatic partitioning applies; contrast dp_progan_train
    above, whose Pallas kernels need shard_map). Exercised as the driver
    contract in __graft_entry__.dryrun_multichip.

    The table's Adam moments (inside g_opt, which optimizes
    (g_params, node_emb, rel_emb)) are [N, D] too — 2x the table's bytes —
    so they shard with it: every [N, D] leaf in the state takes the table
    sharding, everything else replicates."""
    repl = NamedSharding(mesh, P())
    table = NamedSharding(mesh, P("model", None))
    n_ent = state.node_emb.shape[0]

    def put(x):
        if getattr(x, "ndim", 0) == 2 and x.shape[0] == n_ent:
            return jax.device_put(x, table)
        return jax.device_put(x, repl)

    return jax.tree.map(put, state)


def kg_batch_sharding(mesh: Mesh) -> NamedSharding:
    """Sharding for per-step batch tensors (triplets / negatives): rows over
    the ``data`` axis, replicated over ``model``."""
    return NamedSharding(mesh, P("data"))


def dp_progan_train_step(
    mesh: Mesh,
    state: ProGANTrainState,
    real_images: jax.Array,
    z: jax.Array,
    alpha,
    config: ProGANConfig,
    stage: int,
    lr: float = 1e-3,
    dtype=jnp.float32,
    ema_beta: float = 0.999,
    packed_fake: bool = False,
    remat: bool = True,
    packed_d: bool = False,
    packed_g: bool = False,
    packed_train_mode: str = "default",
    r1_gamma: float = 0.0,
):
    """One data-parallel G/D step; same contract as progan_train_step with
    the batch sharded over every mesh axis. Batch must divide the device
    count — unequal shards would silently re-weight pmean'd gradients, and
    minibatch stddev forbids padding."""
    n_dev = mesh.devices.size
    if real_images.shape[0] % n_dev != 0 or z.shape[0] % n_dev != 0:
        raise ValueError(
            f"batch {real_images.shape[0]} must be divisible by device "
            f"count {n_dev} for data-parallel training"
        )
    shard = NamedSharding(mesh, P(tuple(mesh.axis_names)))
    real_images = jax.device_put(real_images, shard)
    z = jax.device_put(z, shard)
    return _dp_step(
        state, real_images, z, jnp.float32(alpha), mesh, config, stage, lr,
        dtype, ema_beta, packed_fake, remat, packed_d, packed_g,
        packed_train_mode, r1_gamma,
    )
