"""Image-synthesis engine: batched latent -> image generation, discriminator
scoring, and latent-space walks (BASELINE.json configs 2-5).

All hot paths are module-level jitted pure functions keyed on the (hashable,
frozen) ProGANConfig + static stage, so each benchmark resolution compiles
exactly one graph; ``alpha`` is traced (one graph serves the whole 256²
fade-in sweep). The final tanh->uint8 denorm can run as the fused Pallas
kernel (ops/pallas_image.py) but defaults OFF: measured at 1024² b8 the
XLA path is 13% faster (53.6 vs 47.3 img/s) because XLA fuses the denorm
into the preceding op's epilogue, whereas a pallas_call boundary forces the
fp32 RGB tensor through HBM — exactly the round trip the kernel was meant to
save. Set PROBGAN_PALLAS_UINT8=1 (or use_pallas=True) to enable it.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from probgan_tpu.core.device import resolve_device
from probgan_tpu.core.rng import RngStream
from probgan_tpu.models import pro_gan
from probgan_tpu.ops import pallas_image
from probgan_tpu.utils.profiling import task_trace


def packed_default() -> bool:
    """Default for the phase-blocked Pallas late-stage path: on for TPU
    unless PROBGAN_PACKED=0 (the escape hatch)."""
    import os

    return (
        jax.default_backend() == "tpu"
        and os.environ.get("PROBGAN_PACKED", "1") != "0"
    )


@partial(
    jax.jit,
    static_argnames=("config", "stage", "dtype", "use_pallas", "precision", "packed"),
)
def generate_fn(
    g_params,
    z,
    alpha,
    config: pro_gan.ProGANConfig,
    stage: int,
    dtype=jnp.float32,
    use_pallas: bool = False,
    precision=None,
    packed: bool = False,
):
    """Latent [B, L] -> uint8 images [B, R, R, 3].

    ``precision``: None/"default" (1-pass bf16 MXU, ~48 dB vs the fp32 CPU
    reference at 1024²), "fast" (cheapest grade above the 50 dB parity bar —
    the packed kernels' 2-term split), "high" (parity grade, ~73 dB),
    "highest" (6-pass).

    ``packed``: route eligible late stages through the phase-blocked Pallas
    kernels (ops/pallas_packed.py) — the TPU production configuration. On
    that path the tanh->uint8 denorm is fused into the final kernel's
    epilogue (byte-packed int32 write, 8x smaller — pro_gan.generator_apply;
    PROBGAN_FUSED_UINT8=0 restores the XLA denorm)."""
    if use_pallas:
        rgb = pro_gan.generator_rgb(
            g_params, z, config, stage, alpha, dtype, precision, packed=packed
        )
        return pallas_image.to_uint8_fused(rgb)
    return pro_gan.generator_apply(
        g_params, z, config, stage, alpha, dtype, precision, packed=packed
    )


@partial(
    jax.jit,
    static_argnames=("config", "stage", "dtype", "precision", "packed"),
)
def score_fn(d_params, images, alpha, config: pro_gan.ProGANConfig, stage: int,
             dtype=jnp.float32, precision=None, packed: bool = False):
    """Float images (~[-1, 1]) -> realness logits [B]. ``packed`` routes the
    leading lane-wasteful D stages through the phase-blocked Pallas kernels
    (scoring only — training always uses the XLA path)."""
    return pro_gan.discriminator_apply(
        d_params, images, config, stage, alpha, dtype, precision,
        packed=packed,
    )


@partial(
    jax.jit,
    static_argnames=(
        "config", "stage", "frames", "dtype", "use_pallas", "precision", "chunk",
        "packed",
    ),
)
def latent_walk_fn(
    g_params,
    z0,
    z1,
    alpha,
    config: pro_gan.ProGANConfig,
    stage: int,
    frames: int,
    dtype=jnp.float32,
    use_pallas: bool = False,
    precision=None,
    chunk: int = 8,
    packed: bool = False,
):
    """Interpolate z0 -> z1 in ``frames`` steps and render each
    (BASELINE config 4: 512² 64-frame z-walk). Linear interpolation in
    z-space. Frames render in ``chunk``-sized generator batches via lax.map —
    a 64-frame 512² walk as ONE batch needs ~16 GB of fp32 activations
    (> one chip's HBM); chunking bounds peak memory at chunk-batch size while
    keeping a single compiled graph."""
    t = jnp.linspace(0.0, 1.0, frames, dtype=z0.dtype)[:, None]
    z = z0[None, :] * (1.0 - t) + z1[None, :] * t
    if frames <= chunk:
        return generate_fn(
            g_params, z, alpha, config, stage, dtype, use_pallas, precision, packed
        )
    pad = (-frames) % chunk
    z = jnp.pad(z, ((0, pad), (0, 0)))
    z_chunks = z.reshape(-1, chunk, z.shape[-1])

    def render(zc):
        return generate_fn(
            g_params, zc, alpha, config, stage, dtype, use_pallas, precision, packed
        )

    imgs = jax.lax.map(render, z_chunks)
    imgs = imgs.reshape(-1, *imgs.shape[2:])
    return imgs[:frames]


class ImageGANEngine:
    """Stateful wrapper: owns params, RNG stream, and device placement."""

    def __init__(
        self,
        config: pro_gan.ProGANConfig,
        g_params=None,
        d_params=None,
        device: str = "auto",
        seed: int = 0,
        dtype=jnp.float32,
        use_pallas: bool | None = None,
        mesh=None,
        precision: str | None = "high",
    ):
        """``mesh``: None/""/1 single-device; "auto"/int/Mesh — generation
        runs data-parallel over all mesh devices (parallel/sharded_image.py),
        latents sharded, params replicated.

        ``precision``: the serving grade — "high" (default: parity-grade,
        the configuration every published number uses; on the packed path
        the G ladder promotes it to the fp32-exact kernel mode and the D
        ladder to the 3-term split), "highest", or None/"default" (1-pass
        bf16, ~48 dB)."""
        from probgan_tpu.parallel.mesh import resolve_mesh

        self.config = config
        self.device = resolve_device(device)
        self.mesh = resolve_mesh(mesh)
        self.dtype = dtype
        self.precision = precision
        if use_pallas is None:
            import os

            use_pallas = os.environ.get("PROBGAN_PALLAS_UINT8", "0") == "1"
        self.use_pallas = use_pallas
        self.packed = packed_default() and dtype == jnp.float32
        self._rng = RngStream(seed)

        # Init on the CPU backend (eager init on an accelerator costs one
        # small compile per weight shape), then place on the target device.
        if g_params is None or d_params is None:
            with jax.default_device(jax.devices("cpu")[0]):
                key = jax.random.fold_in(jax.random.key(seed), 0xC0FFEE)
                kg, kd = jax.random.split(key)
                if g_params is None:
                    g_params = pro_gan.init_generator(kg, config)
                if d_params is None:
                    d_params = pro_gan.init_discriminator(kd, config)
        if self.mesh is not None:
            # Replicate ONCE over the mesh: the DP serving paths otherwise
            # re-transfer the full tree from its single home device on every
            # call (and jit would partition a single-device-committed tree).
            from probgan_tpu.parallel.sharded_image import replicate_params

            self.g_params = replicate_params(self.mesh, g_params)
            self.d_params = replicate_params(self.mesh, d_params)
        else:
            put = partial(jax.device_put, device=self.device)
            self.g_params = jax.tree.map(put, g_params)
            self.d_params = jax.tree.map(put, d_params)

    @property
    def final_stage(self) -> int:
        return self.config.num_stages - 1

    def sample_latents(self, n: int) -> jax.Array:
        key = self._rng.next_key("sample_latents")
        return jax.device_put(
            jax.random.normal(key, (n, self.config.latent_dim), dtype=jnp.float32),
            self.device,
        )

    def generate(self, latents, stage: int | None = None, alpha: float = 1.0) -> np.ndarray:
        if stage is None:
            stage = self.final_stage
        if self.mesh is not None:
            from probgan_tpu.parallel.sharded_image import dp_generate

            z = jnp.asarray(latents, jnp.float32)
            n_dev = self.mesh.devices.size
            pad = (-z.shape[0]) % n_dev
            n = z.shape[0]
            if pad:  # data-parallel sharding needs an even split
                z = jnp.pad(z, ((0, pad), (0, 0)))
            with task_trace("generate_images"):
                img = dp_generate(
                    self.mesh, self.g_params, z, self.config, stage, alpha,
                    self.dtype, self.precision, packed=self.packed,
                )
                return np.asarray(jax.device_get(img))[:n]
        z = jax.device_put(jnp.asarray(latents, jnp.float32), self.device)
        with task_trace("generate_images"):
            img = generate_fn(
                self.g_params, z, jnp.float32(alpha), self.config, stage,
                self.dtype, self.use_pallas, self.precision, self.packed,
            )
            return np.asarray(jax.device_get(img))

    def score(self, images, stage: int | None = None, alpha: float = 1.0) -> np.ndarray:
        if stage is None:
            stage = self.final_stage
        x = jnp.asarray(images, jnp.float32)
        if self.mesh is not None and x.shape[0] % self.mesh.devices.size == 0:
            from probgan_tpu.parallel.sharded_image import dp_score

            with task_trace("score_images"):
                logits = dp_score(
                    self.mesh, self.d_params, x, self.config, stage, alpha,
                    self.dtype, self.precision, packed=self.packed,
                )
                return np.asarray(jax.device_get(logits))
        if self.mesh is not None:
            # Batch doesn't divide the mesh (minibatch stddev forbids
            # padding): run replicated — every device computes the full
            # batch, logits identical to single-device.
            from jax.sharding import NamedSharding, PartitionSpec as P

            x = jax.device_put(x, NamedSharding(self.mesh, P()))
        else:
            x = jax.device_put(x, self.device)
        with task_trace("score_images"):
            return np.asarray(
                jax.device_get(
                    score_fn(
                        self.d_params, x, jnp.float32(alpha), self.config,
                        stage, self.dtype, self.precision, self.packed,
                    )
                )
            )

    def latent_walk(
        self, z0, z1, frames: int = 64, stage: int | None = None, alpha: float = 1.0
    ) -> np.ndarray:
        if stage is None:
            stage = self.final_stage
        if self.mesh is not None:
            # DP walk: interpolate on host math (identical to latent_walk_fn's
            # linspace lerp), render the frame batch data-parallel.
            from probgan_tpu.parallel.sharded_image import dp_generate

            z0j = jnp.asarray(z0, jnp.float32)
            z1j = jnp.asarray(z1, jnp.float32)
            t = jnp.linspace(0.0, 1.0, frames, dtype=jnp.float32)[:, None]
            z = z0j[None, :] * (1.0 - t) + z1j[None, :] * t
            n_dev = self.mesh.devices.size
            pad = (-frames) % n_dev
            if pad:
                z = jnp.pad(z, ((0, pad), (0, 0)))
            with task_trace("latent_walk"):
                img = dp_generate(
                    self.mesh, self.g_params, z, self.config, stage, alpha,
                    self.dtype, self.precision, packed=self.packed,
                )
                return np.asarray(jax.device_get(img))[:frames]
        z0 = jax.device_put(jnp.asarray(z0, jnp.float32), self.device)
        z1 = jax.device_put(jnp.asarray(z1, jnp.float32), self.device)
        with task_trace("latent_walk"):
            img = latent_walk_fn(
                self.g_params, z0, z1, jnp.float32(alpha), self.config, stage,
                frames, self.dtype, self.use_pallas, self.precision, 8,
                self.packed,
            )
            return np.asarray(jax.device_get(img))
