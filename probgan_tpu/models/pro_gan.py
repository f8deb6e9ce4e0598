"""Progressive image-synthesis GAN (the BASELINE.json north-star model family).

This model family has NO reference file — the reference repo contains no image
ops (SURVEY.md §0.2) — it is mandated by /root/repo/BASELINE.json:
latent sampling -> PixelNorm -> equalized-LR conv blocks -> progressive
upsample + toRGB alpha-blend -> tanh/denorm to uint8, plus a mirrored
downsample/conv discriminator for scoring and training.

Design notes (TPU-first):

- NHWC layout, 3x3 SAME convs — the layouts XLA tiles best onto the MXU.
- Equalized learning rate: weights are stored ~N(0,1) and scaled by the He
  constant sqrt(2/fan_in) at apply time (Karras et al., ProGAN).
- ``stage`` is a static Python int (one compiled graph per benchmark
  resolution); ``alpha`` is a traced scalar so the 256² fade-in config runs a
  single compiled graph for any alpha (SURVEY.md §7.3).
- Compute dtype is configurable: fp32 for bit-parity golden tests vs the CPU
  reference, bf16 for throughput (params always fp32; casts at block edges).
- The tanh -> scale -> round -> clip -> uint8 denorm is a separate op
  (``to_uint8``) so the Pallas-fused variant can swap in (ops/pallas_image.py).

Resolution of stage s is ``4 * 2**s``; channels ``nf(s) = min(fmap_base //
2**s, fmap_max)``.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any

import jax
import jax.numpy as jnp
from jax.ad_checkpoint import checkpoint_name

LRELU_SLOPE = 0.2
_PIXELNORM_EPS = 1e-8

# Rematerialization policy for the training-step backward pass. Full-block
# jax.checkpoint re-runs every conv in the backward — the expensive part.
# Instead the conv outputs are tagged (checkpoint_name below) and SAVED;
# only the elementwise chains between convs (upsample, lrelu, pixel_norm,
# avg-pool) rematerialize — bandwidth-cheap and FLOP-free. Numerically
# identical to full remat / no remat (recompute is deterministic); memory
# sits between them (2 saved tensors per block vs 1 vs ~6): ~2 GB of
# residuals for the 1024² b2 step vs >16 GB un-remat'ed at fp32.
_REMAT_POLICY = jax.checkpoint_policies.save_only_these_names("conv_out")


@dataclasses.dataclass(frozen=True)
class ProGANConfig:
    resolution: int = 1024
    latent_dim: int = 512
    fmap_base: int = 8192
    fmap_max: int = 512
    num_channels: int = 3

    @property
    def num_stages(self) -> int:
        return int(math.log2(self.resolution // 4)) + 1

    def nf(self, stage: int) -> int:
        return min(self.fmap_base // (2**stage), self.fmap_max)


def stage_resolution(stage: int) -> int:
    return 4 * 2**stage


def _fuse_upsample_enabled() -> bool:
    import os

    return os.environ.get("PROBGAN_FUSE_UPCONV", "1") != "0"


# ---------------------------------------------------------------------------
# equalized-LR primitives
# ---------------------------------------------------------------------------

def _eq_conv_init(key: jax.Array, kh: int, kw: int, cin: int, cout: int) -> dict:
    w = jax.random.normal(key, (kh, kw, cin, cout), dtype=jnp.float32)
    return {"w": w, "b": jnp.zeros((cout,), dtype=jnp.float32)}


def _eq_dense_init(key: jax.Array, fin: int, fout: int) -> dict:
    w = jax.random.normal(key, (fin, fout), dtype=jnp.float32)
    return {"w": w, "b": jnp.zeros((fout,), dtype=jnp.float32)}


def _he_scale(fan_in: int, gain: float = math.sqrt(2.0)) -> float:
    return gain / math.sqrt(fan_in)


def eq_scaled_conv_w(pr: dict) -> jax.Array:
    """Equalized-LR 3x3 conv weights with the He scale baked in — the
    weight operand the packed Pallas kernels consume (shared by the packed
    G/D forward paths and the VJP train paths)."""
    w = pr["w"]
    return w * _he_scale(w.shape[0] * w.shape[1] * w.shape[2])


# MXU precision for convs/matmuls: None -> the jax default (single-pass
# bf16 on TPU, ~48 dB vs the fp32 CPU reference at 1024²); "high" -> 3-pass
# fp32 emulation (~73 dB, the parity-grade setting); "highest" -> 6-pass.
# "fast" is the throughput serving grade: on the packed Pallas path it maps
# to the kernels' 2-term "mid" split (above the 50 dB north-star bar, well
# under parity grade — see _PACKED_MODES); on the XLA fallback it resolves
# to HIGH (XLA has no 2-pass mode; HIGH clears the bar at ~73 dB).
_PRECISIONS = {
    None: None,
    "default": jax.lax.Precision.DEFAULT,
    "fast": jax.lax.Precision.HIGH,
    "high": jax.lax.Precision.HIGH,
    "highest": jax.lax.Precision.HIGHEST,
}


def resolve_precision(precision):
    return _PRECISIONS[precision] if isinstance(precision, (str, type(None))) else precision


def _maybe_emulate_bf16(x: jax.Array, w: jax.Array, precision):
    """Resolve the TEST-ONLY "emulate_bf16" precision sentinel for the XLA
    conv/dense path: round both operands to bf16 and run the op exact with
    fp32 accumulation — the TPU MXU's 1-pass DEFAULT arithmetic, portable to
    CPU (where Precision.DEFAULT is exact fp32 and any bf16-sensitivity
    measurement would be vacuous). Mirrors ops/pallas_packed.py's
    "emulate_bf16" kernel mode; the serving/training ladders never map to
    it — it exists for CPU PSNR regression tests and the per-stage error
    budget study (benchmarks/stage_error_budget.py)."""
    if precision == "emulate_bf16":
        rnd = lambda a: a.astype(jnp.bfloat16).astype(jnp.float32)
        return rnd(x), rnd(w), jax.lax.Precision.HIGHEST
    return x, w, resolve_precision(precision)


def eq_conv(
    params: dict, x: jax.Array, gain: float = math.sqrt(2.0), precision=None
) -> jax.Array:
    """3x3/1x1 SAME conv with runtime He scaling (equalized LR)."""
    w = params["w"]
    kh, kw, cin, _ = w.shape
    scale = _he_scale(kh * kw * cin, gain)
    w = (w * scale).astype(x.dtype)
    x_op, w, prec = _maybe_emulate_bf16(x, w, precision)
    out = jax.lax.conv_general_dilated(
        x_op,
        w,
        window_strides=(1, 1),
        padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        precision=prec,
    )
    return out + params["b"].astype(x.dtype)


def eq_dense(
    params: dict, x: jax.Array, gain: float = math.sqrt(2.0), precision=None
) -> jax.Array:
    w = params["w"]
    scale = _he_scale(w.shape[0], gain)
    x_op, w_op, prec = _maybe_emulate_bf16(x, (w * scale).astype(x.dtype), precision)
    return jnp.matmul(x_op, w_op, precision=prec) + params["b"].astype(x.dtype)


def lrelu(x: jax.Array) -> jax.Array:
    return jax.nn.leaky_relu(x, negative_slope=LRELU_SLOPE)


def pixel_norm(x: jax.Array) -> jax.Array:
    """Normalize each pixel's feature vector: x / sqrt(mean(x^2) + eps)."""
    return x * jax.lax.rsqrt(
        jnp.mean(jnp.square(x), axis=-1, keepdims=True) + _PIXELNORM_EPS
    )


def upsample_nearest_2x(x: jax.Array) -> jax.Array:
    """[B,H,W,C] -> [B,2H,2W,C] nearest-neighbor."""
    x = jnp.repeat(x, 2, axis=1)
    return jnp.repeat(x, 2, axis=2)


def downsample_avg_2x(x: jax.Array) -> jax.Array:
    """[B,H,W,C] -> [B,H/2,W/2,C] 2x2 mean pool."""
    b, h, w, c = x.shape
    x = x.reshape(b, h // 2, 2, w // 2, 2, c)
    return jnp.mean(x, axis=(2, 4))


def to_uint8(rgb: jax.Array) -> jax.Array:
    """tanh -> [0,255] denorm -> round -> clip -> uint8 (BASELINE.json
    north_star's final stage; fused Pallas variant in ops/pallas_image.py)."""
    x = jnp.tanh(rgb.astype(jnp.float32))
    x = (x + 1.0) * 127.5
    return jnp.clip(jnp.round(x), 0.0, 255.0).astype(jnp.uint8)


# ---------------------------------------------------------------------------
# Generator
# ---------------------------------------------------------------------------

def init_generator(key: jax.Array, config: ProGANConfig) -> dict:
    """Params: base dense + per-stage double-conv blocks + per-stage toRGB."""
    n = config.num_stages
    keys = iter(jax.random.split(key, 2 + 3 * n))
    params: dict[str, Any] = {
        "base_dense": _eq_dense_init(next(keys), config.latent_dim, config.nf(0) * 16),
        "base_conv": _eq_conv_init(next(keys), 3, 3, config.nf(0), config.nf(0)),
        "blocks": [],
        "to_rgb": [],
    }
    for s in range(1, n):
        params["blocks"].append(
            {
                "conv1": _eq_conv_init(next(keys), 3, 3, config.nf(s - 1), config.nf(s)),
                "conv2": _eq_conv_init(next(keys), 3, 3, config.nf(s), config.nf(s)),
            }
        )
    for s in range(n):
        params["to_rgb"].append(
            _eq_conv_init(next(keys), 1, 1, config.nf(s), config.num_channels)
        )
    return params


def _g_base(params: dict, z: jax.Array, config: ProGANConfig, dtype,
            precision=None) -> jax.Array:
    z = pixel_norm(z.astype(dtype))
    x = eq_dense(params["base_dense"], z, precision=precision)
    x = x.reshape(z.shape[0], 4, 4, config.nf(0))
    x = pixel_norm(lrelu(x))
    x = pixel_norm(lrelu(eq_conv(params["base_conv"], x, precision=precision)))
    return x


def _g_block(block: dict, x: jax.Array, precision=None) -> jax.Array:
    if _fuse_upsample_enabled():
        # Fused upsample-into-conv (ops/fused_upconv.py): never materializes
        # the 2x-upsampled tensor and pre-sums duplicated taps — exact up to
        # float reassociation. Disable with PROBGAN_FUSE_UPCONV=0.
        from probgan_tpu.ops.fused_upconv import upsample2x_conv3x3

        w = block["conv1"]["w"]
        kh, kw, cin, _ = w.shape
        scale = _he_scale(kh * kw * cin)
        # emulate_bf16 rounds the PRE-SUMMED weights — faithful to what the
        # MXU sees on this fused path, where tap pre-summing happens in fp32
        # upstream of the dot's operand rounding.
        x_op, w_op, prec = _maybe_emulate_bf16(x, w * scale, precision)
        x = upsample2x_conv3x3(
            w_op, block["conv1"]["b"], x_op,
            precision=prec,
        )
        x = pixel_norm(lrelu(checkpoint_name(x, "conv_out")))
    else:
        x = upsample_nearest_2x(x)
        x = pixel_norm(lrelu(checkpoint_name(
            eq_conv(block["conv1"], x, precision=precision), "conv_out"
        )))
    x = pixel_norm(lrelu(checkpoint_name(
        eq_conv(block["conv2"], x, precision=precision), "conv_out"
    )))
    return x


def generator_features(
    params: dict, z: jax.Array, config: ProGANConfig, stage: int,
    dtype=jnp.float32, precision=None, remat: bool = False,
) -> tuple[jax.Array, jax.Array | None]:
    """Run the trunk to ``stage``; returns (x_stage, x_prev_or_None).

    ``remat=True`` checkpoints each stage block under _REMAT_POLICY: conv
    outputs stay saved, the elementwise chains between them rematerialize —
    required to fit the 1024² G/D train step in one chip's HBM (the
    un-remat'ed backward exceeds 16 GB at batch 2 fp32) without re-running
    any conv in the backward (full-block remat measured 12% slower on the
    bf16 1024² b2 step; benchmarks/RESULTS.md round 3)."""
    block_fn = _g_block
    if remat:
        block_fn = jax.checkpoint(
            _g_block, static_argnums=(2,), policy=_REMAT_POLICY
        )
    x = _g_base(params, z, config, dtype, precision)
    prev = None
    for s in range(1, stage + 1):
        prev = x
        x = block_fn(params["blocks"][s - 1], x, precision)
    return x, prev


def packed_start_stage(config: ProGANConfig, stage: int) -> int | None:
    """First stage the phase-blocked Pallas path (ops/pallas_packed.py) can
    take over, or None. Packed stages need nf <= 64 (where NHWC lane padding
    wastes >= 2x of every HBM access) and an entry resolution >= 128 so the
    per-phase lane count stays a 128 multiple."""
    s_min = stage
    while s_min >= 1 and config.nf(s_min) <= 64:
        s_min -= 1
    s_min += 1
    s0 = max(s_min, 6)  # stage_resolution(5) = 128: minimum aligned entry
    if s0 > stage:
        return None
    return s0


# Ladder mapping for the packed path. "high" maps to the kernels' "highest"
# (fp32 6-pass) mode: the split-3 bf16 kernel mode lands at ~55 dB end-to-end
# (uint8 rounding amplifies its ~4e-6 per-dot error) — above the 50 dB
# north-star bar but below the ~73 dB grade "high" advertises, and
# packed-highest at 93 img/s already beats XLA-high (57 img/s) by 1.6x
# (measured 1024² b8; benchmarks/RESULTS.md round 2).
_PACKED_MODES = {
    None: "default",
    "default": "default",
    jax.lax.Precision.DEFAULT: "default",
    # "fast": the cheapest mode measured >= 50 dB end-to-end at 1024²
    # (benchmarks/packed_psnr.py 48-cell sweep — 8 weight seeds x batches
    # {1,2,8} x alphas {0.3,1.0}: min 50.0 / mean 53.8 dB; the 2-term "mid"
    # sweeps at min 51.2 / mean 55.5). The key is that the fast GRADE keeps
    # the early XLA stages at 3-pass HIGH (cheap — they are ~18% of the
    # forward) so only the packed late stages run 1-pass bf16; an all-
    # default pipeline measures ~48 dB, below the bar. Serving grade only;
    # never used by golden tests.
    "fast": "default",
    "high": "highest",
    jax.lax.Precision.HIGH: "highest",
    "highest": "highest",
    jax.lax.Precision.HIGHEST: "highest",
}


def _g_late_packed(
    params: dict,
    x_entry: jax.Array,  # NHWC features of stage s0-1
    config: ProGANConfig,
    s0: int,
    stage: int,
    alpha,
    precision,
    emit: str = "rgb",  # "rgb" (pre-tanh fp32) | "uint8" (fused denorm)
) -> jax.Array:
    """Run stages [s0, stage] with the phase-blocked Pallas kernels and
    return the blended pre-tanh RGB in NHWC. Inference-only (no VJP).

    PROBGAN_STAGE_FUSED=1 opts into ONE stage-fused kernel per stage
    (packed_upconv_conv / packed_upconv_conv_rgb) — conv1's feature map
    never touches HBM (bitwise-identical results per mode; tests assert
    it). Like PROBGAN_PACKED, the env var is captured at TRACE time: it is
    not part of the jit cache key, so flipping it after the first compile
    for a given (config, stage, precision, packed) has no effect until the
    process (or jit cache) restarts. Measured a WASH at the production shapes (0.90-1.16x per
    stage/mode, benchmarks/stage_fused_bench.py): the late stages are
    MXU-pass-bound at fp32-grade precision, not bandwidth-bound, and the
    fused kernel re-computes 2 boundary conv1 row-pairs per panel — so the
    two-kernel path stays the default."""
    import os

    from probgan_tpu.ops import pallas_packed as pk

    mode = _PACKED_MODES[precision]
    # Per-stage mix "base+final": non-final packed stages run ``base``,
    # the FINAL stage runs ``final``. Rationale (benchmarks/
    # stage_error_budget.py + the r4 48-cell sweeps): per-stage errors add
    # ~uniformly, and the final stage is the most expensive one — upgrading
    # only it buys ~+1 dB worst-case for roughly half of all-"mid"'s 19%
    # cost. With a single packed stage (s0 == stage) the mix degenerates to
    # pure ``final``.
    if "+" in mode:
        base_mode, final_mode = mode.split("+")
    else:
        base_mode = final_mode = mode
    stage_fused = os.environ.get("PROBGAN_STAGE_FUSED", "0") == "1"
    conv_w = eq_scaled_conv_w

    def rgb_w(p):  # toRGB: 1x1 conv, gain 1 -> [C, 3]
        w = p["w"]
        return (w * _he_scale(w.shape[2], gain=1.0))[0, 0]

    emit_uint8 = emit == "uint8"
    x = pk.nhwc_to_packed(x_entry.astype(jnp.float32))
    p = 1
    for s in range(s0, stage + 1):
        block = params["blocks"][s - 1]
        m = final_mode if s == stage else base_mode
        if stage_fused:
            if s == stage:
                rgb = pk.packed_upconv_conv_rgb(
                    x, conv_w(block["conv1"]), block["conv1"]["b"],
                    conv_w(block["conv2"]), block["conv2"]["b"],
                    rgb_w(params["to_rgb"][s]), params["to_rgb"][s]["b"],
                    rgb_w(params["to_rgb"][s - 1]),
                    params["to_rgb"][s - 1]["b"],
                    jnp.asarray(alpha, jnp.float32), p, mode=m,
                    emit_uint8=emit_uint8,
                )
                if emit_uint8:
                    return pk.packed_u32_to_nhwc_uint8(rgb, 2 * p)
                return pk.packed_rgb_to_nhwc(rgb, 2 * p)
            x = pk.packed_upconv_conv(
                x, conv_w(block["conv1"]), block["conv1"]["b"],
                conv_w(block["conv2"]), block["conv2"]["b"], p, mode=m,
            )
            p *= 2
            continue
        if s == stage:
            feats, rgb_prev8 = pk.packed_upconv(
                x, conv_w(block["conv1"]), block["conv1"]["b"], p, mode=m,
                rgb_w=rgb_w(params["to_rgb"][s - 1]),
                rgb_b=params["to_rgb"][s - 1]["b"],
            )
        else:
            feats = pk.packed_upconv(
                x, conv_w(block["conv1"]), block["conv1"]["b"], p, mode=m
            )
        p *= 2
        if s == stage:
            rgb = pk.packed_conv_rgb(
                feats, conv_w(block["conv2"]), block["conv2"]["b"],
                rgb_w(params["to_rgb"][s]), params["to_rgb"][s]["b"],
                rgb_prev8, jnp.asarray(alpha, jnp.float32), p, mode=m,
                emit_uint8=emit_uint8,
            )
            if emit_uint8:
                return pk.packed_u32_to_nhwc_uint8(rgb, p)
            return pk.packed_rgb_to_nhwc(rgb, p)
        x = pk.packed_conv(
            feats, conv_w(block["conv2"]), block["conv2"]["b"], p, mode=m
        )
    raise AssertionError("unreachable")


def _g_rgb_packed_train(
    params: dict,
    z: jax.Array,
    config: ProGANConfig,
    s0: int,
    stage: int,
    alpha,
    dtype,
    precision,
    mode: str,
    remat: bool,
) -> jax.Array:
    """Differentiable packed generator: stages [s0, stage] run on the
    phase-blocked Pallas kernels through their custom VJPs
    (ops/packed_vjp.upconv_lrelu_norm / conv_lrelu_norm), so the training
    step's G forward AND backward use the kernels for the lane-wasteful
    late stages. toRGB + the progressive blend stay in XLA on NHWC (1x1
    convs at 3 output channels — no lane waste to recover, and the layout
    unpacks are pure transposes). The VJP ops save only their inputs and
    recompute activations in the backward, so no extra remat wrapping is
    needed for the packed stages."""
    from probgan_tpu.ops import packed_vjp, pallas_packed as pk

    block_fn = _g_block
    if remat:
        block_fn = jax.checkpoint(
            _g_block, static_argnums=(2,), policy=_REMAT_POLICY
        )

    conv_w = eq_scaled_conv_w

    x = _g_base(params, z, config, dtype, precision)
    for s in range(1, s0):
        x = block_fn(params["blocks"][s - 1], x, precision)
    prev_nhwc = x.astype(jnp.float32)  # stage s0-1 features (blend operand)
    xp = pk.nhwc_to_packed(prev_nhwc)
    p = 1
    for s in range(s0, stage + 1):
        if s == stage and s > s0:
            prev_nhwc = pk.packed_rgb_to_nhwc(xp, p)
        block = params["blocks"][s - 1]
        xp = packed_vjp.upconv_lrelu_norm(
            xp, conv_w(block["conv1"]), block["conv1"]["b"], p, mode
        )
        p *= 2
        xp = packed_vjp.conv_lrelu_norm(
            xp, conv_w(block["conv2"]), block["conv2"]["b"], p, mode
        )
    # The kernels compute/emit fp32; cast back so the toRGB/blend tail
    # runs at the step's dtype like the XLA path.
    y = pk.packed_rgb_to_nhwc(xp, p).astype(dtype)
    rgb = eq_conv(params["to_rgb"][stage], y, gain=1.0, precision=precision)
    rgb_prev = upsample_nearest_2x(
        eq_conv(params["to_rgb"][stage - 1], prev_nhwc.astype(dtype),
                gain=1.0, precision=precision)
    )
    a = jnp.asarray(alpha, dtype=rgb.dtype)
    return rgb_prev + a * (rgb - rgb_prev)


def generator_rgb(
    params: dict,
    z: jax.Array,
    config: ProGANConfig,
    stage: int,
    alpha: jax.Array | float = 1.0,
    dtype=jnp.float32,
    precision=None,
    remat: bool = False,
    packed: bool = False,
    packed_mode: str | None = None,
) -> jax.Array:
    """Latent -> pre-tanh RGB at resolution ``4 * 2**stage`` with progressive
    alpha blend: lerp(upsample(toRGB_{s-1}(x_{s-1})), toRGB_s(x_s), alpha).

    ``packed=True`` routes the eligible late stages (packed_start_stage)
    through the phase-blocked Pallas kernel path — the production inference
    configuration on TPU. That path is forward-only (fused toRGB/uint8
    kernels define no VJP); training and any non-fp32 dtype use the XLA
    path regardless. ``packed_mode`` instead selects the DIFFERENTIABLE
    packed path (_g_rgb_packed_train): late-stage convs on the kernels via
    custom VJPs at the given kernel grade, toRGB/blend in XLA — the train
    step's configuration (any dtype)."""
    if packed_mode is not None and stage > 0:
        s0 = packed_start_stage(config, stage)
        if s0 is not None:
            return _g_rgb_packed_train(
                params, z, config, s0, stage, alpha, dtype, precision,
                packed_mode, remat,
            )
    s0 = None
    if packed and dtype == jnp.float32:
        s0 = packed_start_stage(config, stage)
    if s0 is not None:
        x = _g_base(params, z, config, dtype, precision)
        for s in range(1, s0):
            x = _g_block(params["blocks"][s - 1], x, precision)
        return _g_late_packed(params, x, config, s0, stage, alpha, precision)
    x, prev = generator_features(params, z, config, stage, dtype, precision, remat)
    rgb = eq_conv(params["to_rgb"][stage], x, gain=1.0, precision=precision)
    if stage > 0:
        rgb_prev = upsample_nearest_2x(
            eq_conv(params["to_rgb"][stage - 1], prev, gain=1.0, precision=precision)
        )
        alpha = jnp.asarray(alpha, dtype=rgb.dtype)
        rgb = rgb_prev + alpha * (rgb - rgb_prev)
    return rgb


def _fused_uint8_enabled() -> bool:
    """Gate for the fused tanh->uint8 packed epilogue (the north star's
    final stage inside the kernel: the last HBM write shrinks 8x from
    8-channel fp32 RGB to byte-packed int32). Captured at TRACE time like
    PROBGAN_PACKED. Default ON; PROBGAN_FUSED_UINT8=0 restores the XLA
    denorm (uint8 outputs are bit-identical either way — parity-tested)."""
    import os

    return os.environ.get("PROBGAN_FUSED_UINT8", "1") != "0"


def generator_apply(
    params: dict,
    z: jax.Array,
    config: ProGANConfig,
    stage: int,
    alpha: jax.Array | float = 1.0,
    dtype=jnp.float32,
    precision=None,
    packed: bool = False,
) -> jax.Array:
    """Full image path: latent -> uint8 image [B, R, R, 3]."""
    s0 = None
    if packed and dtype == jnp.float32 and _fused_uint8_enabled():
        s0 = packed_start_stage(config, stage)
    if s0 is not None:
        x = _g_base(params, z, config, dtype, precision)
        for s in range(1, s0):
            x = _g_block(params["blocks"][s - 1], x, precision)
        return _g_late_packed(params, x, config, s0, stage, alpha, precision,
                              emit="uint8")
    return to_uint8(
        generator_rgb(params, z, config, stage, alpha, dtype, precision,
                      packed=packed)
    )


# ---------------------------------------------------------------------------
# Discriminator
# ---------------------------------------------------------------------------

def init_discriminator(key: jax.Array, config: ProGANConfig) -> dict:
    n = config.num_stages
    keys = iter(jax.random.split(key, 3 + 3 * n))
    params: dict[str, Any] = {
        "from_rgb": [
            _eq_conv_init(next(keys), 1, 1, config.num_channels, config.nf(s))
            for s in range(n)
        ],
        "blocks": [],
        # final 4x4 block (input has +1 channel from minibatch stddev)
        "final_conv": _eq_conv_init(next(keys), 3, 3, config.nf(0) + 1, config.nf(0)),
        "final_dense": _eq_dense_init(next(keys), config.nf(0) * 16, config.nf(0)),
        "out_dense": _eq_dense_init(next(keys), config.nf(0), 1),
    }
    for s in range(1, n):
        params["blocks"].append(
            {
                "conv1": _eq_conv_init(next(keys), 3, 3, config.nf(s), config.nf(s)),
                "conv2": _eq_conv_init(next(keys), 3, 3, config.nf(s), config.nf(s - 1)),
            }
        )
    return params


def minibatch_stddev(
    x: jax.Array, axis_name: str | tuple[str, ...] | None = None
) -> jax.Array:
    """Append one channel holding the batch-wide mean feature stddev.

    ``axis_name``: when the batch is sharded over a mesh axis (shard_map DP
    scoring, parallel/sharded_image.py), statistics are computed over the
    GLOBAL batch via pmean — mathematically equal to the single-device
    statistics (equal per-device batch sizes), up to float reduction
    order."""
    mean = jnp.mean(x, axis=0, keepdims=True)
    if axis_name is not None:
        mean = jax.lax.pmean(mean, axis_name)
    var = jnp.mean(jnp.square(x - mean), axis=0, keepdims=True)
    if axis_name is not None:
        var = jax.lax.pmean(var, axis_name)
    stddev = jnp.mean(jnp.sqrt(var + 1e-8))
    feat = jnp.full(x.shape[:3] + (1,), stddev, dtype=x.dtype)
    return jnp.concatenate([x, feat], axis=-1)


def _d_block(block: dict, x: jax.Array, precision=None) -> jax.Array:
    x = lrelu(checkpoint_name(
        eq_conv(block["conv1"], x, precision=precision), "conv_out"
    ))
    x = lrelu(checkpoint_name(
        eq_conv(block["conv2"], x, precision=precision), "conv_out"
    ))
    return downsample_avg_2x(x)


# Ladder mapping for the packed DISCRIMINATOR path. Unlike the generator's
# map (which promotes "high" to the kernels' fp32-exact mode for golden-grade
# image parity), D logits need no such grade: "high" maps to the kernels'
# 3-term split — the same accuracy class as XLA's Precision.HIGH it replaces.
# Measured at 1024² b8 (benchmarks/d_score_bench.py): packed wins 1.40x at
# "highest" like-for-like; at "default" (1-pass bf16) XLA's fused conv+pool
# wins 1.12x, so the packed gate declines that mode.
_PACKED_MODES_D = {
    "fast": "mid",
    "high": "high",
    jax.lax.Precision.HIGH: "high",
    "highest": "highest",
    jax.lax.Precision.HIGHEST: "highest",
}


def packed_d_stage_count(
    config: ProGANConfig, stage: int, precision="highest"
) -> int:
    """Number of leading discriminator stages (from ``stage`` down) the
    phase-blocked Pallas path takes — consecutive stages whose channel
    counts are lane-wasteful in NHWC (nf <= 64) and 8-aligned, at
    resolutions >= 256 so the lane count stays 128-aligned. 0 = all-XLA
    (always 0 for precisions outside _PACKED_MODES_D)."""
    if precision not in _PACKED_MODES_D:
        return 0
    n = 0
    s = stage
    while (
        s >= 1
        and config.nf(s) <= 64
        and config.nf(s) % 8 == 0
        and config.nf(s - 1) % 8 == 0
        and stage_resolution(s) >= 256
    ):
        n += 1
        s -= 1
    return n


def _d_early_packed(
    params: dict,
    image: jax.Array,  # [B, R, R, 3] float, fp32
    config: ProGANConfig,
    stage: int,
    alpha,
    precision,
    n: int,
    mode: str | None = None,
) -> jax.Array:
    """Run fromRGB + the first ``n`` discriminator blocks with the
    phase-blocked Pallas kernels (conv epilogue "lrelu", pool fused into
    conv2); returns NHWC features at stage ``stage - n``. The phase count
    enters at P = 2^n and HALVES at each pool (column pooling is a
    phase-block pair average), exiting at P = 1. Differentiable: the
    kernels are wrapped in custom VJPs (ops/packed_vjp.py) whose backward
    runs the same packed layout, so this path serves scoring AND the
    training step's D forward/backward. ``mode`` overrides the
    precision-ladder mapping (the train step picks its dtype's grade)."""
    from probgan_tpu.ops import packed_vjp, pallas_packed as pk

    if mode is None:
        mode = _PACKED_MODES_D[precision]
    p = 2 ** n

    conv_w = eq_scaled_conv_w

    x = lrelu(eq_conv(params["from_rgb"][stage], image, precision=precision))
    xp = pk.nhwc_to_phase_blocked(x.astype(jnp.float32), p)
    for s in range(stage, stage - n, -1):
        block = params["blocks"][s - 1]
        xp = packed_vjp.conv_lrelu(
            xp, conv_w(block["conv1"]), block["conv1"]["b"], p, mode
        )
        xp = packed_vjp.convpool_lrelu(
            xp, conv_w(block["conv2"]), block["conv2"]["b"], p, mode
        )
        p //= 2
        if s == stage and stage > 0:
            skip = lrelu(
                eq_conv(
                    params["from_rgb"][stage - 1],
                    downsample_avg_2x(image),
                    precision=precision,
                )
            )
            skip_p = pk.nhwc_to_phase_blocked(skip.astype(jnp.float32), p)
            a = jnp.asarray(alpha, jnp.float32)
            xp = skip_p + a * (xp - skip_p)
    return pk.packed_rgb_to_nhwc(xp, 1)  # p == 1 after n pools


def discriminator_apply(
    params: dict,
    image: jax.Array,
    config: ProGANConfig,
    stage: int,
    alpha: jax.Array | float = 1.0,
    dtype=jnp.float32,
    precision=None,
    remat: bool = False,
    packed: bool = False,
    stddev_axis: str | None = None,
    packed_mode: str | None = None,
) -> jax.Array:
    """Image [B, R, R, 3] (float, pre-tanh scale i.e. roughly [-1, 1]) ->
    realness logit [B]. Mirrors the generator's progressive blend: after the
    first down block, lerp with fromRGB of the downsampled image.
    ``remat``: see generator_features. ``packed=True`` routes the leading
    lane-wasteful stages (packed_d_stage_count) through the phase-blocked
    Pallas kernels — differentiable via ops/packed_vjp.py, so the training
    step uses this path too. For scoring the kernel grade follows the
    ``precision`` ladder (fp32 inputs only); ``packed_mode`` overrides it
    directly (any dtype — the train step passes its dtype's grade)."""
    image = image.astype(dtype)
    block_fn = _d_block
    if remat:
        block_fn = jax.checkpoint(
            _d_block, static_argnums=(2,), policy=_REMAT_POLICY
        )
    n = 0
    if packed and packed_mode is not None:
        # Structure-only gate ("highest" is always ladder-mapped): which
        # stages are packable is a shape property, not a precision one.
        n = packed_d_stage_count(config, stage, "highest")
    elif packed and dtype == jnp.float32:
        n = packed_d_stage_count(config, stage, precision)
    if n > 0:
        # The kernels compute/emit fp32; cast back so the remaining XLA
        # stages run at the step's dtype like the non-packed branch.
        x = _d_early_packed(params, image, config, stage, alpha, precision, n,
                            mode=packed_mode).astype(dtype)
    else:
        x = lrelu(eq_conv(params["from_rgb"][stage], image, precision=precision))
    for s in range(stage - n, 0, -1):
        x = block_fn(params["blocks"][s - 1], x, precision)
        if s == stage and stage > 0:
            skip = lrelu(
                eq_conv(
                    params["from_rgb"][stage - 1],
                    downsample_avg_2x(image),
                    precision=precision,
                )
            )
            a = jnp.asarray(alpha, dtype=x.dtype)
            x = skip + a * (x - skip)
    x = minibatch_stddev(x, axis_name=stddev_axis)
    x = lrelu(eq_conv(params["final_conv"], x, precision=precision))
    x = x.reshape(x.shape[0], -1)
    x = lrelu(eq_dense(params["final_dense"], x, precision=precision))
    return eq_dense(params["out_dense"], x, gain=1.0, precision=precision)[..., 0]
