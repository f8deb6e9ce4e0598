"""Custom VJPs for the packed discriminator kernels — Pallas in the
TRAINING path.

The phase-blocked forward kernels (ops/pallas_packed.py) define no JAX
derivative rules, which round 2 worked around by keeping every
differentiated forward on XLA. That left the D train step paying XLA's
backward for the lane-wasteful late stages: measured at 1024² b2 bf16 the
XLA backward costs ~6x its forward (benchmarks/RESULTS.md round 3) because
dgrad/wgrad convs at nf <= 64 waste 4x/2x of every HBM access and vector
lane to 128-lane NHWC padding — the exact pathology the packed layout
removes.

Both backward convs ARE packed-layout convs, so the backward composes from
the same kernels:

- input gradient of a SAME 3x3 stride-1 conv = SAME 3x3 conv of the
  cotangent with the spatially-flipped, channel-transposed weights —
  ``packed_conv(..., epilogue="none")``;
- weight gradient = the input x cotangent correlation —
  ``packed_conv_wgrad`` (one lane-contracting MXU pass per row over the
  same tap-stacked operand the forward builds);
- LeakyReLU's mask comes from the saved OUTPUT's sign (lrelu is
  sign-preserving), so ``conv_lrelu`` stores no pre-activation;
- the 2x2 mean pool's transpose is a nearest-2x upsample scaled by 1/4 —
  in the phase-blocked layout a static row repeat + phase-block
  duplication (``_dup_blocks``), pure XLA lane plumbing;
- ``convpool_lrelu`` never materialized its full-resolution pre-activation
  (that is the kernel's point), so its backward RECOMPUTES it with one
  ``epilogue="none"`` forward pass — rematerialization, chosen over
  storing a full-res mask.

Gradients are exact w.r.t. each kernel's own arithmetic at mode
"highest"; at the training mode "default" the dots round bf16 like the
forward's (tests/test_packed_vjp.py checks both). For the split modes
("mid"/"high") the dgrad conv applies the same term-splitting as the
forward, while packed_conv_wgrad — which has no split implementation —
promotes its dots to HIGHEST, i.e. the weight gradient is at least as
accurate as the requested grade.

Used by models/pro_gan.discriminator_apply for the training path
(packed + VJP) so progan_train_step runs its late-stage D forward AND
backward on the packed kernels (VERDICT r2 next-step #3).

Generator-side ops (``conv_lrelu_norm``, ``upconv_lrelu_norm``) extend the
same recipe to the lrelu+PixelNorm epilogue: PixelNorm's backward needs its
pre-norm input, which both backwards RECOMPUTE with one norm-free forward
pass (recovering it from the normed output is catastrophic fp32
cancellation — see _conv_norm_bwd). The fused upsample+conv's input
gradient is the transposed conv SUM-pooled 2x2 (= 4x ``packed_convpool``
with a "none" epilogue); its weight gradient correlates the transiently
materialized upsampled input with the cotangent.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from probgan_tpu.ops import pallas_packed as pk


def _flip_w(w: jax.Array) -> jax.Array:
    """[3, 3, Cin, Cout] -> the dgrad weights [3, 3, Cout, Cin]: spatial
    flip + channel transpose (conv_transpose of a stride-1 SAME conv)."""
    return jnp.transpose(w[::-1, ::-1], (0, 1, 3, 2))


def _lrelu_bwd(y: jax.Array, g: jax.Array) -> jax.Array:
    """Cotangent through lrelu given its OUTPUT y: lrelu preserves sign
    (y >= 0 iff pre >= 0, matching the kernel's `acc >= 0` branch)."""
    return jnp.where(y >= 0, g, pk.LRELU_SLOPE * g)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def conv_lrelu(x, w, b, p, mode="default"):
    """Differentiable ``packed_conv(..., epilogue="lrelu")``:
    [B, C, H, P*Wp] -> [B, Cout, H, P*Wp]."""
    return pk.packed_conv(x, w, b, p, mode=mode, epilogue="lrelu")


def _conv_lrelu_fwd(x, w, b, p, mode):
    y = pk.packed_conv(x, w, b, p, mode=mode, epilogue="lrelu")
    return y, (x, w, y)


def _conv_lrelu_bwd(p, mode, res, g):
    x, w, y = res
    dpre = _lrelu_bwd(y, g)
    dx = pk.packed_conv(
        dpre, _flip_w(w), jnp.zeros((w.shape[2],), jnp.float32), p,
        mode=mode, epilogue="none",
    )
    dw = pk.packed_conv_wgrad(x, dpre, p, mode=mode)
    db = jnp.sum(dpre, axis=(0, 2, 3))
    return dx, dw, db


conv_lrelu.defvjp(_conv_lrelu_fwd, _conv_lrelu_bwd)


def _unpool_quarter(g: jax.Array, p_out: int) -> jax.Array:
    """Transpose of the kernel's 2x2 mean pool: [B, C, H/2, (P/2)*Wp] ->
    [B, C, H, P*Wp], each input cell's cotangent spread evenly over its
    2x2 source window (row repeat + phase-block duplication, x 1/4)."""
    wp = g.shape[-1] // (p_out // 2)
    g = jnp.repeat(g, 2, axis=2)
    return pk._dup_blocks(g, p_out // 2, wp) * 0.25


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def convpool_lrelu(x, w, b, p, mode="default"):
    """Differentiable ``packed_convpool``:
    [B, C, H, P*Wp] -> [B, Cout, H/2, (P/2)*Wp]."""
    return pk.packed_convpool(x, w, b, p, mode=mode)


def _convpool_fwd(x, w, b, p, mode):
    y = pk.packed_convpool(x, w, b, p, mode=mode)
    return y, (x, w, b)


def _convpool_bwd(p, mode, res, g):
    x, w, b = res
    dact = _unpool_quarter(g, p)
    # The fused kernel never wrote the full-res pre-activation; recompute it
    # for the lrelu mask (one epilogue-free forward — cheaper than storing
    # a full-resolution mask tensor would make the forward).
    pre = pk.packed_conv(x, w, b, p, mode=mode, epilogue="none")
    dpre = _lrelu_bwd(pre, dact)
    dx = pk.packed_conv(
        dpre, _flip_w(w), jnp.zeros((w.shape[2],), jnp.float32), p,
        mode=mode, epilogue="none",
    )
    dw = pk.packed_conv_wgrad(x, dpre, p, mode=mode)
    db = jnp.sum(dpre, axis=(0, 2, 3))
    return dx, dw, db


convpool_lrelu.defvjp(_convpool_fwd, _convpool_bwd)


# ---------------------------------------------------------------------------
# generator-side ops: conv / fused-upconv with the lrelu+PixelNorm epilogue
# ---------------------------------------------------------------------------

def _pixelnorm_bwd(u: jax.Array, g: jax.Array) -> jax.Array:
    """Cotangent through PixelNorm given its INPUT u (post-lrelu, channel
    axis 1): y = u*r with r = rsqrt(mean_c(u^2) + eps), so
    du = r * (g - u * r^2 * mean_c(g*u))."""
    r = jax.lax.rsqrt(
        jnp.mean(u * u, axis=1, keepdims=True) + pk._PIXELNORM_EPS
    )
    return r * (g - u * (r * r) * jnp.mean(g * u, axis=1, keepdims=True))


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def conv_lrelu_norm(x, w, b, p, mode="default"):
    """Differentiable ``packed_conv(..., epilogue="lrelu_norm")`` (the
    generator block's second conv): [B, C, H, P*Wp] -> [B, Cout, H, P*Wp]."""
    return pk.packed_conv(x, w, b, p, mode=mode, epilogue="lrelu_norm")


def _conv_norm_fwd(x, w, b, p, mode):
    y = pk.packed_conv(x, w, b, p, mode=mode, epilogue="lrelu_norm")
    return y, (x, w, b)


def _conv_norm_bwd(p, mode, res, g):
    x, w, b = res
    # PixelNorm's backward needs its INPUT (recovering it from the normed
    # output divides by (1 - mean(y^2)) ~ eps/(m+eps) — catastrophic fp32
    # cancellation), so recompute the post-lrelu pre-norm tensor with one
    # norm-free forward. Its sign is also the lrelu mask.
    u = pk.packed_conv(x, w, b, p, mode=mode, epilogue="lrelu")
    dpre = _lrelu_bwd(u, _pixelnorm_bwd(u, g))
    dx = pk.packed_conv(
        dpre, _flip_w(w), jnp.zeros((w.shape[2],), jnp.float32), p,
        mode=mode, epilogue="none",
    )
    dw = pk.packed_conv_wgrad(x, dpre, p, mode=mode)
    db = jnp.sum(dpre, axis=(0, 2, 3))
    return dx, dw, db


conv_lrelu_norm.defvjp(_conv_norm_fwd, _conv_norm_bwd)


def _up_phase_blocked(x: jax.Array, p_in: int) -> jax.Array:
    """Nearest-2x upsample in the phase-blocked layout: [B, C, H, P_in*Wp]
    -> [B, C, 2H, 2*P_in*Wp] (row repeat + phase-block duplication)."""
    wp = x.shape[-1] // p_in
    return pk._dup_blocks(jnp.repeat(x, 2, axis=2), p_in, wp)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def upconv_lrelu_norm(x, w, b, p_in, mode="default"):
    """Differentiable ``packed_upconv`` (fused nearest-2x upsample + conv3x3
    + bias + LeakyReLU + PixelNorm — the generator block's first conv):
    [B, C, H, P_in*Wp] -> [B, Cout, 2H, (2*P_in)*Wp]."""
    return pk.packed_upconv(x, w, b, p_in, mode=mode)


def _upconv_fwd(x, w, b, p_in, mode):
    y = pk.packed_upconv(x, w, b, p_in, mode=mode)
    return y, (x, w, b)


def _upconv_bwd(p_in, mode, res, g):
    x, w, b = res
    p_out = 2 * p_in
    # Recompute the post-lrelu pre-norm tensor at output resolution (see
    # _conv_norm_bwd on why recovery from y is numerically unusable).
    u = pk.packed_upconv(x, w, b, p_in, mode=mode, epilogue="lrelu")
    dpre = _lrelu_bwd(u, _pixelnorm_bwd(u, g))
    # d/dx of conv(up(x), w): transpose-conv then the upsample's adjoint —
    # a 2x2 SUM pool = 4x the fused conv+mean-pool with a "none" epilogue.
    dx = 4.0 * pk.packed_convpool(
        dpre, _flip_w(w), jnp.zeros((w.shape[2],), jnp.float32), p_out,
        mode=mode, epilogue="none",
    )
    # d/dw: correlation of the (never-materialized-in-fwd) upsampled input
    # with the cotangent; materializing up(x) here is transient and reads
    # the SMALLER-resolution x.
    dw = pk.packed_conv_wgrad(_up_phase_blocked(x, p_in), dpre, p_out,
                              mode=mode)
    db = jnp.sum(dpre, axis=(0, 2, 3))
    return dx, dw, db


upconv_lrelu_norm.defvjp(_upconv_fwd, _upconv_bwd)
