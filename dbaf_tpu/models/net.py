"""DROID network in Flax: feature/context encoders + ConvGRU update operator.

Architecture replicates the reference exactly so the published
TartanAir-pretrained DROID-SLAM checkpoint can be converted and reused:

* ``BasicEncoder`` -- /root/reference/dbaf/modules/extractor.py:118-198
  (6 residual blocks in 3 strided stages, DIM=32, total stride 8);
* ``ConvGRU`` with the sigmoid-gated global-context path --
  /root/reference/dbaf/modules/gru.py:5-32;
* ``UpdateModule`` with corr/flow encoders and 2-channel delta/weight heads
  -- /root/reference/dbaf/droid_net.py:74-142 (the checkpoint's 3-channel
  heads are sliced to 2 at conversion, mirroring dbaf/dbaf.py:42-45);
* ``GraphAgg`` damping/upsample-mask head -- droid_net.py:40-71.

Everything is NHWC (TPU-native conv layout); the weight converter
(:mod:`dbaf_tpu.models.convert`) transposes the torch OIHW kernels.  Module
and layer names mirror the torch attribute paths so conversion is a
mechanical key rewrite.

Compute dtype is configurable: inference runs bf16 (the reference uses CUDA
fp16 autocast, motion_filter.py:32) with f32 parameters.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

# ImageNet normalization used by extract_features (droid_net.py:157-160)
IMAGE_MEAN = (0.485, 0.456, 0.406)
IMAGE_STD = (0.229, 0.224, 0.225)

_conv_init = nn.initializers.variance_scaling(2.0, "fan_out", "normal")


def _fused_init(n_heads: int):
    """He fan_out init matching the UNfused per-head variance: a conv whose
    output dim packs ``n_heads`` reference convs has n_heads x the fan_out,
    so scale by n_heads to keep each head's init distribution unchanged."""
    return nn.initializers.variance_scaling(2.0 * n_heads, "fan_out", "normal")


def instance_norm(x: jnp.ndarray, eps: float = 1e-5) -> jnp.ndarray:
    """torch ``InstanceNorm2d(affine=False)``: per-sample, per-channel
    spatial normalization (no learned parameters)."""
    mean = jnp.mean(x, axis=(-3, -2), keepdims=True)
    var = jnp.var(x, axis=(-3, -2), keepdims=True)
    return (x - mean) * jax.lax.rsqrt(var + eps)


def _norm(x: jnp.ndarray, kind: str) -> jnp.ndarray:
    if kind == "instance":
        # normalize in f32 for stability under bf16 activations
        return instance_norm(x.astype(jnp.float32)).astype(x.dtype)
    if kind == "none":
        return x
    raise NotImplementedError(f"norm '{kind}' not needed for inference parity")


@jax.custom_vjp
def gradient_clip(x):
    """Backward-only gradient clamp (|g|>0.01 -> 0, NaN -> 0).

    Training-parity port of /root/reference/dbaf/modules/clipping.py:7-24.
    """
    return x


def _gc_fwd(x):
    return x, None


def _gc_bwd(_, g):
    g = jnp.where(jnp.isnan(g), 0.0, g)
    g = jnp.where(jnp.abs(g) > 0.01, 0.0, g)
    return (g,)


gradient_clip.defvjp(_gc_fwd, _gc_bwd)


class ResidualBlock(nn.Module):
    planes: int
    norm: str = "instance"
    stride: int = 1
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        y = nn.Conv(
            self.planes, (3, 3), strides=self.stride, padding=1,
            kernel_init=_conv_init, dtype=self.dtype, name="conv1",
        )(x)
        y = nn.relu(_norm(y, self.norm))
        y = nn.Conv(
            self.planes, (3, 3), padding=1,
            kernel_init=_conv_init, dtype=self.dtype, name="conv2",
        )(y)
        y = nn.relu(_norm(y, self.norm))
        if self.stride != 1:
            x = nn.Conv(
                self.planes, (1, 1), strides=self.stride,
                kernel_init=_conv_init, dtype=self.dtype, name="downsample",
            )(x)
            x = _norm(x, self.norm)
        return nn.relu(x + y)


class BasicEncoder(nn.Module):
    """Stride-8 feature pyramid trunk (extractor.py:118-198).

    Input NHWC normalized RGB; output (N, H/8, W/8, output_dim).
    """

    output_dim: int = 128
    norm: str = "instance"
    dtype: Any = jnp.bfloat16

    DIM: int = 32

    @nn.compact
    def __call__(self, x):
        d = self.DIM
        x = nn.Conv(
            d, (7, 7), strides=2, padding=3,
            kernel_init=_conv_init, dtype=self.dtype, name="conv1",
        )(x)
        x = nn.relu(_norm(x, self.norm))

        for li, (dim, stride) in enumerate(((d, 1), (2 * d, 2), (4 * d, 2)), start=1):
            x = ResidualBlock(dim, self.norm, stride, self.dtype, name=f"layer{li}_0")(x)
            x = ResidualBlock(dim, self.norm, 1, self.dtype, name=f"layer{li}_1")(x)

        return nn.Conv(
            self.output_dim, (1, 1),
            kernel_init=_conv_init, dtype=self.dtype, name="conv2",
        )(x)


class ConvGRU(nn.Module):
    """3x3 ConvGRU with a sigmoid-gated global-context path (gru.py:5-32).

    The three reference convs (convz/convr/convq over ``cat[net, inp]`` /
    ``cat[r*net, inp]``) are stored split along the contraction dim and
    fused along the head dim: one 3x3 conv over ``inp`` produces all three
    heads' input contributions (the 320-channel window is materialized once
    instead of twice), one bias-free conv over ``net`` produces z|r, and one
    over ``r*net`` produces q.  The algebra is an exact repacking of the
    reference kernels (sliced/concatenated in :mod:`dbaf_tpu.models.convert`);
    only fp summation order differs.
    """

    h_planes: int = 128
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, net, inp):
        """net: (B, H, W, 128) hidden; inp: (B, H, W, Ci) stacked inputs."""
        h = self.h_planes
        conv = lambda ch, k, name, heads=1, bias=True: nn.Conv(
            ch, (k, k), padding=k // 2, use_bias=bias,
            kernel_init=_fused_init(heads), dtype=self.dtype, name=name,
        )

        glo = jax.nn.sigmoid(conv(h, 1, "w")(net)) * net
        glo = jnp.mean(glo, axis=(1, 2), keepdims=True)  # (B,1,1,128)

        gl = conv(3 * h, 1, "convzrq_glo", heads=3)(glo)
        a = conv(3 * h, 3, "convzrq_i", heads=3)(inp)
        zr = jax.nn.sigmoid(
            a[..., : 2 * h]
            + conv(2 * h, 3, "convzr_n", heads=2, bias=False)(net)
            + gl[..., : 2 * h]
        )
        z, r = zr[..., :h], zr[..., h:]
        q = jnp.tanh(
            a[..., 2 * h :]
            + conv(h, 3, "convq_n", bias=False)(r * net)
            + gl[..., 2 * h :]
        )
        return (1.0 - z) * net + z * q


class GraphAgg(nn.Module):
    """Edge->keyframe aggregation head producing depth damping (eta) and the
    8x8x9 convex-upsampling mask (droid_net.py:40-71).  Disabled in the VIO
    hot path (droid_net.py:133-140) but part of the capability surface."""

    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, net, ii, num_frames: int):
        """net: (E, H, W, 128); ii: (E,) source frame per edge."""
        conv = lambda ch, k, name: nn.Conv(
            ch, (k, k), padding=k // 2, kernel_init=_conv_init,
            dtype=self.dtype, name=name,
        )
        net = nn.relu(conv(128, 3, "conv1")(net))
        # scatter_mean over edges per source frame
        ones = jnp.ones((net.shape[0],), dtype=net.dtype)
        counts = jax.ops.segment_sum(ones, ii, num_segments=num_frames)
        sums = jax.ops.segment_sum(net, ii, num_segments=num_frames)
        net = sums / jnp.maximum(counts, 1.0)[:, None, None, None]

        net = nn.relu(conv(128, 3, "conv2")(net))
        eta = nn.softplus(gradient_clip(conv(1, 3, "eta_0")(net)))
        upmask = conv(8 * 8 * 9, 1, "upmask_0")(net)
        return 0.01 * eta[..., 0], upmask


class _CorrEnc0(nn.Module):
    """First 1x1 conv of the corr encoder, accepting either the reference
    196-channel layout or the fused Pallas kernels' raw 1024-channel
    (32x32 per-pixel block) layout.

    The parameter is ALWAYS the reference-shaped (1, 1, 196, 128) kernel
    (so the torch checkpoint converter is unaffected); for raw input the
    kernel rows are scattered to the block positions at trace time
    (ops/corr_pallas.raw_corr_index), folding the diagonal-extraction
    epilogue of the lookup kernel into this contraction.  Off-block raw
    positions (cross-level y/x products the reference never reads) get
    zero weight rows, so the result is bit-identical math on 5.2x the
    MACs -- cheaper than the multi-pass XLA shuffle of the ~300 MB block
    tensor that it replaces.
    """

    dtype: Any = jnp.bfloat16
    channels: int = 196

    @nn.compact
    def __call__(self, corr):
        kernel = self.param(
            "kernel", _conv_init, (1, 1, self.channels, 128), jnp.float32
        )
        bias = self.param("bias", nn.initializers.zeros, (128,), jnp.float32)
        w = kernel[0, 0]
        if corr.shape[-1] != self.channels:
            from ..ops.corr_pallas import raw_corr_index

            assert corr.shape[-1] == 1024, corr.shape
            idx = raw_corr_index()  # (1024,) block pos -> ref channel
            w = jnp.where(
                (idx >= 0)[:, None],
                jnp.take(w, jnp.maximum(idx, 0), axis=0),
                0.0,
            )
        # mirror flax nn.Conv(dtype=...): operands and bias cast to the
        # compute dtype, bf16 result (f32 accumulation inside the MXU)
        y = jax.lax.dot_general(
            corr.astype(self.dtype), w.astype(self.dtype),
            (((corr.ndim - 1,), (0,)), ((), ())),
            preferred_element_type=self.dtype,
        )
        return y + bias.astype(self.dtype)


class UpdateModule(nn.Module):
    """RAFT-style update operator (droid_net.py:74-142).

    Heads emit 2 channels (flow delta / confidence weight); the published
    checkpoint's 3-channel heads are sliced at conversion (dbaf.py:42-45).
    """

    dtype: Any = jnp.bfloat16
    radius: int = 3
    levels: int = 4

    @nn.compact
    def __call__(self, net, inp, corr, flow=None, ii=None, num_frames: int = 0,
                 upsample: bool = False):
        """All NHWC, batched over edges:
        net (E,H,W,128), inp (E,H,W,128), corr (E,H,W,196), flow (E,H,W,4).
        Returns (net, delta, weight[, eta, upmask]).
        """
        E, H, W, _ = net.shape
        if flow is None:
            flow = jnp.zeros((E, H, W, 4), dtype=net.dtype)

        conv = lambda ch, k, name: nn.Conv(
            ch, (k, k), padding=k // 2, kernel_init=_conv_init,
            dtype=self.dtype, name=name,
        )

        c = nn.relu(_CorrEnc0(self.dtype, name="corr_encoder_0")(corr))
        c = nn.relu(conv(128, 3, "corr_encoder_2")(c))
        f = nn.relu(conv(128, 7, "flow_encoder_0")(flow))
        f = nn.relu(conv(64, 3, "flow_encoder_2")(f))

        net = ConvGRU(128, self.dtype, name="gru")(
            net, jnp.concatenate([inp, c, f], axis=-1)
        )

        # delta_0|weight_0 packed into one conv (exact: independent output
        # channels; converter concatenates the reference kernels)
        dw = nn.relu(
            nn.Conv(
                256, (3, 3), padding=1, kernel_init=_fused_init(2),
                dtype=self.dtype, name="dw_0",
            )(net)
        )
        delta = gradient_clip(conv(2, 3, "delta_2")(dw[..., :128]))
        weight = jax.nn.sigmoid(gradient_clip(conv(2, 3, "weight_2")(dw[..., 128:])))

        delta = delta.astype(jnp.float32)
        weight = weight.astype(jnp.float32)

        if upsample and ii is not None:
            eta, upmask = GraphAgg(self.dtype, name="agg")(net, ii, num_frames)
            return net, delta, weight, eta.astype(jnp.float32), upmask
        return net, delta, weight, None, None


class DroidNet(nn.Module):
    """Container: fnet (correlation features), cnet (context), update op
    (droid_net.py:145-168)."""

    dtype: Any = jnp.bfloat16

    def setup(self):
        self.fnet = BasicEncoder(output_dim=128, norm="instance", dtype=self.dtype)
        self.cnet = BasicEncoder(output_dim=256, norm="none", dtype=self.dtype)
        self.update = UpdateModule(dtype=self.dtype)

    def extract_features(self, images):
        """images: (N, H, W, 3) **BGR uint8-valued floats** (reference keeps
        OpenCV BGR order and flips to RGB here, droid_net.py:155-160).

        Returns fmaps (N,H/8,W/8,128), net (tanh), inp (relu) each 128ch.
        """
        images = images[..., ::-1] / 255.0
        mean = jnp.asarray(IMAGE_MEAN, dtype=images.dtype)
        std = jnp.asarray(IMAGE_STD, dtype=images.dtype)
        images = ((images - mean) / std).astype(self.dtype)

        fmaps = self.fnet(images)
        ctx = self.cnet(images)
        net, inp = ctx[..., :128], ctx[..., 128:]
        return fmaps, jnp.tanh(net), nn.relu(inp)

    def features_only(self, images):
        """fnet only (per-frame motion-filter path, motion_filter.py:45-47)."""
        images = images[..., ::-1] / 255.0
        mean = jnp.asarray(IMAGE_MEAN, dtype=images.dtype)
        std = jnp.asarray(IMAGE_STD, dtype=images.dtype)
        return self.fnet(((images - mean) / std).astype(self.dtype))

    def context_only(self, images):
        """cnet only (keyframe admission path, motion_filter.py:33-36)."""
        images = images[..., ::-1] / 255.0
        mean = jnp.asarray(IMAGE_MEAN, dtype=images.dtype)
        std = jnp.asarray(IMAGE_STD, dtype=images.dtype)
        ctx = self.cnet(((images - mean) / std).astype(self.dtype))
        return jnp.tanh(ctx[..., :128]), nn.relu(ctx[..., 128:])

    def update_step(self, net, inp, corr, flow=None):
        return self.update(net, inp, corr, flow)

    def update_with_agg(self, net, inp, corr, flow, ii, num_frames):
        """Training-path update incl. GraphAgg eta/upmask (droid_net.py:205-206)."""
        return self.update(
            net, inp, corr, flow, ii=ii, num_frames=num_frames, upsample=True
        )

    def __call__(self, images, net, inp, corr, flow=None):
        """Minimal apply surface: feature extraction or one update step are
        invoked via ``method=``; this default wires the update op."""
        return self.update(net, inp, corr, flow)
