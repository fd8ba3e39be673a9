"""Perturbation-generator networks for DDAIG (reference
``dassl/modeling/network/ddaig_fcn.py``, CycleGAN-style FCN).

NHWC flax modules. ``fcn_*_gctx`` variants fuse a global-context vector;
``*_stn`` variants prepend a spatial transformer whose localization head
is initialized to (tanh-squashed) identity, exactly like the reference's
``init_loc_layer``. The generator returns ``x + lmda * p`` with ``p`` in
[-1, 1] (tanh).
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from ovmr_tpu.utils.registry import Registry

from .layers import TorchBatchNorm

NETWORK_REGISTRY = Registry("NETWORK")

_gauss02 = nn.initializers.normal(stddev=0.02)


def _instance_norm(x):
    """InstanceNorm2d(affine=False): per-sample, per-channel spatial norm."""
    mu = x.mean(axis=(1, 2), keepdims=True)
    var = x.var(axis=(1, 2), keepdims=True)
    return (x - mu) / jnp.sqrt(var + 1e-5)


def _reflect_conv(x, features, name, use_bias=False):
    """ReflectionPad2d(1) + 3x3 VALID conv (the reference's default
    padding_type='reflect')."""
    x = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="reflect")
    return nn.Conv(
        features, (3, 3), padding="VALID", use_bias=use_bias,
        kernel_init=_gauss02, name=name,
    )(x)


def affine_grid_sample(x, theta):
    """Bilinear sampling of NHWC ``x`` on the affine grid ``theta`` [B,2,3]
    (torch ``affine_grid``+``grid_sample`` semantics, align_corners=False,
    zero padding)."""
    b, h, w, c = x.shape
    # normalized output coords in [-1, 1] (pixel centers, align_corners=False)
    ys = (jnp.arange(h) + 0.5) * 2.0 / h - 1.0
    xs = (jnp.arange(w) + 0.5) * 2.0 / w - 1.0
    gy, gx = jnp.meshgrid(ys, xs, indexing="ij")
    ones = jnp.ones_like(gx)
    coords = jnp.stack([gx, gy, ones], axis=-1).reshape(-1, 3)  # [HW, 3]
    src = jnp.einsum("bij,nj->bni", theta, coords)  # [B, HW, 2] (x, y)
    sx = (src[..., 0] + 1.0) * w / 2.0 - 0.5
    sy = (src[..., 1] + 1.0) * h / 2.0 - 0.5

    x0 = jnp.floor(sx)
    y0 = jnp.floor(sy)
    wx = sx - x0
    wy = sy - y0

    def gather(yi, xi):
        valid = (yi >= 0) & (yi < h) & (xi >= 0) & (xi < w)
        yi_c = jnp.clip(yi, 0, h - 1).astype(jnp.int32)
        xi_c = jnp.clip(xi, 0, w - 1).astype(jnp.int32)
        flat = x.reshape(b, h * w, c)
        vals = jnp.take_along_axis(
            flat, (yi_c * w + xi_c)[..., None].astype(jnp.int32), axis=1
        )
        return vals * valid[..., None]

    out = (
        gather(y0, x0) * ((1 - wx) * (1 - wy))[..., None]
        + gather(y0, x0 + 1) * (wx * (1 - wy))[..., None]
        + gather(y0 + 1, x0) * ((1 - wx) * wy)[..., None]
        + gather(y0 + 1, x0 + 1) * (wx * wy)[..., None]
    )
    return out.reshape(b, h, w, c)


class _ResnetBlock(nn.Module):
    dim: int
    use_batch_norm: bool = False  # instance norm otherwise
    padding_type: str = "reflect"  # the FCN trunk; LocNet uses "zero"

    @nn.compact
    def __call__(self, x, train: bool = False):
        def norm(v, name):
            if self.use_batch_norm:
                return TorchBatchNorm(
                    use_running_average=not train, momentum=0.9,
                    epsilon=1e-5, name=name,
                )(v)
            return _instance_norm(v)

        def conv(v, name):
            if self.padding_type == "reflect":
                return _reflect_conv(v, self.dim, name)
            # zero padding (reference builds LocNet's ResnetBlocks with
            # padding_type='zero', ddaig_fcn.py)
            return nn.Conv(
                self.dim, (3, 3), padding=1, use_bias=False,
                kernel_init=_gauss02, name=name,
            )(v)

        h = conv(x, "conv1")
        h = nn.relu(norm(h, "norm1"))
        h = conv(h, "conv2")
        return x + norm(h, "norm2")


class LocNet(nn.Module):
    """Localization network for the STN variants (reference
    ``ddaig_fcn.py::LocNet``; zero-padded convs + BN blocks)."""

    nc: int = 32
    n_blocks: int = 3
    image_size: int = 32

    @nn.compact
    def __call__(self, x, train: bool = False):
        b = x.shape[0]
        x = nn.Conv(self.nc, (3, 3), strides=(2, 2), padding=1,
                    use_bias=False, kernel_init=_gauss02, name="conv0")(x)
        x = nn.relu(TorchBatchNorm(use_running_average=not train,
                                   momentum=0.9, epsilon=1e-5, name="bn0")(x))
        for i in range(self.n_blocks):
            x = _ResnetBlock(self.nc, use_batch_norm=True,
                             padding_type="zero",
                             name=f"block{i}")(x, train=train)
            x = nn.max_pool(x, (2, 2), strides=(2, 2))
        x = x.reshape(b, -1)
        # identity init: zero weights, bias [1, 0, 0, 1] (then tanh) —
        # the reference's init_loc_layer
        x = nn.Dense(
            4,
            kernel_init=nn.initializers.zeros,
            bias_init=lambda *a: jnp.array([1.0, 0.0, 0.0, 1.0]),
            name="fc_loc",
        )(x)
        x = jnp.tanh(x).reshape(b, 2, 2)
        zeros = jnp.zeros((b, 2, 1), x.dtype)
        return jnp.concatenate([x, zeros], axis=-1)  # [B, 2, 3]


class FCN(nn.Module):
    """Fully-convolutional perturbation generator (reference
    ``ddaig_fcn.py::FCN``): reflect-conv trunk, optional global-context
    fusion, tanh regression head; output is ``input + lmda * p``."""

    nc: int = 32
    n_blocks: int = 3
    gctx: bool = True
    stn: bool = False
    image_size: int = 32

    @nn.compact
    def __call__(self, x, lmda: float = 1.0, return_p: bool = False,
                 return_stn_output: bool = False, train: bool = False):
        if self.stn:
            theta = LocNet(self.nc, self.n_blocks, self.image_size,
                           name="locnet")(x, train=train)
            x = affine_grid_sample(x, theta)
        inp = x

        h = _reflect_conv(x, self.nc, "conv0")
        h = nn.relu(_instance_norm(h))
        for i in range(self.n_blocks):
            h = _ResnetBlock(self.nc, name=f"block{i}")(h, train=train)

        if self.gctx:
            c = h.mean(axis=(1, 2), keepdims=True)
            c = jnp.broadcast_to(c, h.shape)
            h = jnp.concatenate([h, c], axis=-1)
            h = nn.Conv(self.nc, (1, 1), use_bias=False,
                        kernel_init=_gauss02, name="gctx_fusion")(h)
            h = nn.relu(_instance_norm(h))

        p = jnp.tanh(
            nn.Conv(3, (1, 1), use_bias=True, kernel_init=_gauss02,
                    name="regress")(h)
        )
        x_p = inp + lmda * p
        if return_stn_output:
            return x_p, p, inp
        if return_p:
            return x_p, p
        return x_p


@NETWORK_REGISTRY.register()
def fcn_3x32_gctx(**kwargs):
    return FCN(nc=32, n_blocks=3)


@NETWORK_REGISTRY.register()
def fcn_3x64_gctx(**kwargs):
    return FCN(nc=64, n_blocks=3)


@NETWORK_REGISTRY.register()
def fcn_3x32_gctx_stn(image_size=32, **kwargs):
    return FCN(nc=32, n_blocks=3, stn=True, image_size=image_size)


@NETWORK_REGISTRY.register()
def fcn_3x64_gctx_stn(image_size=224, **kwargs):
    return FCN(nc=64, n_blocks=3, stn=True, image_size=image_size)


def build_network(name: str, verbose: bool = False, **kwargs) -> nn.Module:
    if verbose:
        print(f"Network: {name}")
    return NETWORK_REGISTRY.get(name)(**kwargs)
