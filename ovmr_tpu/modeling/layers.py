"""Shared flax layers for the modeling zoo (reference
``dassl/modeling/ops/{attention,conv,dsbn,transnorm}.py``).

All feature maps are NHWC. BatchNorm running-stat semantics match torch
defaults exactly via :class:`TorchBatchNorm` (momentum 0.1 on the batch
statistic == flax momentum 0.9; running variance updates with the
UNBIASED batch variance).
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp


class TorchBatchNorm(nn.Module):
    """BatchNorm with EXACT ``torch.nn.BatchNorm2d/1d`` semantics: train
    mode normalizes with the biased batch variance while the running
    variance updates with the UNBIASED one (Bessel ``n/(n-1)``,
    ``n = batch*spatial``); eval mode normalizes with the running stats.
    ``flax.linen.BatchNorm`` updates the running variance with the BIASED
    batch variance instead — a real eval-time divergence from any torch
    reference. Collection ('batch_stats') and leaf names (mean/var,
    scale/bias) match ``nn.BatchNorm``, so checkpoints, AdaBN's stat
    reset and the GSPMD data-parallel path (global-batch reductions) are
    unchanged.
    """

    use_running_average: bool
    momentum: float = 0.9  # decay of the RUNNING stat (flax convention)
    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,))
        bias = self.param("bias", nn.initializers.zeros, (c,))
        ra_mean = self.variable(
            "batch_stats", "mean", lambda: jnp.zeros((c,), jnp.float32)
        )
        ra_var = self.variable(
            "batch_stats", "var", lambda: jnp.ones((c,), jnp.float32)
        )
        if self.use_running_average:
            mean, var = ra_mean.value, ra_var.value
        else:
            axes = tuple(range(x.ndim - 1))
            mean = x.mean(axes)
            var = ((x - mean) ** 2).mean(axes)  # torch: E[(x-mu)^2], biased
            if not self.is_initializing():
                n = x.size // c
                bessel = n / max(n - 1, 1)
                m = self.momentum
                ra_mean.value = m * ra_mean.value + (1 - m) * mean
                ra_var.value = m * ra_var.value + (1 - m) * var * bessel
        y = (x - mean) / jnp.sqrt(var + self.epsilon)
        return y * scale + bias


class Attention(nn.Module):
    """Squeeze-excitation-style kernel attention from Dynamic Domain
    Generalization (reference ops/attention.py): GAP -> fc -> relu -> fc
    -> softmax over ``out_features`` template weights."""

    in_channels: int
    out_features: int
    squeeze: Optional[int] = None
    use_bias: bool = True

    @nn.compact
    def __call__(self, x):
        squeeze = self.squeeze if self.squeeze else self.in_channels // 16
        assert squeeze > 0
        v = x.mean(axis=(1, 2))  # NHWC global average pool
        v = nn.Dense(squeeze, use_bias=self.use_bias)(v)
        v = nn.relu(v)
        v = nn.Dense(self.out_features, use_bias=self.use_bias)(v)
        return nn.softmax(v, axis=-1)


class Conv2dDynamic(nn.Module):
    """Dynamic convolution (reference ops/conv.py): a base KxK conv plus
    four kernel templates (grouped KxK, 1x1, Kx1, 1xK) blended by
    per-sample attention weights."""

    in_channels: int
    out_channels: int
    kernel_size: int
    stride: int
    use_bias: bool = True
    squeeze: Optional[int] = None
    attention_in_channels: Optional[int] = None

    @nn.compact
    def __call__(self, x, attention_x=None):
        k, s = self.kernel_size, self.stride
        if k % 2 == 0:
            raise ValueError("kernel_size must be odd")
        pad = k // 2
        attention_x = x if attention_x is None else attention_x
        y = Attention(
            self.attention_in_channels or self.in_channels,
            4,
            self.squeeze,
            self.use_bias,
            name="attention",
        )(attention_x)

        conv = lambda name, ksz, padding, groups=1: nn.Conv(
            self.out_channels,
            ksz,
            strides=(s, s),
            padding=padding,
            feature_group_count=groups,
            use_bias=self.use_bias,
            name=name,
        )
        out = conv("conv", (k, k), [(pad, pad), (pad, pad)])(x)
        templates = [
            conv(
                "conv_nn",
                (k, k),
                [(pad, pad), (pad, pad)],
                groups=min(self.in_channels, self.out_channels),
            ),
            conv("conv_11", (1, 1), [(0, 0), (0, 0)]),
            conv("conv_n1", (k, 1), [(pad, pad), (0, 0)]),
            conv("conv_1n", (1, k), [(0, 0), (pad, pad)]),
        ]
        for i, template in enumerate(templates):
            out = out + template(x) * y[:, i].reshape(-1, 1, 1, 1)
        return out


class DSBN(nn.Module):
    """Domain-specific batch normalization (reference ops/dsbn.py): one
    BatchNorm per domain; ``domain_idx`` is selected statically (the
    reference sets it via ``select_bn`` before the forward)."""

    num_features: int
    n_domain: int

    @nn.compact
    def __call__(self, x, domain_idx: int = 0, train: bool = True):
        assert 0 <= domain_idx < self.n_domain
        bns = [
            TorchBatchNorm(
                use_running_average=not train,
                momentum=0.9,
                epsilon=1e-5,
                name=f"bn_{i}",
            )
            for i in range(self.n_domain)
        ]
        if self.is_initializing():
            # materialize every domain's params/stats at init (the
            # reference builds all n_domain BNs up front); apply-time
            # forwards touch — and update — only the selected domain
            for i, bn in enumerate(bns):
                if i != domain_idx:
                    bn(x)
        return bns[domain_idx](x)


class TransNorm(nn.Module):
    """Transferable normalization (reference ops/transnorm.py; Wang et al.
    NeurIPS'19). Training input stacks [source; target] halves along the
    batch; each half normalizes with its own statistics and the channel
    attention ``1 + alpha`` (detached) rescales the output.

    Running-stat update replicates the reference exactly, including its
    inverted-momentum quirk ``running = m*running + (1-m)*batch`` with
    m=0.1 (i.e. the newest batch dominates) — do not "fix" it.
    """

    num_features: int
    eps: float = 1e-5
    momentum: float = 0.1
    adaptive_alpha: bool = True

    @nn.compact
    def __call__(self, x, train: bool = True):
        c = self.num_features
        shape = (1, c) if x.ndim == 2 else (1, 1, 1, c)
        weight = self.param("weight", nn.initializers.ones, (c,))
        bias = self.param("bias", nn.initializers.zeros, (c,))
        mean_s = self.variable("batch_stats", "running_mean_s", jnp.zeros, (c,))
        var_s = self.variable("batch_stats", "running_var_s", jnp.ones, (c,))
        mean_t = self.variable("batch_stats", "running_mean_t", jnp.zeros, (c,))
        var_t = self.variable("batch_stats", "running_var_t", jnp.ones, (c,))

        def alpha_of(ms, vs, mt, vt):
            ratio_s = ms / jnp.sqrt(vs + self.eps)
            ratio_t = mt / jnp.sqrt(vt + self.eps)
            dist_inv = 1.0 / (1.0 + jnp.abs(ratio_s - ratio_t))
            return c * dist_inv / dist_inv.sum()

        w = weight.reshape(shape)
        b = bias.reshape(shape)

        if not train:
            out = (x - mean_t.value.reshape(shape)) / jnp.sqrt(
                var_t.value.reshape(shape) + self.eps
            )
            out = out * w + b
            if self.adaptive_alpha:
                alpha = alpha_of(
                    mean_s.value, var_s.value, mean_t.value, var_t.value
                ).reshape(shape)
                out = (1.0 + alpha) * out
            return out

        half = x.shape[0] // 2
        x_s, x_t = x[:half], x[half:]
        axes = tuple(i for i in range(x.ndim) if i != x.ndim - 1)

        m_s = x_s.mean(axis=axes)
        v_s = x_s.var(axis=axes, ddof=1)
        m_t = x_t.mean(axis=axes)
        v_t = x_t.var(axis=axes, ddof=1)

        if not self.is_initializing():
            mom = self.momentum
            mean_s.value = mom * mean_s.value + (1 - mom) * m_s
            var_s.value = mom * var_s.value + (1 - mom) * v_s
            mean_t.value = mom * mean_t.value + (1 - mom) * m_t
            var_t.value = mom * var_t.value + (1 - mom) * v_t

        out_s = (x_s - m_s.reshape(shape)) / jnp.sqrt(v_s.reshape(shape) + self.eps)
        out_t = (x_t - m_t.reshape(shape)) / jnp.sqrt(v_t.reshape(shape) + self.eps)
        out = jnp.concatenate([out_s * w + b, out_t * w + b], axis=0)
        if self.adaptive_alpha:
            alpha = alpha_of(m_s, v_s, m_t, v_t)
            alpha = jnp.reshape(jax.lax.stop_gradient(alpha), shape)
            out = (1.0 + alpha) * out
        return out
