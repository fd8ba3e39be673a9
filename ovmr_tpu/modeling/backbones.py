"""CNN backbone zoo (reference ``dassl/modeling/backbone/``).

Every backbone is a flax module whose ``__call__(x, train=...)`` maps an
NHWC float batch to ``[B, out_features]`` features; ``out_features`` is a
property so ``SimpleNet`` can size its head/classifier. Registered names
match the reference's ``BACKBONE_REGISTRY`` exactly:

- ``resnet18/34/50/101/152`` (+ ``_ms_l{123,12,1}`` MixStyle and
  ``_efdmix_l{123,12,1}`` EFDMix variants for 18/50/101)
  — reference ``backbone/resnet.py``
- ``resnet{18,50,101}_dynamic`` (+ ``_ms_l*``) with ``Conv2dDynamic``
  blocks — reference ``backbone/resnet_dynamic.py`` (all registered with
  ``has_fc=False``, so features come from the global pool)
- ``preact_resnet18`` — ``backbone/preact_resnet18.py``
- ``wide_resnet_28_2`` / ``wide_resnet_16_4`` — ``backbone/wide_resnet.py``
  (LeakyReLU(0.01) variant)
- ``vgg16`` — ``backbone/vgg.py`` (features = the 4096-d classifier MLP)
- ``alexnet`` — ``backbone/alexnet.py``
- ``cnn_digit5_m3sda`` / ``cnn_digitsdg`` / ``cnn_digitsingle``
  — the 32x32 digit CNNs
- ``efficientnet_b0..b7`` — ``backbone/efficientnet/``

``pretrained=True`` is accepted for signature parity but torchvision /
TF-hub weights are asset-gated in this environment (zero egress): a
one-line notice is printed and the net keeps its random init. RNG
streams: ``'dropout'`` (dropout + EfficientNet drop-connect) and
``'mixstyle'`` (MixStyle/EFDMix draws); only needed when ``train=True``.
"""

from __future__ import annotations

import math
from typing import Callable, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from ovmr_tpu.utils.registry import Registry

from . import ops as F
from .layers import Conv2dDynamic

BACKBONE_REGISTRY = Registry("BACKBONE")

_kaiming = nn.initializers.variance_scaling(2.0, "fan_out", "normal")


def _bn(train: bool, name: Optional[str] = None, momentum=0.9, eps=1e-5):
    # torch-exact BN (unbiased running-var update) — see TorchBatchNorm
    from .layers import TorchBatchNorm

    return TorchBatchNorm(
        use_running_average=not train, momentum=momentum, epsilon=eps, name=name
    )


def _conv(features, kernel, stride=1, use_bias=False, name=None, groups=1,
          padding=None):
    k = (kernel, kernel) if isinstance(kernel, int) else kernel
    if padding is None:
        padding = [(k[0] // 2, k[0] // 2), (k[1] // 2, k[1] // 2)]
    return nn.Conv(
        features,
        k,
        strides=(stride, stride),
        padding=padding,
        use_bias=use_bias,
        feature_group_count=groups,
        kernel_init=_kaiming,
        name=name,
    )


def _max_pool(x, window, stride, padding=0):
    pad = ((padding, padding), (padding, padding))
    return nn.max_pool(
        x, (window, window), strides=(stride, stride), padding=pad
    )


def _adaptive_avg_pool(x, out_hw):
    """torch ``AdaptiveAvgPool2d`` semantics for NHWC ``x`` at ANY static
    input size: output cell (i, j) averages rows ``floor(i*H/oh) ..
    ceil((i+1)*H/oh)`` (replicates when the input is smaller than the
    output grid). Static shapes -> the slice bounds are Python ints."""
    h, w = x.shape[1:3]
    oh, ow = out_hw
    if (h, w) == (oh, ow):
        return x
    rows = []
    for i in range(oh):
        h0, h1 = (i * h) // oh, -(-((i + 1) * h) // oh)
        cols = []
        for j in range(ow):
            w0, w1 = (j * w) // ow, -(-((j + 1) * w) // ow)
            cols.append(x[:, h0:h1, w0:w1, :].mean(axis=(1, 2)))
        rows.append(jnp.stack(cols, axis=1))
    return jnp.stack(rows, axis=1)


def _notice_pretrained(name: str, pretrained: bool):
    if pretrained:
        print(
            f"backbone '{name}': pretrained weights are asset-gated in this "
            "environment (zero egress); using random init"
        )


def _maybe_mix(module, x, kind: Optional[str], train: bool, p, alpha):
    """Apply MixStyle/EFDMix with a per-call rng from the 'mixstyle' stream."""
    if kind is None or not train:
        return x
    rng = module.make_rng("mixstyle")
    fn = F.mixstyle if kind == "mixstyle" else F.efdmix
    return fn(x, rng, p=p, alpha=alpha, train=train)


# ---------------------------------------------------------------------------
# ResNet family (reference backbone/resnet.py + resnet_dynamic.py)
# ---------------------------------------------------------------------------

class _BasicBlock(nn.Module):
    planes: int
    stride: int = 1
    dynamic: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        in_ch = x.shape[-1]
        residual = x
        if self.dynamic:
            out = Conv2dDynamic(
                in_ch, self.planes, 3, self.stride, use_bias=False,
                attention_in_channels=in_ch, name="conv1",
            )(x, attention_x=x)
        else:
            out = _conv(self.planes, 3, self.stride, name="conv1")(x)
        out = _bn(train, "bn1")(out)
        out = nn.relu(out)
        if self.dynamic:
            out = Conv2dDynamic(
                self.planes, self.planes, 3, 1, use_bias=False,
                attention_in_channels=in_ch, name="conv2",
            )(out, attention_x=x)
        else:
            out = _conv(self.planes, 3, 1, name="conv2")(out)
        out = _bn(train, "bn2")(out)
        if self.stride != 1 or in_ch != self.planes:
            residual = _conv(self.planes, 1, self.stride, name="downsample")(x)
            residual = _bn(train, "downsample_bn")(residual)
        return nn.relu(out + residual)


class _Bottleneck(nn.Module):
    planes: int
    stride: int = 1
    dynamic: bool = False
    expansion: int = 4

    @nn.compact
    def __call__(self, x, train: bool = False):
        in_ch = x.shape[-1]
        out_ch = self.planes * self.expansion
        residual = x
        out = _conv(self.planes, 1, 1, name="conv1")(x)
        out = _bn(train, "bn1")(out)
        out = nn.relu(out)
        # torchvision-style (v1.5): stride on the 3x3
        if self.dynamic:
            out = Conv2dDynamic(
                self.planes, self.planes, 3, self.stride, use_bias=False,
                attention_in_channels=in_ch, name="conv2",
            )(out, attention_x=x)
        else:
            out = _conv(self.planes, 3, self.stride, name="conv2")(out)
        out = _bn(train, "bn2")(out)
        out = nn.relu(out)
        out = _conv(out_ch, 1, 1, name="conv3")(out)
        out = _bn(train, "bn3")(out)
        if self.stride != 1 or in_ch != out_ch:
            residual = _conv(out_ch, 1, self.stride, name="downsample")(x)
            residual = _bn(train, "downsample_bn")(residual)
        return nn.relu(out + residual)


class ResNet(nn.Module):
    """ImageNet-style ResNet trunk -> global-average-pooled features.

    ``ms_class`` in {'mixstyle', 'efdmix', None} inserts feature-statistics
    mixing after the layer groups named in ``ms_layers`` (train only),
    mirroring reference ``backbone/resnet.py:100-214``. ``dynamic=True``
    swaps the 3x3 convs for ``Conv2dDynamic`` (``resnet_dynamic.py``).
    """

    layers: Sequence[int] = (2, 2, 2, 2)
    bottleneck: bool = False
    ms_class: Optional[str] = None
    ms_layers: Sequence[str] = ()
    ms_p: float = 0.5
    ms_a: float = 0.1
    dynamic: bool = False

    @property
    def out_features(self) -> int:
        return 512 * (4 if self.bottleneck else 1)

    @nn.compact
    def __call__(self, x, train: bool = False):
        block = _Bottleneck if self.bottleneck else _BasicBlock
        x = _conv(64, 7, 2, name="conv1")(x)
        x = _bn(train, "bn1")(x)
        x = nn.relu(x)
        x = _max_pool(x, 3, 2, padding=1)
        for gi, (planes, n_blocks) in enumerate(
            zip((64, 128, 256, 512), self.layers)
        ):
            stride = 1 if gi == 0 else 2
            for bi in range(n_blocks):
                x = block(
                    planes,
                    stride if bi == 0 else 1,
                    self.dynamic,
                    name=f"layer{gi + 1}_{bi}",
                )(x, train=train)
            if f"layer{gi + 1}" in self.ms_layers:
                x = _maybe_mix(self, x, self.ms_class, train, self.ms_p, self.ms_a)
        return x.mean(axis=(1, 2))


class PreActResNet18(nn.Module):
    """CIFAR-style pre-activation ResNet-18 (reference
    ``backbone/preact_resnet18.py``; 32x32 inputs, avg_pool2d(4))."""

    @property
    def out_features(self) -> int:
        return 512

    def _block(self, x, planes, stride, train, name):
        in_ch = x.shape[-1]
        out = nn.relu(_bn(train, f"{name}_bn1")(x))
        shortcut = x
        if stride != 1 or in_ch != planes:
            shortcut = _conv(planes, 1, stride, name=f"{name}_shortcut")(out)
        h = _conv(planes, 3, stride, name=f"{name}_conv1")(out)
        h = _conv(planes, 3, 1, name=f"{name}_conv2")(
            nn.relu(_bn(train, f"{name}_bn2")(h))
        )
        return h + shortcut

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = _conv(64, 3, 1, name="conv1")(x)
        for gi, planes in enumerate((64, 128, 256, 512)):
            stride = 1 if gi == 0 else 2
            for bi in range(2):
                x = self._block(
                    x, planes, stride if bi == 0 else 1, train,
                    f"layer{gi + 1}_{bi}",
                )
        x = nn.avg_pool(x, (4, 4), strides=(4, 4))
        return x.reshape(x.shape[0], -1)


class WideResNet(nn.Module):
    """WRN-d-k with LeakyReLU(0.01) (reference ``backbone/wide_resnet.py``,
    the xternalz variant Dassl modified for SSL)."""

    depth: int = 28
    widen_factor: int = 2
    drop_rate: float = 0.0

    @property
    def out_features(self) -> int:
        return 64 * self.widen_factor

    def _block(self, x, out_planes, stride, train, name):
        in_planes = x.shape[-1]
        equal = in_planes == out_planes
        act = lambda v: nn.leaky_relu(v, 0.01)
        out = act(_bn(train, f"{name}_bn1")(x))
        if not equal:
            x = out  # reference rebinds x to the activated input
        # conv1 consumes the ACTIVATED tensor in BOTH branches (reference
        # wide_resnet.py BasicBlock: `out if self.equalInOut else x` where
        # x was rebound above); only the shortcut sees the raw input (and
        # only in the equal case)
        h = _conv(out_planes, 3, stride, name=f"{name}_conv1")(out)
        h = act(_bn(train, f"{name}_bn2")(h))
        if self.drop_rate > 0:
            h = nn.Dropout(self.drop_rate, deterministic=not train)(h)
        h = _conv(out_planes, 3, 1, name=f"{name}_conv2")(h)
        short = x if equal else _conv(
            out_planes, 1, stride, name=f"{name}_shortcut", padding=[(0, 0), (0, 0)]
        )(x)
        return short + h

    @nn.compact
    def __call__(self, x, train: bool = False):
        assert (self.depth - 4) % 6 == 0
        n = (self.depth - 4) // 6
        widths = (16 * self.widen_factor, 32 * self.widen_factor,
                  64 * self.widen_factor)
        x = _conv(16, 3, 1, name="conv1")(x)
        for gi, w in enumerate(widths):
            stride = 1 if gi == 0 else 2
            for bi in range(n):
                x = self._block(
                    x, w, stride if bi == 0 else 1, train, f"block{gi + 1}_{bi}"
                )
        x = nn.leaky_relu(_bn(train, "bn1")(x), 0.01)
        x = x.mean(axis=(1, 2))
        return x


class VGG16(nn.Module):
    """VGG-16 trunk + the two 4096-d FC layers as *features* (the
    reference keeps them and drops only the final logits layer)."""

    @property
    def out_features(self) -> int:
        return 4096

    @nn.compact
    def __call__(self, x, train: bool = False):
        cfg = (64, 64, "M", 128, 128, "M", 256, 256, 256, "M",
               512, 512, 512, "M", 512, 512, 512, "M")
        i = 0
        for v in cfg:
            if v == "M":
                x = _max_pool(x, 2, 2)
            else:
                x = nn.relu(_conv(v, 3, 1, use_bias=True, name=f"conv{i}")(x))
                i += 1
        # AdaptiveAvgPool2d((7,7)) — exact torch bin semantics at any
        # input size, so the flattened dim is always 512*7*7 like the
        # reference (a 224 input is the identity fast path)
        x = _adaptive_avg_pool(x, (7, 7))
        x = x.reshape(x.shape[0], -1)
        x = nn.relu(nn.Dense(4096, name="fc1")(x))
        x = nn.Dropout(0.5, deterministic=not train)(x)
        x = nn.relu(nn.Dense(4096, name="fc2")(x))
        x = nn.Dropout(0.5, deterministic=not train)(x)
        return x


class AlexNet(nn.Module):
    """AlexNet trunk + 4096-d FC features (reference
    ``backbone/alexnet.py``; torchvision one-weird-trick layout)."""

    @property
    def out_features(self) -> int:
        return 4096

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.relu(_conv(64, 11, 4, use_bias=True, name="conv1",
                          padding=[(2, 2), (2, 2)])(x))
        x = _max_pool(x, 3, 2)
        x = nn.relu(_conv(192, 5, 1, use_bias=True, name="conv2")(x))
        x = _max_pool(x, 3, 2)
        x = nn.relu(_conv(384, 3, 1, use_bias=True, name="conv3")(x))
        x = nn.relu(_conv(256, 3, 1, use_bias=True, name="conv4")(x))
        x = nn.relu(_conv(256, 3, 1, use_bias=True, name="conv5")(x))
        x = _max_pool(x, 3, 2)
        x = _adaptive_avg_pool(x, (6, 6))  # AdaptiveAvgPool2d((6,6))
        x = x.reshape(x.shape[0], -1)
        x = nn.Dropout(0.5, deterministic=not train)(x)
        x = nn.relu(nn.Dense(4096, name="fc1")(x))
        x = nn.Dropout(0.5, deterministic=not train)(x)
        x = nn.relu(nn.Dense(4096, name="fc2")(x))
        return x


# ---------------------------------------------------------------------------
# 32x32 digit CNNs
# ---------------------------------------------------------------------------

class CNNDigit5M3SDA(nn.Module):
    """The Digit-5 feature extractor of M3SDA (reference
    ``backbone/cnn_digit5_m3sda.py``; requires 32x32 inputs)."""

    @property
    def out_features(self) -> int:
        return 2048

    @nn.compact
    def __call__(self, x, train: bool = False):
        assert x.shape[1] == 32 and x.shape[2] == 32, (
            f"Input to network must be 32x32, got {x.shape[1]}x{x.shape[2]}"
        )
        x = nn.relu(_bn(train, "bn1")(_conv(64, 5, 1, True, "conv1")(x)))
        x = _max_pool(x, 3, 2, padding=1)
        x = nn.relu(_bn(train, "bn2")(_conv(64, 5, 1, True, "conv2")(x)))
        x = _max_pool(x, 3, 2, padding=1)
        x = nn.relu(_bn(train, "bn3")(_conv(128, 5, 1, True, "conv3")(x)))
        x = x.reshape(x.shape[0], -1)  # 8*8*128 = 8192
        x = nn.relu(_bn(train, "bn1_fc")(nn.Dense(3072, name="fc1")(x)))
        x = nn.Dropout(0.5, deterministic=not train)(x)
        x = nn.relu(_bn(train, "bn2_fc")(nn.Dense(2048, name="fc2")(x)))
        return x


class CNNDigitsDG(nn.Module):
    """4x [conv-relu-maxpool] ConvNet of DDAIG (reference
    ``backbone/cnn_digitsdg.py``; 32x32 inputs -> 2*2*64 features)."""

    c_hidden: int = 64

    @property
    def out_features(self) -> int:
        return 4 * self.c_hidden

    @nn.compact
    def __call__(self, x, train: bool = False):
        assert x.shape[1] == 32 and x.shape[2] == 32, (
            f"Input to network must be 32x32, got {x.shape[1]}x{x.shape[2]}"
        )
        for i in range(4):
            x = nn.relu(_conv(self.c_hidden, 3, 1, True, f"conv{i + 1}")(x))
            x = _max_pool(x, 2, 2)
        return x.reshape(x.shape[0], -1)


class CNNDigitSingle(nn.Module):
    """Single-domain-generalization digit CNN (reference
    ``backbone/cnn_digitsingle.py``; valid-padded 5x5 convs)."""

    @property
    def out_features(self) -> int:
        return 1024

    @nn.compact
    def __call__(self, x, train: bool = False):
        assert x.shape[1] == 32 and x.shape[2] == 32, (
            f"Input to network must be 32x32, got {x.shape[1]}x{x.shape[2]}"
        )
        x = nn.relu(_conv(64, 5, 1, True, "conv1", padding=[(0, 0), (0, 0)])(x))
        x = _max_pool(x, 2, 2)
        x = nn.relu(_conv(128, 5, 1, True, "conv2", padding=[(0, 0), (0, 0)])(x))
        x = _max_pool(x, 2, 2)
        x = x.reshape(x.shape[0], -1)  # 5*5*128
        x = nn.relu(nn.Dense(1024, name="fc3")(x))
        x = nn.relu(nn.Dense(1024, name="fc4")(x))
        return x


# ---------------------------------------------------------------------------
# EfficientNet b0-b7 (reference backbone/efficientnet/)
# ---------------------------------------------------------------------------

# (width_mult, depth_mult, resolution, dropout_rate)
_EFFICIENTNET_PARAMS = {
    "b0": (1.0, 1.0, 224, 0.2),
    "b1": (1.0, 1.1, 240, 0.2),
    "b2": (1.1, 1.2, 260, 0.3),
    "b3": (1.2, 1.4, 300, 0.3),
    "b4": (1.4, 1.8, 380, 0.4),
    "b5": (1.6, 2.2, 456, 0.4),
    "b6": (1.8, 2.6, 528, 0.5),
    "b7": (2.0, 3.1, 600, 0.5),
}

# (kernel, repeats, in, out, expand, stride); se_ratio fixed at 0.25
_MBCONV_ARGS = (
    (3, 1, 32, 16, 1, 1),
    (3, 2, 16, 24, 6, 2),
    (5, 2, 24, 40, 6, 2),
    (3, 3, 40, 80, 6, 2),
    (5, 3, 80, 112, 6, 1),
    (5, 4, 112, 192, 6, 2),
    (3, 1, 192, 320, 6, 1),
)


def _round_filters(filters: int, width_mult: float, divisor: int = 8) -> int:
    filters *= width_mult
    new_f = max(divisor, int(filters + divisor / 2) // divisor * divisor)
    if new_f < 0.9 * filters:
        new_f += divisor
    return int(new_f)


def _round_repeats(repeats: int, depth_mult: float) -> int:
    return int(math.ceil(depth_mult * repeats))


class _MBConv(nn.Module):
    kernel: int
    in_ch: int
    out_ch: int
    expand: int
    stride: int
    drop_connect: float

    @nn.compact
    def __call__(self, x, train: bool = False):
        swish = nn.swish
        bn = lambda name: _bn(train, name, momentum=0.99, eps=1e-3)
        inputs = x
        oup = self.in_ch * self.expand
        if self.expand != 1:
            x = swish(bn("bn0")(_conv(oup, 1, 1, name="expand_conv")(x)))
        x = _conv(oup, self.kernel, self.stride, name="depthwise_conv",
                  groups=oup, padding="SAME")(x)
        x = swish(bn("bn1")(x))
        # squeeze-excitation (ratio 0.25 of the block INPUT filters)
        se_ch = max(1, int(self.in_ch * 0.25))
        s = x.mean(axis=(1, 2), keepdims=True)
        s = swish(nn.Conv(se_ch, (1, 1), name="se_reduce")(s))
        s = nn.Conv(oup, (1, 1), name="se_expand")(s)
        x = nn.sigmoid(s) * x
        x = bn("bn2")(_conv(self.out_ch, 1, 1, name="project_conv")(x))
        if self.stride == 1 and self.in_ch == self.out_ch:
            if self.drop_connect and train:
                keep = 1.0 - self.drop_connect
                rng = self.make_rng("dropout")
                mask = jnp.floor(
                    keep + jax.random.uniform(rng, (x.shape[0], 1, 1, 1))
                )
                x = x / keep * mask
            x = x + inputs
        return x


class EfficientNet(nn.Module):
    """EfficientNet trunk -> pooled + dropout features (reference keeps
    the 1280-d conv head and removes the logits layer)."""

    variant: str = "b0"

    @property
    def out_features(self) -> int:
        w = _EFFICIENTNET_PARAMS[self.variant][0]
        return _round_filters(1280, w)

    @nn.compact
    def __call__(self, x, train: bool = False):
        w_mult, d_mult, _, dropout_rate = _EFFICIENTNET_PARAMS[self.variant]
        bn = lambda name: _bn(train, name, momentum=0.99, eps=1e-3)
        x = _conv(_round_filters(32, w_mult), 3, 2, name="conv_stem",
                  padding="SAME")(x)
        x = nn.swish(bn("bn0")(x))

        blocks = []
        for kernel, repeats, in_ch, out_ch, expand, stride in _MBCONV_ARGS:
            in_ch = _round_filters(in_ch, w_mult)
            out_ch = _round_filters(out_ch, w_mult)
            for r in range(_round_repeats(repeats, d_mult)):
                blocks.append(
                    (kernel, in_ch if r == 0 else out_ch, out_ch, expand,
                     stride if r == 0 else 1)
                )
        n = len(blocks)
        for i, (kernel, in_ch, out_ch, expand, stride) in enumerate(blocks):
            # linear drop-connect ramp over depth (reference model.py:248-252)
            rate = 0.2 * i / n
            x = _MBConv(kernel, in_ch, out_ch, expand, stride, rate,
                        name=f"block{i}")(x, train=train)

        x = _conv(self.out_features, 1, 1, name="conv_head")(x)
        x = nn.swish(bn("bn1")(x))
        x = x.mean(axis=(1, 2))
        x = nn.Dropout(dropout_rate, deterministic=not train)(x)
        return x


# ---------------------------------------------------------------------------
# registrations (names match the reference BACKBONE_REGISTRY)
# ---------------------------------------------------------------------------

def _register(name: str, factory: Callable[..., nn.Module]):
    def build(pretrained: bool = True, verbose: bool = False, **kwargs):
        _notice_pretrained(name, pretrained)
        return factory(**kwargs)

    build.__name__ = name
    BACKBONE_REGISTRY.register(build)
    return build


_RESNET_LAYERS = {
    "resnet18": ((2, 2, 2, 2), False),
    "resnet34": ((3, 4, 6, 3), False),
    "resnet50": ((3, 4, 6, 3), True),
    "resnet101": ((3, 4, 23, 3), True),
    "resnet152": ((3, 8, 36, 3), True),
}

for _name, (_layers, _bneck) in _RESNET_LAYERS.items():
    _register(
        _name,
        lambda layers=_layers, bneck=_bneck, **kw: ResNet(
            layers=layers, bottleneck=bneck, **kw
        ),
    )

_MS_SETS = {"l123": ("layer1", "layer2", "layer3"),
            "l12": ("layer1", "layer2"),
            "l1": ("layer1",)}

for _depth in ("18", "50", "101"):
    _layers, _bneck = _RESNET_LAYERS[f"resnet{_depth}"]
    for _suffix, _ms_layers in _MS_SETS.items():
        for _kind, _tag in (("mixstyle", "ms"), ("efdmix", "efdmix")):
            _register(
                f"resnet{_depth}_{_tag}_{_suffix}",
                lambda layers=_layers, bneck=_bneck, kind=_kind,
                ms_layers=_ms_layers, **kw: ResNet(
                    layers=layers, bottleneck=bneck, ms_class=kind,
                    ms_layers=ms_layers, **kw
                ),
            )
    _register(
        f"resnet{_depth}_dynamic",
        lambda layers=_layers, bneck=_bneck, **kw: ResNet(
            layers=layers, bottleneck=bneck, dynamic=True, **kw
        ),
    )
    for _suffix, _ms_layers in _MS_SETS.items():
        _register(
            f"resnet{_depth}_dynamic_ms_{_suffix}",
            lambda layers=_layers, bneck=_bneck, ms_layers=_ms_layers,
            **kw: ResNet(
                layers=layers, bottleneck=bneck, dynamic=True,
                ms_class="mixstyle", ms_layers=ms_layers, **kw
            ),
        )

_register("preact_resnet18", lambda **kw: PreActResNet18(**kw))
_register("wide_resnet_28_2", lambda **kw: WideResNet(28, 2, **kw))
_register("wide_resnet_16_4", lambda **kw: WideResNet(16, 4, **kw))
_register("vgg16", lambda **kw: VGG16(**kw))
_register("alexnet", lambda **kw: AlexNet(**kw))
_register("cnn_digit5_m3sda", lambda **kw: CNNDigit5M3SDA(**kw))
_register("cnn_digitsdg", lambda **kw: CNNDigitsDG(**kw))
_register("cnn_digitsingle", lambda **kw: CNNDigitSingle(**kw))
for _v in _EFFICIENTNET_PARAMS:
    _register(f"efficientnet_{_v}",
              lambda v=_v, **kw: EfficientNet(variant=v, **kw))


def build_backbone(name: str, verbose: bool = False, pretrained: bool = True,
                   **kwargs) -> nn.Module:
    """Instantiate a registered backbone (reference
    ``dassl/modeling/backbone/build.py``)."""
    if verbose:
        print(f"Backbone: {name}")
    return BACKBONE_REGISTRY.get(name)(pretrained=pretrained, **kwargs)
