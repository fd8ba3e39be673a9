"""Backbone/head/network zoo coverage (reference ``dassl/modeling/``).

Every name the reference registers must exist here, construct, and have a
consistent feature dimension. Small nets run a real forward; the heavy
ImageNet-scale nets are checked with ``jax.eval_shape`` (tracing only —
unjitted CPU convs at those sizes take minutes)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ovmr_tpu.modeling import (
    BACKBONE_REGISTRY,
    NETWORK_REGISTRY,
    build_backbone,
    build_head,
    build_network,
)

# the reference's full BACKBONE_REGISTRY (dassl/modeling/backbone/__init__.py)
REFERENCE_BACKBONES = (
    ["resnet18", "resnet34", "resnet50", "resnet101", "resnet152"]
    + [f"resnet{d}_{t}_{s}" for d in (18, 50, 101)
       for t in ("ms", "efdmix") for s in ("l123", "l12", "l1")]
    + [f"resnet{d}_dynamic" for d in (18, 50, 101)]
    + [f"resnet{d}_dynamic_ms_{s}" for d in (18, 50, 101)
       for s in ("l123", "l12", "l1")]
    + ["preact_resnet18", "wide_resnet_28_2", "wide_resnet_16_4",
       "vgg16", "alexnet",
       "cnn_digit5_m3sda", "cnn_digitsdg", "cnn_digitsingle"]
    + [f"efficientnet_b{i}" for i in range(8)]
)


def test_registry_covers_reference():
    names = set(BACKBONE_REGISTRY.registered_names())
    missing = [n for n in REFERENCE_BACKBONES if n not in names]
    assert not missing, missing


SMALL_FORWARD = [
    ("resnet18", 512),
    ("wide_resnet_28_2", 128),
    ("wide_resnet_16_4", 256),
    ("preact_resnet18", 512),
    ("cnn_digit5_m3sda", 2048),
    ("cnn_digitsdg", 256),
    ("cnn_digitsingle", 1024),
    ("resnet18_ms_l123", 512),
    ("resnet18_efdmix_l1", 512),
    ("resnet18_dynamic", 512),
]


@pytest.mark.parametrize("name,fdim", SMALL_FORWARD)
def test_small_backbone_forward(name, fdim):
    key = jax.random.PRNGKey(0)
    x = jnp.ones((2, 32, 32, 3))
    m = build_backbone(name, pretrained=False)
    assert m.out_features == fdim
    rngs = {"params": key, "dropout": key, "mixstyle": key}
    vs = m.init(rngs, x, train=True)
    out, _ = m.apply(vs, x, train=True,
                     rngs={"dropout": key, "mixstyle": key},
                     mutable=["batch_stats"])
    assert out.shape == (2, fdim)
    assert np.isfinite(np.asarray(out)).all()
    out_eval = m.apply(vs, x, train=False)
    assert out_eval.shape == (2, fdim)


HEAVY_SHAPE_ONLY = [
    ("resnet34", 512, 64),
    ("resnet50", 2048, 64),
    ("resnet101", 2048, 64),
    ("resnet152", 2048, 64),
    ("resnet50_ms_l12", 2048, 64),
    ("resnet101_efdmix_l123", 2048, 64),
    ("resnet50_dynamic", 2048, 64),
    ("vgg16", 4096, 224),
    ("alexnet", 4096, 224),
    ("efficientnet_b0", 1280, 64),
    ("efficientnet_b3", 1536, 64),
    ("efficientnet_b7", 2560, 64),
]


@pytest.mark.parametrize("name,fdim,size", HEAVY_SHAPE_ONLY)
def test_heavy_backbone_shapes(name, fdim, size):
    key = jax.random.PRNGKey(0)
    m = build_backbone(name, pretrained=False)
    assert m.out_features == fdim
    x = jax.ShapeDtypeStruct((2, size, size, 3), jnp.float32)
    rngs = {"params": key, "dropout": key, "mixstyle": key}
    vs = jax.eval_shape(lambda xx: m.init(rngs, xx, train=False), x)
    out = jax.eval_shape(lambda v, xx: m.apply(v, xx, train=False), vs, x)
    assert out.shape == (2, fdim)


def test_mlp_head():
    key = jax.random.PRNGKey(0)
    h = build_head("mlp", in_features=64, hidden_layers=[32, 16],
                   activation="relu", bn=True, dropout=0.1)
    assert h.out_features == 16
    f = jnp.ones((4, 64))
    vs = h.init({"params": key, "dropout": key}, f, train=True)
    out, _ = h.apply(vs, f, train=True, rngs={"dropout": key},
                     mutable=["batch_stats"])
    assert out.shape == (4, 16)
    # int hidden_layers spec, leaky_relu path
    h2 = build_head("mlp", in_features=8, hidden_layers=4,
                    activation="leaky_relu", bn=False)
    assert h2.out_features == 4


def test_ddaig_networks():
    names = set(NETWORK_REGISTRY.registered_names())
    assert {"fcn_3x32_gctx", "fcn_3x64_gctx", "fcn_3x32_gctx_stn",
            "fcn_3x64_gctx_stn"} <= names
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (2, 32, 32, 3))
    g = build_network("fcn_3x32_gctx")
    vs = g.init({"params": key}, x, train=True)
    (xp, p), _ = g.apply(vs, x, lmda=0.3, return_p=True, train=True,
                         mutable=["batch_stats"])
    assert xp.shape == x.shape and p.shape == x.shape
    assert float(jnp.abs(p).max()) <= 1.0  # tanh-bounded perturbation
    np.testing.assert_allclose(np.asarray(xp), np.asarray(x + 0.3 * p),
                               rtol=1e-6)

    # STN variant initializes to ~identity warp: fc_loc weights are zero so
    # theta = tanh([1,0,0,1]) * identity-ish; the warp must be well-formed
    g2 = build_network("fcn_3x32_gctx_stn", image_size=32)
    vs2 = g2.init({"params": key}, x, train=True)
    out, _ = g2.apply(vs2, x, train=True, mutable=["batch_stats"])
    assert out.shape == x.shape
    assert np.isfinite(np.asarray(out)).all()


def test_affine_grid_identity_sampling():
    from ovmr_tpu.modeling.networks import affine_grid_sample

    x = jax.random.normal(jax.random.PRNGKey(1), (2, 8, 8, 3))
    theta = jnp.broadcast_to(
        jnp.array([[1.0, 0.0, 0.0], [0.0, 1.0, 0.0]]), (2, 2, 3)
    )
    out = affine_grid_sample(x, theta)
    np.testing.assert_allclose(np.asarray(out), np.asarray(x), atol=1e-5)
