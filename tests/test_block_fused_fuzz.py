"""Seeded fuzz of the Pallas/XLA seam in ops/block_fused.py.

The fixed-shape parity tests (test_block_fused.py) check known-good
points; this file hammers the EDGES the tile picker and router live on —
the padded-x-tile byte envelope, g=1/g=2 routing, the weight-residency
tiers, non-dividing batches/chunks, sub-lane widths — with seeded random
sweeps so a tile off-by-one or a budget regression fails loudly:

1. `_pick_tile` divisor contract (exhaustive small sweep);
2. tile-picker budget invariants over thousands of random shapes (pure
   host math — no kernels run);
3. routing fuzz: with every kernel/XLA entry stubbed, the static route
   chosen by `_fused_block_fwd_impl` for random (including hostile)
   widths/dtypes is always LEGAL — fused entries only when the flavor
   allows, g within the VMEM budgets, chunked only beyond the residency
   tier, shape/dtype preserved;
4. numeric fuzz: random shapes around sublane-pad boundaries, mask
   on/off, fwd + dx, interpret-mode kernels vs the XLA block;
5. weight-tier numerics: one real-size draw each for the RESIDENT
   (ViT-L-like 16.8 MB bf16 MLP) and CHUNKED (>18 MB) routes;
6. tensor-parallel block fuzz: random head/width splits at model=2/4
   on the virtual mesh vs the single-chip packed block;
7. `fused_mlp_half_chunked` across chunk counts (incl. non-dividing,
   which the kernel bumps) and g_limits.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

import ovmr_tpu.ops.block_fused as bf
from ovmr_tpu.ops.block_fused import (
    _ATTN_W_CUTOFF,
    _ATTN_W_SMALL,
    _MLP_W_CUTOFF,
    _MLP_W_RESIDENT_FWD,
    _TILE_BYTES,
    _TILE_X_BYTES,
    _block_flavor,
    _g_limits,
    _pick_tile,
    _tile_token_limit,
    fused_mlp_half_chunked,
    fused_residual_block,
)
from ovmr_tpu.ops.layers import (
    causal_mask,
    layer_norm,
    mlp_block,
    residual_attention_block,
)


def _params(key, d, hidden, dtype=jnp.float32, scale=0.05):
    shapes = [
        ("w_qkv", (d, 3 * d)), ("b_qkv", (3 * d,)),
        ("w_out", (d, d)), ("b_out", (d,)),
        ("ln_1_scale", (d,)), ("ln_1_bias", (d,)),
        ("c_fc_w", (d, hidden)), ("c_fc_b", (hidden,)),
        ("c_proj_w", (hidden, d)), ("c_proj_b", (d,)),
        ("ln_2_scale", (d,)), ("ln_2_bias", (d,)),
    ]
    p = {}
    for i, (k, s) in enumerate(shapes):
        if "scale" in k:
            p[k] = jnp.ones(s, dtype)
        elif "bias" in k and k.startswith("ln"):
            p[k] = jnp.zeros(s, dtype)
        else:
            p[k] = (
                jax.random.normal(jax.random.fold_in(key, i), s) * scale
            ).astype(dtype)
    return p


# ---------------------------------------------------------------------------
# 1. _pick_tile contract
# ---------------------------------------------------------------------------


def test_pick_tile_contract_exhaustive():
    for b in range(1, 65):
        for limit in range(0, 21):
            g = _pick_tile(b, limit)
            assert 1 <= g <= b and b % g == 0
            assert g <= max(limit, 1)
            # largest divisor under the limit
            for cand in range(g + 1, min(b, max(limit, 1)) + 1):
                assert b % cand != 0


# ---------------------------------------------------------------------------
# 2. tile-picker budget invariants (host math only)
# ---------------------------------------------------------------------------


def test_tile_budget_invariants_fuzz():
    rng = np.random.default_rng(7)
    for _ in range(3000):
        l = int(rng.integers(1, 700))
        d = int(rng.choice([64, 128, 256, 384, 512, 640, 768, 1024, 1280]))
        hidden = int(rng.choice([2, 3, 4])) * d
        itemsize = int(rng.choice([2, 4]))
        l_pad = -8 * (-l // 8)

        g_tok = _tile_token_limit(l, d, itemsize)
        assert g_tok >= 1
        if g_tok > 1:
            # the padded x-tile of a full-limit tile fits the envelope
            assert g_tok * l_pad * d * itemsize <= _TILE_X_BYTES
        # one more row would overflow (limit is tight), unless clamped at 1
        assert (g_tok + 1) * l_pad * d * itemsize > _TILE_X_BYTES

        g_attn, g_mlp = _g_limits(l, d, hidden, itemsize)
        assert 1 <= g_attn <= 16 and 1 <= g_mlp <= 16
        assert g_attn <= g_tok and g_mlp <= g_tok
        per_g_attn = l * d * itemsize * 4 + l * l * 4
        per_g_mlp = l * hidden * 4 + l * d * itemsize * 2
        if g_attn > 1:
            assert g_attn * per_g_attn <= _TILE_BYTES
        if g_mlp > 1:
            assert g_mlp * per_g_mlp <= 7 * 1024 * 1024


# ---------------------------------------------------------------------------
# 3. routing fuzz — every randomly drawn tower lands on a LEGAL route
# ---------------------------------------------------------------------------


def test_routing_fuzz_legal_routes(monkeypatch):
    calls = []

    def rec(name):
        def stub(x, *a, **k):
            calls.append((name, k.get("g_limit"), k.get("chunks")))
            return x

        return stub

    monkeypatch.setattr(bf, "fused_attn_half", rec("attn"))
    monkeypatch.setattr(bf, "fused_mlp_half", rec("mlp"))
    monkeypatch.setattr(bf, "fused_mlp_half_chunked", rec("chunked"))
    # stub the XLA fallback math too so huge hostile towers cost nothing
    import ovmr_tpu.ops.layers as layers

    monkeypatch.setattr(
        layers, "multi_head_attention", lambda xln, p, n_head, mask=None: xln
    )
    monkeypatch.setattr(layers, "mlp_block", lambda xln, p: xln)

    rng = np.random.default_rng(11)
    for trial in range(120):
        d = int(rng.choice([64, 128, 192, 256, 384, 512, 768, 896, 1024]))
        hidden = int(rng.choice([2, 3, 4, 8])) * d
        if rng.random() < 0.15:
            hidden += 64  # non-lane-aligned hidden
        l = int(rng.integers(1, 620))
        b = int(rng.integers(1, 9))
        n_head = int(rng.choice([h for h in (1, 2, 4, 8) if d % h == 0]))
        dtype = [jnp.bfloat16, jnp.float32, jnp.float16][
            int(rng.integers(0, 3))
        ]
        w_dtype = jnp.int8 if rng.random() < 0.1 else dtype

        x = jnp.zeros((b, l, d), dtype)
        p = {
            k: jnp.zeros(s, w_dtype if k == "w_qkv" else dtype)
            for k, s in [
                ("w_qkv", (d, 3 * d)), ("b_qkv", (3 * d,)),
                ("w_out", (d, d)), ("b_out", (d,)),
                ("ln_1_scale", (d,)), ("ln_1_bias", (d,)),
                ("c_fc_w", (d, hidden)), ("c_fc_b", (hidden,)),
                ("c_proj_w", (hidden, d)), ("c_proj_b", (d,)),
                ("ln_2_scale", (d,)), ("ln_2_bias", (d,)),
            ]
        }
        calls.clear()
        with jax.disable_jit():
            out = bf._fused_block_fwd_impl(x, p, n_head, None)
        assert out.shape == x.shape and out.dtype == x.dtype, (trial, d, l)

        unfused, attn_w, mlp_w = _block_flavor(x, p)
        itemsize = x.dtype.itemsize
        g_attn_lim, g_mlp_lim = _g_limits(l, d, hidden, itemsize)
        names = [c[0] for c in calls]
        ctx = (trial, b, l, d, hidden, str(dtype), str(w_dtype), calls)

        if unfused:
            assert names == [], ctx
            continue
        # attention half: fused iff weights fit, g within budget (and
        # capped at 2 above the measured "small" tier)
        if attn_w <= _ATTN_W_CUTOFF:
            assert names[0] == "attn", ctx
            g = calls[0][1]
            assert 1 <= g <= g_attn_lim, ctx
            if attn_w > _ATTN_W_SMALL:
                assert g <= 2, ctx
        else:
            assert "attn" not in names, ctx
        # MLP half: exactly one route, and chunked only past the
        # residency tier alongside a fused attention half
        mlp_routes = [c for c in calls if c[0] in ("mlp", "chunked")]
        assert len(mlp_routes) <= 1, ctx
        if mlp_w <= _MLP_W_CUTOFF:
            assert mlp_routes and mlp_routes[0][0] == "mlp", ctx
            assert 1 <= mlp_routes[0][1] <= g_mlp_lim, ctx
        elif mlp_routes and mlp_routes[0][0] == "mlp":  # resident tier
            assert "attn" in names, ctx
            assert mlp_w <= _MLP_W_RESIDENT_FWD, ctx
            g = mlp_routes[0][1]
            assert 1 <= g <= 2 and g <= _tile_token_limit(l, d, itemsize), ctx
        elif mlp_routes:  # chunked tier
            assert "attn" in names, ctx
            assert (
                mlp_w > _MLP_W_RESIDENT_FWD
                or _tile_token_limit(l, d, itemsize) < 2
            ), ctx
            assert mlp_routes[0][2] >= 2, ctx


# ---------------------------------------------------------------------------
# 4. numeric fuzz — interpret kernels vs XLA at random shapes
# ---------------------------------------------------------------------------


def _fwd_cases():
    rng = np.random.default_rng(23)
    cases = []
    for _ in range(12):
        d = int(rng.choice([64, 128, 256]))
        cases.append(
            (
                int(rng.integers(1, 7)),  # b
                int(rng.choice([1, 7, 8, 9, 16, 17, 25, 33, 56, 77, 80, 96])),
                d,
                int(rng.choice([h for h in (1, 2, 4, 8) if d % h == 0])),
                [jnp.float32, jnp.bfloat16][int(rng.integers(0, 2))],
                bool(rng.integers(0, 2)),
            )
        )
    return cases


@pytest.mark.parametrize("b,l,d,n_head,dtype,masked", _fwd_cases())
def test_numeric_fuzz_fwd(b, l, d, n_head, dtype, masked):
    key = jax.random.PRNGKey(b * 10007 + l * 101 + d)
    p = _params(key, d, 4 * d, dtype)
    x = jax.random.normal(jax.random.fold_in(key, 99), (b, l, d), dtype)
    mask = causal_mask(l) if masked else None
    ref = residual_attention_block(x, p, n_head, mask)
    got = fused_residual_block(x, p, n_head, mask, interpret=True)
    tol = 2e-5 if dtype == jnp.float32 else 2.5e-2
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(ref, np.float32),
        atol=tol, rtol=tol,
    )


def _bwd_cases():
    rng = np.random.default_rng(31)
    cases = []
    for _ in range(5):
        d = int(rng.choice([64, 128]))
        cases.append(
            (
                int(rng.integers(1, 5)),
                int(rng.choice([1, 7, 9, 17, 33, 41, 77])),
                d,
                int(rng.choice([h for h in (1, 2, 4) if d % h == 0])),
                bool(rng.integers(0, 2)),
            )
        )
    return cases


@pytest.mark.parametrize("b,l,d,n_head,masked", _bwd_cases())
def test_numeric_fuzz_bwd(b, l, d, n_head, masked):
    key = jax.random.PRNGKey(b * 31 + l * 7 + d)
    p = _params(key, d, 4 * d, jnp.float32)
    x = jax.random.normal(jax.random.fold_in(key, 99), (b, l, d), jnp.float32)
    mask = causal_mask(l) if masked else None

    def loss_fused(x_, p_):
        return jnp.sum(
            fused_residual_block(x_, p_, n_head, mask=mask, interpret=True)
            ** 2
        )

    def loss_ref(x_, p_):
        return jnp.sum(residual_attention_block(x_, p_, n_head, mask) ** 2)

    gx_f, gp_f = jax.grad(loss_fused, argnums=(0, 1))(x, p)
    gx_r, gp_r = jax.grad(loss_ref, argnums=(0, 1))(x, p)
    np.testing.assert_allclose(np.asarray(gx_f), np.asarray(gx_r),
                               atol=1e-4, rtol=1e-4)
    for k in gp_r:
        np.testing.assert_allclose(
            np.asarray(gp_f[k]), np.asarray(gp_r[k]),
            atol=2e-4, rtol=2e-4, err_msg=k,
        )


# ---------------------------------------------------------------------------
# 5. weight-tier numerics (resident and chunked routes, real sizes)
# ---------------------------------------------------------------------------


def test_resident_mlp_tier_numerics():
    """ViT-L-like bf16 tower (16.8 MB MLP) takes the RESIDENT route
    (>_MLP_W_CUTOFF, <=_MLP_W_RESIDENT_FWD) and matches XLA."""
    d, hidden = 1024, 4096
    p = _params(jax.random.PRNGKey(3), d, hidden, jnp.bfloat16, scale=0.02)
    mlp_w = (p["c_fc_w"].size + p["c_proj_w"].size) * 2
    assert _MLP_W_CUTOFF < mlp_w <= _MLP_W_RESIDENT_FWD  # tier guard
    x = jax.random.normal(jax.random.PRNGKey(4), (2, 9, d), jnp.bfloat16)
    ref = residual_attention_block(x, p, 16, None)
    got = fused_residual_block(x, p, 16, interpret=True)
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(ref, np.float32),
        atol=3e-2, rtol=3e-2,
    )


def test_chunked_mlp_tier_numerics():
    """Beyond the residency tier (25 MB bf16 MLP, attention still fused)
    the hidden-chunked kernel engages and matches XLA."""
    d, hidden = 768, 8192
    p = _params(jax.random.PRNGKey(5), d, hidden, jnp.bfloat16, scale=0.02)
    mlp_w = (p["c_fc_w"].size + p["c_proj_w"].size) * 2
    attn_w = (p["w_qkv"].size + p["w_out"].size) * 2
    assert mlp_w > _MLP_W_RESIDENT_FWD and attn_w <= _ATTN_W_CUTOFF
    x = jax.random.normal(jax.random.PRNGKey(6), (2, 9, d), jnp.bfloat16)
    ref = residual_attention_block(x, p, 12, None)
    got = fused_residual_block(x, p, 12, interpret=True)
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(ref, np.float32),
        atol=3e-2, rtol=3e-2,
    )


# ---------------------------------------------------------------------------
# 6. tensor-parallel block fuzz — random head/width splits on the mesh
# ---------------------------------------------------------------------------


def _tp_cases():
    rng = np.random.default_rng(41)
    cases = []
    for _ in range(5):
        msize = int(rng.choice([2, 4]))
        d = int(rng.choice([64, 128, 256]))
        heads = [h for h in (2, 4, 8) if h % msize == 0 and d % h == 0]
        cases.append(
            (
                msize,
                d,
                int(rng.choice(heads)),
                int(rng.integers(1, 5)),          # b
                int(rng.choice([1, 7, 9, 17, 33, 77])),  # l
                bool(rng.integers(0, 2)),          # masked
            )
        )
    # non-dividing head counts: the padded route (pad_head_shards zero-pads
    # the head axis onto the mesh — exact zeros). 3-on-2 = one pad head per
    # chip pair, 1-on-4 = three pure-pad chips, 6-on-4 = uneven remainder.
    for msize, d, n_head in ((2, 192, 3), (4, 64, 1), (4, 192, 6)):
        cases.append((msize, d, n_head,
                      int(rng.integers(1, 5)),
                      int(rng.choice([1, 7, 9, 17, 33, 77])),
                      bool(rng.integers(0, 2))))
    return cases


@pytest.mark.parametrize("msize,d,n_head,b,l,masked", _tp_cases())
def test_tp_block_fuzz(msize, d, n_head, b, l, masked):
    """The per-chip TP block (head-split attention, hidden-split MLP,
    fp32 psum seams) matches the single-chip packed block at random
    splits/shapes — the seam the fixed-shape TP tests don't sweep.
    Head counts that don't divide the axis take the zero-padded layout."""
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    from ovmr_tpu.ops.block_fused_tp import (
        TP_BLOCK_AXES,
        make_tp_block,
        pad_head_shards,
        split_qkv_blocks,
    )
    from ovmr_tpu.parallel import build_mesh

    key = jax.random.PRNGKey(msize * 1000 + d + l)
    p = _params(key, d, 4 * d, jnp.float32)
    x = jax.random.normal(jax.random.fold_in(key, 9), (b, l, d), jnp.float32)
    mask = causal_mask(l) if masked else None
    ref = residual_attention_block(x, p, n_head, mask)

    mesh = build_mesh(data=1, model=msize)
    sp = split_qkv_blocks(p)
    if n_head % msize:
        sp = pad_head_shards(sp, d // n_head, msize)
    specs = {}
    for name, leaf in sp.items():
        axis = TP_BLOCK_AXES[name]
        spec = [None] * leaf.ndim
        if axis is not None:
            spec[axis] = "model"
        specs[name] = P(*spec)
    block = make_tp_block(msize, interpret=True)
    fn = shard_map(
        lambda x_, p_: block(x_, p_, n_head, mask),
        mesh=mesh,
        in_specs=(P(), specs),
        out_specs=P(),
        check_vma=False,
    )
    got = jax.jit(fn)(x, sp)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), atol=2e-5, rtol=2e-5
    )


# ---------------------------------------------------------------------------
# 7. chunked-MLP kernel across chunk counts and tiles
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("chunks", [2, 3, 5, 7])
@pytest.mark.parametrize("g_limit", [1, 3])
def test_chunked_mlp_fuzz(chunks, g_limit):
    """Non-dividing chunk counts are bumped to a divisor of hidden; every
    (chunks, g) combo must agree with the XLA MLP half."""
    d, hidden, b, l = 128, 512, 3, 17
    key = jax.random.PRNGKey(chunks * 10 + g_limit)
    p = _params(key, d, hidden, jnp.float32)
    x = jax.random.normal(jax.random.fold_in(key, 1), (b, l, d), jnp.float32)
    ref = x + mlp_block(layer_norm(x, p["ln_2_scale"], p["ln_2_bias"]), p)
    got = fused_mlp_half_chunked(
        x, p["c_fc_w"], p["c_fc_b"], p["c_proj_w"], p["c_proj_b"],
        p["ln_2_scale"], p["ln_2_bias"],
        g_limit=g_limit, chunks=chunks, interpret=True,
    )
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), atol=2e-5, rtol=2e-5
    )
