"""Packed divided-attention Pallas kernel vs the XLA einsum path.

Covers both axes (space / time), the CLS splice, forward AND the custom-VJP
backward, at the real head geometry (Dh=64) and at the tiny parity-suite
geometry. Runs through the Pallas interpreter on CPU so the exact kernel
code is exercised without TPU hardware.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
from jax.experimental.pallas import tpu as pltpu

from egovlpv2_tpu.ops.divided import divided_attention


def _qkv(rs, b, s, h, dh):
    return jnp.asarray(rs.randn(b, s, 3, h, dh), jnp.float32)


CASES = [
    # (B, F, N, H, Dh) — hot pretrain shape (scaled-down batch) and odd tinies.
    # Case 0 exercises the lane-packed path (Dh*hp 128-aligned); the others
    # fall back to the per-head [3,B,H,S,Dh] path (unalignable head dims).
    (2, 4, 196, 2, 64),
    (2, 2, 9, 3, 16),
    (1, 3, 5, 1, 8),
]

FWD_ONLY_CASES = [
    # S = 1569 > _PACKED_MAX_S: the long-sequence per-head path at real Dh
    (1, 8, 196, 2, 64),
]


def test_gradients_long_sequence_xla_bwd():
    """Beyond _PACKED_MAX_S the custom VJP routes the backward through the
    XLA recompute path; it must still match grad-of-xla end to end."""
    b, f, n, h, dh = FWD_ONLY_CASES[0]
    s = 1 + f * n
    rs = np.random.RandomState(4)
    qkv = _qkv(rs, b, s, h, dh)
    ct = jnp.asarray(rs.randn(b, s, h, dh), jnp.float32)
    scale = dh ** -0.5

    def loss(x, impl):
        out = divided_attention(x, scale=scale, axis="time", num_frames=f,
                                impl=impl)
        return jnp.sum(out * ct)

    ref = jax.grad(lambda x: loss(x, "xla"))(qkv)
    with pltpu.force_tpu_interpret_mode():
        got = jax.grad(lambda x: loss(x, "pallas"))(qkv)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize("axis", ["space", "time"])
@pytest.mark.parametrize("case", FWD_ONLY_CASES)
def test_forward_long_sequence_fallback(axis, case):
    from egovlpv2_tpu.ops import divided

    b, f, n, h, dh = case
    s = 1 + f * n
    assert s > divided._PACKED_MAX_S  # really exercises the per-head path
    rs = np.random.RandomState(3)
    qkv = _qkv(rs, b, s, h, dh)
    scale = dh ** -0.5
    ref = divided_attention(qkv, scale=scale, axis=axis, num_frames=f,
                            impl="xla")
    with pltpu.force_tpu_interpret_mode():
        got = divided_attention(qkv, scale=scale, axis=axis, num_frames=f,
                                impl="pallas")
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("axis", ["space", "time"])
@pytest.mark.parametrize("case", CASES)
def test_forward_matches_xla(axis, case):
    b, f, n, h, dh = case
    rs = np.random.RandomState(0)
    qkv = _qkv(rs, b, 1 + f * n, h, dh)
    scale = dh ** -0.5
    ref = divided_attention(qkv, scale=scale, axis=axis, num_frames=f,
                            impl="xla")
    with pltpu.force_tpu_interpret_mode():
        got = divided_attention(qkv, scale=scale, axis=axis, num_frames=f,
                                impl="pallas")
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("axis", ["space", "time"])
@pytest.mark.parametrize("case", [CASES[0], CASES[1]])
def test_gradients_match_xla(axis, case):
    b, f, n, h, dh = case
    rs = np.random.RandomState(1)
    qkv = _qkv(rs, b, 1 + f * n, h, dh)
    cotangent = jnp.asarray(rs.randn(b, 1 + f * n, h, dh), jnp.float32)
    scale = dh ** -0.5

    def loss(qkv_, impl):
        out = divided_attention(qkv_, scale=scale, axis=axis, num_frames=f,
                                impl=impl)
        return jnp.sum(out * cotangent)

    ref_grad = jax.grad(lambda x: loss(x, "xla"))(qkv)
    with pltpu.force_tpu_interpret_mode():
        got_grad = jax.grad(lambda x: loss(x, "pallas"))(qkv)
    np.testing.assert_allclose(np.asarray(got_grad), np.asarray(ref_grad),
                               rtol=2e-4, atol=2e-4)


def test_video_block_pallas_impl_matches_xla():
    """The SpaceTimeBlock wired with attn_impl='pallas' (interpret mode)
    reproduces the XLA block bit-for-tolerance, including the fused i2t
    path (which routes through ops.flash / attend)."""
    from egovlpv2_tpu.core.config import FusionConfig, VideoEncoderConfig
    from egovlpv2_tpu.models.video import SpaceTimeBlock

    f, n_side, d, heads = 2, 2, 32, 2
    img = 16 * n_side
    cfg = VideoEncoderConfig(img_size=img, patch_size=16, embed_dim=d,
                             depth=2, num_heads=heads, num_frames=f)
    fus = FusionConfig(num_fuse_block=1, dim_video=d, dim_text=d)
    rs = np.random.RandomState(2)
    s = 1 + f * n_side * n_side
    x = jnp.asarray(rs.randn(2, s, d), jnp.float32)
    text = jnp.asarray(rs.randn(2, 5, d), jnp.float32)

    blk_x = SpaceTimeBlock(cfg, fus, fused=True, attn_impl="xla")
    params = blk_x.init(jax.random.PRNGKey(0), x, f, text)["params"]
    # randomize the zero-init gates/time-attn so parity is non-trivial
    params = jax.tree_util.tree_map(
        lambda p: p + 0.02 * np.random.RandomState(3).randn(*p.shape).astype(
            np.float32),
        params)
    ref = blk_x.apply({"params": params}, x, f, text)

    blk_p = SpaceTimeBlock(cfg, fus, fused=True, attn_impl="pallas")
    with pltpu.force_tpu_interpret_mode():
        got = blk_p.apply({"params": params}, x, f, text)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)

def test_gradients_long_sequence_windowed_space():
    """Above _SPACE_WINDOW_MIN_S the space axis runs the windowed-key
    kernels (fwd + pallas bwd with the CLS row/column handled out of
    window); gradients must match grad-of-xla."""
    from egovlpv2_tpu.ops import divided

    b, f, n, h, dh = FWD_ONLY_CASES[0]
    s = 1 + f * n
    assert divided._windowed("space", s)
    rs = np.random.RandomState(7)
    qkv = _qkv(rs, b, s, h, dh)
    ct = jnp.asarray(rs.randn(b, s, h, dh), jnp.float32)
    scale = dh ** -0.5

    def loss(x, impl):
        out = divided_attention(x, scale=scale, axis="space", num_frames=f,
                                impl=impl)
        return jnp.sum(out * ct)

    ref = jax.grad(lambda x: loss(x, "xla"))(qkv)
    with pltpu.force_tpu_interpret_mode():
        got = jax.grad(lambda x: loss(x, "pallas"))(qkv)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)


def test_windowed_frame_block_parity_pretrain_shape():
    """Force windowing below the production threshold so the frame-block
    kernels (fwd + bwd, CLS block + joint softmax) are exercised at the
    pretrain-like shape (windowed shapes always route to the per-head
    path; the packed kernels stay dense)."""
    from egovlpv2_tpu.ops import divided

    b, f, n, h, dh = 2, 4, 196, 2, 64
    s = 1 + f * n
    rs = np.random.RandomState(9)
    qkv = _qkv(rs, b, s, h, dh)
    ct = jnp.asarray(rs.randn(b, s, h, dh), jnp.float32)
    scale = dh ** -0.5

    def loss(x, impl):
        out = divided_attention(x, scale=scale, axis="space", num_frames=f,
                                impl=impl)
        return jnp.sum(out * ct)

    old = divided._SPACE_WINDOW_MIN_S
    divided._SPACE_WINDOW_MIN_S = 512
    try:
        assert divided._windowed("space", s)
        ref = divided_attention(qkv, scale=scale, axis="space", num_frames=f,
                                impl="xla")
        ref_g = jax.grad(lambda x: loss(x, "xla"))(qkv)
        with pltpu.force_tpu_interpret_mode():
            got = divided_attention(qkv, scale=scale, axis="space",
                                    num_frames=f, impl="pallas")
            got_g = jax.grad(lambda x: loss(x, "pallas"))(qkv)
    finally:
        divided._SPACE_WINDOW_MIN_S = old
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(got_g), np.asarray(ref_g),
                               rtol=2e-4, atol=2e-4)


def test_long_s_packed_head_grouping():
    """The long-S packed route must stay expressible at the production
    16f/32f shapes: 128-aligned lane blocks with the raised budget give
    hp=4 at S=3137 and hp=2 at S=6273 (routing would silently fall back
    to the transpose-heavy per-head path otherwise)."""
    from egovlpv2_tpu.ops import divided as d

    assert d._packed_heads(12, 64, 3137, 2, budget=d._LONG_BUDGET) == 4
    assert d._packed_heads(12, 64, 6273, 2, budget=d._LONG_BUDGET) == 2
    # pretrain shape keeps the measured-optimal short-S grouping
    assert d._packed_heads(12, 64, 785, 2) == 6
    assert d._packed_heads(12, 64, 785, 2, budget=d._BWD_BUDGET) == 2
def test_gradients_time_fp_lane_reduce(monkeypatch):
    """The per-head lane-reduce frame-pair variant (EGOVLP_TIME_FP_MXU=0)
    stays parity-covered now that the MXU segmented-reduce formulation is
    the default (round-4 step bench: 299 vs 328 ms, docs/ROUND4_NOTES.md)."""
    from egovlpv2_tpu.ops import divided

    monkeypatch.setattr(divided, "_TIME_FP_MXU", False)
    b, f, n, h, dh = CASES[0]
    s = 1 + f * n
    rs = np.random.RandomState(7)
    qkv = _qkv(rs, b, s, h, dh)
    ct = jnp.asarray(rs.randn(b, s, h, dh), jnp.float32)
    scale = dh ** -0.5

    def loss(x, impl):
        out = divided_attention(x, scale=scale, axis="time", num_frames=f,
                                impl=impl)
        return jnp.sum(out * ct)

    ref = jax.grad(lambda x: loss(x, "xla"))(qkv)
    with pltpu.force_tpu_interpret_mode():
        got = jax.grad(lambda x: loss(x, "pallas"))(qkv)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize("axis", ["space", "time"])
def test_degenerate_tiny_s_falls_back(axis):
    """S < 16 (e.g. 2 frames x 2 patches, S=5) has no kernel tile: the
    kernels' 8-row CLS block assumes S >= 16, so the pallas impl must route
    these shapes to the XLA path instead of aborting at trace time."""
    b, f, n, h, dh = 1, 2, 2, 2, 64
    s = 1 + f * n
    rs = np.random.RandomState(0)
    qkv = _qkv(rs, b, s, h, dh)
    out = divided_attention(qkv, scale=dh ** -0.5, axis=axis,
                            num_frames=f, impl="pallas")
    ref = divided_attention(qkv, scale=dh ** -0.5, axis=axis,
                            num_frames=f, impl="xla")
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-6, atol=1e-6)


@pytest.mark.parametrize("case", [
    # (B, F, N, H, Dh): F > _TIME_FP_MAX_F and S > _PACKED_MAX_S so the
    # patch-major branch engages. Windows are exact divisors of s-1 since
    # the round-5 Mosaic fix (partial last windows SIGABRT the compiler):
    # F=16/n=150 -> win=96 (6 groups, 25 windows); F=32/n=50 -> win=64
    # (2 groups, 25 windows).
    (1, 16, 150, 2, 64),
    (1, 32, 50, 2, 64),
])
def test_time_pm_forward_and_gradients(case, monkeypatch):
    """EGOVLP_TIME_PM: patch-major long-S time attention (the space
    frame-block kernels with a block-diagonal window bias) vs grad-of-xla,
    including the CLS splice, non-_TIME_PM_WIN window sizes, and the pallas
    window backward (no XLA-vjp fallback)."""
    from egovlpv2_tpu.ops import divided

    monkeypatch.setattr(divided, "_TIME_PM", True)
    b, f, n, h, dh = case
    s = 1 + f * n
    rs = np.random.RandomState(17)
    qkv = _qkv(rs, b, s, h, dh)
    ct = jnp.asarray(rs.randn(b, s, h, dh), jnp.float32)
    scale = dh ** -0.5
    assert divided._time_pm("time", s, f)

    ref_fwd = divided_attention(qkv, scale=scale, axis="time", num_frames=f,
                                impl="xla")
    with pltpu.force_tpu_interpret_mode():
        got_fwd = divided_attention(qkv, scale=scale, axis="time",
                                    num_frames=f, impl="pallas")
    np.testing.assert_allclose(np.asarray(got_fwd), np.asarray(ref_fwd),
                               rtol=2e-5, atol=2e-5)

    def loss(x, impl):
        out = divided_attention(x, scale=scale, axis="time", num_frames=f,
                                impl=impl)
        return jnp.sum(out * ct)

    ref = jax.grad(lambda x: loss(x, "xla"))(qkv)
    with pltpu.force_tpu_interpret_mode():
        got = jax.grad(lambda x: loss(x, "pallas"))(qkv)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)


def test_time_pm_multi_group_lane_mapping(monkeypatch):
    """Patch-major time with MORE THAN ONE head group per device (h=4,
    hp=2) — catches swapped lane-block group mappings that single-group
    cases hide, and exercises the permute round-trip at a second head
    geometry."""
    from egovlpv2_tpu.ops import divided

    monkeypatch.setattr(divided, "_TIME_PM", True)
    monkeypatch.setattr(divided, "_LONG_BUDGET", 4_000_000)
    b, f, n, h, dh = 1, 16, 150, 4, 64
    s = 1 + f * n
    assert divided._packed_heads(h, dh, s, 4, budget=4_000_000) == 2
    rs = np.random.RandomState(19)
    qkv = _qkv(rs, b, s, h, dh)
    ct = jnp.asarray(rs.randn(b, s, h, dh), jnp.float32)
    scale = dh ** -0.5

    def loss(x, impl):
        out = divided_attention(x, scale=scale, axis="time", num_frames=f,
                                impl=impl)
        return jnp.sum(out * ct)

    ref_fwd = divided_attention(qkv, scale=scale, axis="time", num_frames=f,
                                impl="xla")
    ref_g = jax.grad(lambda x: loss(x, "xla"))(qkv)
    with pltpu.force_tpu_interpret_mode():
        got_fwd = divided_attention(qkv, scale=scale, axis="time",
                                    num_frames=f, impl="pallas")
        got_g = jax.grad(lambda x: loss(x, "pallas"))(qkv)
    np.testing.assert_allclose(np.asarray(got_fwd), np.asarray(ref_fwd),
                               rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(got_g), np.asarray(ref_g),
                               rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize("mode", ["space", "time_pm"])
def test_space_cls_allh_forward_and_gradients(mode, monkeypatch):
    """EGOVLP_SPACE_CLS_ALLH: the all-heads segmented-reduce CLS pass of
    the packed frame-block kernels (space axis and the patch-major TIME
    regime) vs grad-of-xla — fwd row 0 via `_cls_row_fwd_allh`, bwd CLS
    dense contributions via `_cls_dense_bwd_allh`, incl. the row-0
    where-merge with the broadcast dq0."""
    from egovlpv2_tpu.ops import divided

    monkeypatch.setattr(divided, "_SPACE_CLS_ALLH", True)
    if mode == "space":
        axis, (b, f, n, h, dh) = "space", (2, 4, 196, 2, 64)
    else:
        axis, (b, f, n, h, dh) = "time", (1, 16, 150, 2, 64)
        monkeypatch.setattr(divided, "_TIME_PM", True)
    s = 1 + f * n
    rs = np.random.RandomState(23)
    qkv = _qkv(rs, b, s, h, dh)
    ct = jnp.asarray(rs.randn(b, s, h, dh), jnp.float32)
    scale = dh ** -0.5

    def loss(x, impl):
        out = divided_attention(x, scale=scale, axis=axis, num_frames=f,
                                impl=impl)
        return jnp.sum(out * ct)

    ref_fwd = divided_attention(qkv, scale=scale, axis=axis, num_frames=f,
                                impl="xla")
    ref_g = jax.grad(lambda x: loss(x, "xla"))(qkv)
    with pltpu.force_tpu_interpret_mode():
        got_fwd = divided_attention(qkv, scale=scale, axis=axis,
                                    num_frames=f, impl="pallas")
        got_g = jax.grad(lambda x: loss(x, "pallas"))(qkv)
    np.testing.assert_allclose(np.asarray(got_fwd), np.asarray(ref_fwd),
                               rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(got_g), np.asarray(ref_g),
                               rtol=2e-4, atol=2e-4)


def test_pm_rows_hoisted_layout_contract(monkeypatch):
    """EGOVLP_PM_HOIST: `divided_attention(pm_rows=True)` consumes and
    returns PATCH-MAJOR rows. Hoisted kernel == permute-inside kernel ==
    XLA, and the fallback (pm_rows on a path that cannot consume it, e.g.
    impl='xla') round-trips through frame-major correctly."""
    from egovlpv2_tpu.ops import divided

    monkeypatch.setattr(divided, "_TIME_PM", True)
    b, f, n, h, dh = 1, 16, 150, 2, 64
    s = 1 + f * n
    rs = np.random.RandomState(29)
    qkv = _qkv(rs, b, s, h, dh)
    scale = dh ** -0.5

    ref = divided_attention(qkv, scale=scale, axis="time", num_frames=f,
                            impl="xla")

    flat = qkv.reshape(b, s, 3 * h * dh)
    pm = divided._to_patch_major(flat, f).reshape(b, s, 3, h, dh)
    with pltpu.force_tpu_interpret_mode():
        out_pm = divided_attention(pm, scale=scale, axis="time",
                                   num_frames=f, impl="pallas", pm_rows=True)
    got = divided._from_patch_major(
        out_pm.reshape(b, s, h * dh), f).reshape(b, s, h, dh)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)

    # fallback: same contract via the XLA path
    out_pm_x = divided_attention(pm, scale=scale, axis="time", num_frames=f,
                                 impl="xla", pm_rows=True)
    got_x = divided._from_patch_major(
        out_pm_x.reshape(b, s, h * dh), f).reshape(b, s, h, dh)
    np.testing.assert_allclose(np.asarray(got_x), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_pm_hoist_block_parity_and_grads(monkeypatch):
    """SpaceTimeBlock with EGOVLP_PM_HOIST on (pallas, interpret mode)
    matches the un-hoisted XLA block at a patch-major-regime shape,
    forward AND input gradients (the hoisted permutes are differentiated
    by JAX outside the custom VJP)."""
    from egovlpv2_tpu.core.config import FusionConfig, VideoEncoderConfig
    from egovlpv2_tpu.models.video import SpaceTimeBlock
    from egovlpv2_tpu.ops import divided

    monkeypatch.setattr(divided, "_TIME_PM", True)
    f, n, d, heads = 16, 98, 128, 2  # S = 1569 > _PACKED_MAX_S; n | win
    cfg = VideoEncoderConfig(img_size=224, patch_size=16, embed_dim=d,
                             depth=1, num_heads=heads, num_frames=f)
    fus = FusionConfig(num_fuse_block=1, dim_video=d, dim_text=d)
    rs = np.random.RandomState(31)
    s = 1 + f * n
    assert divided._time_pm("time", s, f)
    x = jnp.asarray(rs.randn(1, s, d), jnp.float32)
    ct = jnp.asarray(rs.randn(1, s, d), jnp.float32)

    blk_x = SpaceTimeBlock(cfg, fus, fused=False, attn_impl="xla")
    params = blk_x.init(jax.random.PRNGKey(0), x, f)["params"]
    params = jax.tree_util.tree_map(
        lambda p: p + 0.02 * np.random.RandomState(3).randn(*p.shape).astype(
            np.float32), params)

    def loss(x, blk):
        return jnp.sum(blk.apply({"params": params}, x, f) * ct)

    ref = blk_x.apply({"params": params}, x, f)
    ref_g = jax.grad(lambda q: loss(q, blk_x))(x)

    monkeypatch.setattr(divided, "_PM_HOIST", True)
    blk_p = SpaceTimeBlock(cfg, fus, fused=False, attn_impl="pallas")
    with pltpu.force_tpu_interpret_mode():
        got = blk_p.apply({"params": params}, x, f)
        got_g = jax.grad(lambda q: loss(q, blk_p))(x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=3e-4, atol=3e-4)
    np.testing.assert_allclose(np.asarray(got_g), np.asarray(ref_g),
                               rtol=3e-4, atol=3e-4)
