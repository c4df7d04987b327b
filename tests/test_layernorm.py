"""Fused LayerNorm kernel parity (Pallas interpreter on CPU).

The kernel must match flax nn.LayerNorm numerics (f32 fast-variance stats,
`flax.linen.normalization._compute_stats`) in forward AND gradients,
including row counts that don't divide the kernel's row-tile (boundary
tiles contribute garbage rows that must be masked out of dscale/dbias)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import linen as nn
from jax.experimental.pallas import tpu as pltpu

from egovlpv2_tpu.ops import layernorm as L


def _ref_ln(x, scale, bias, eps):
    return L._ln_xla(x, scale, bias, eps)


@pytest.mark.parametrize("shape", [(4, 80, 256), (300, 256), (256, 128)])
def test_forward_matches_flax(shape):
    rs = np.random.RandomState(0)
    x = jnp.asarray(rs.randn(*shape), jnp.float32)
    scale = jnp.asarray(1.0 + 0.1 * rs.randn(shape[-1]), jnp.float32)
    bias = jnp.asarray(0.1 * rs.randn(shape[-1]), jnp.float32)
    mod = nn.LayerNorm(epsilon=1e-5)
    flax_out = mod.apply({"params": {"scale": scale, "bias": bias}}, x)
    with pltpu.force_tpu_interpret_mode():
        out = L.layernorm(x, scale, bias, eps=1e-5, impl="pallas")
    np.testing.assert_allclose(np.asarray(out), np.asarray(flax_out),
                               rtol=2e-6, atol=2e-6)


def test_forward_bf16_stats_in_f32():
    rs = np.random.RandomState(1)
    x = jnp.asarray(rs.randn(64, 256), jnp.bfloat16)
    scale = jnp.ones(256, jnp.float32)
    bias = jnp.zeros(256, jnp.float32)
    with pltpu.force_tpu_interpret_mode():
        out = L.layernorm(x, scale, bias, eps=1e-5, impl="pallas")
    assert out.dtype == jnp.bfloat16
    ref = _ref_ln(x, scale, bias, 1e-5)
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(ref, np.float32),
                               rtol=1e-2, atol=1e-2)


@pytest.mark.parametrize("rows", [256, 300, 520])
def test_gradients_match_reference(rows):
    """dx / dscale / dbias vs jax.grad of the XLA reference — rows=300/520
    exercise the boundary-tile masking in the dscale/dbias accumulation."""
    rs = np.random.RandomState(2)
    d = 256
    x = jnp.asarray(rs.randn(rows, d), jnp.float32)
    scale = jnp.asarray(1.0 + 0.1 * rs.randn(d), jnp.float32)
    bias = jnp.asarray(0.1 * rs.randn(d), jnp.float32)
    w = jnp.asarray(rs.randn(rows, d), jnp.float32)  # loss weights

    def loss_ref(x, s, b):
        return jnp.sum(_ref_ln(x, s, b, 1e-5) * w)

    def loss_ker(x, s, b):
        return jnp.sum(L.layernorm(x, s, b, eps=1e-5, impl="pallas") * w)

    ref = jax.grad(loss_ref, argnums=(0, 1, 2))(x, scale, bias)
    with pltpu.force_tpu_interpret_mode():
        got = jax.grad(loss_ker, argnums=(0, 1, 2))(x, scale, bias)
    for g, r, name in zip(got, ref, ("dx", "dscale", "dbias")):
        np.testing.assert_allclose(np.asarray(g), np.asarray(r),
                                   rtol=2e-5, atol=2e-5, err_msg=name)


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_mxu_stats_matches_xla(dtype):
    """EGOVLP_LN_STATS_MXU: stats via [rows,D]x[D,8] ones-dots must match
    the lane-reduce reference (forward AND gradients) — only the reduce's
    association order differs."""
    rs = np.random.RandomState(4)
    d = 256
    x = jnp.asarray(rs.randn(6, 37, d), dtype)
    scale = jnp.asarray(1.0 + 0.1 * rs.randn(d), jnp.float32)
    bias = jnp.asarray(0.1 * rs.randn(d), jnp.float32)
    w = jnp.asarray(rs.randn(6, 37, d), jnp.float32)

    tol = 2e-6 if dtype == jnp.float32 else 2e-2
    np.testing.assert_allclose(
        np.asarray(L._ln_mxu(x, scale, bias, 1e-5), np.float32),
        np.asarray(_ref_ln(x, scale, bias, 1e-5), np.float32),
        rtol=tol, atol=tol)

    def loss(fn, x, s, b):
        return jnp.sum(fn(x, s, b, 1e-5).astype(jnp.float32) * w)

    ref = jax.grad(lambda *a: loss(L._ln_xla, *a), argnums=(0, 1, 2))(
        x, scale, bias)
    got = jax.grad(lambda *a: loss(L._ln_mxu, *a), argnums=(0, 1, 2))(
        x, scale, bias)
    gtol = 2e-5 if dtype == jnp.float32 else 5e-2
    for g, r, name in zip(got, ref, ("dx", "dscale", "dbias")):
        np.testing.assert_allclose(np.asarray(g, np.float32),
                                   np.asarray(r, np.float32),
                                   rtol=gtol, atol=gtol, err_msg=name)


def test_module_is_dropin_for_nn_layernorm():
    """Same param names/shapes as nn.LayerNorm; identical output on the
    XLA path (what CPU/tests use) — checkpoints and the torch importer
    see no difference."""
    rs = np.random.RandomState(3)
    x = jnp.asarray(rs.randn(2, 10, 96), jnp.float32)
    ours = L.LayerNorm(epsilon=1e-5)
    theirs = nn.LayerNorm(epsilon=1e-5)
    p1 = ours.init(jax.random.PRNGKey(0), x)["params"]
    p2 = theirs.init(jax.random.PRNGKey(0), x)["params"]
    assert {k: v.shape for k, v in p1.items()} == \
           {k: v.shape for k, v in p2.items()}
    np.testing.assert_allclose(
        np.asarray(ours.apply({"params": p2}, x)),
        np.asarray(theirs.apply({"params": p2}, x)), rtol=2e-6, atol=2e-6)
