"""Pallas fused attention vs the XLA einsum path (forward and gradients).

On CPU the kernel runs via the Pallas interpreter path only when forced; we
run it with interpret mode through pltpu.force_tpu_interpret_mode so the same
kernel code is exercised without TPU hardware.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
from jax.experimental.pallas import tpu as pltpu

from egovlpv2_tpu.ops.attention import attend, make_additive_mask


def _run(impl, q, k, v, bias=None):
    return attend(q, k, v, scale=q.shape[-1] ** -0.5, bias=bias, impl=impl)


@pytest.mark.parametrize("shape", [
    ((2, 3, 2, 37, 40), 37),  # many batch dims, odd lengths above fallback
    ((2, 2, 33, 64), 33),
    ((2, 2, 196, 64), 197),   # the hot shape: space attention w/ CLS key
])
def test_flash_matches_xla_forward(shape):
    qshape, sk = shape
    rs = np.random.RandomState(0)
    q = jnp.asarray(rs.randn(*qshape), jnp.float32)
    kv_shape = qshape[:-2] + (sk, qshape[-1])
    k = jnp.asarray(rs.randn(*kv_shape), jnp.float32)
    v = jnp.asarray(rs.randn(*kv_shape), jnp.float32)
    ref = _run("xla", q, k, v)
    with pltpu.force_tpu_interpret_mode():
        got = _run("pallas", q, k, v)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-5, atol=2e-5)


def test_flash_with_padding_bias():
    # Shapes must stay above the sq/sk<32 XLA fallback (ops/flash.py) so the
    # kernel's bias path is actually exercised.
    rs = np.random.RandomState(1)
    b, h, sq, sk, dh = 2, 2, 33, 40, 8
    q = jnp.asarray(rs.randn(b, h, sq, dh), jnp.float32)
    k = jnp.asarray(rs.randn(b, h, sk, dh), jnp.float32)
    v = jnp.asarray(rs.randn(b, h, sk, dh), jnp.float32)
    mask = jnp.asarray((rs.rand(b, sk) > 0.3).astype(np.int32))
    mask = mask.at[:, 0].set(1)
    bias = make_additive_mask(mask)  # [b, 1, 1, sk]
    bias = jnp.broadcast_to(bias, (b, h, 1, sk))
    ref = _run("xla", q, k, v, bias=bias)
    with pltpu.force_tpu_interpret_mode():
        got = _run("pallas", q, k, v, bias=bias)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-5, atol=2e-5)


def test_flash_gradients_match():
    # Above the fallback threshold so the custom-VJP backward is covered.
    rs = np.random.RandomState(2)
    g, sq, sk, dh = 3, 48, 33, 8
    q = jnp.asarray(rs.randn(g, sq, dh), jnp.float32)
    k = jnp.asarray(rs.randn(g, sk, dh), jnp.float32)
    v = jnp.asarray(rs.randn(g, sk, dh), jnp.float32)

    def loss(impl, q, k, v):
        out = _run(impl, q, k, v)
        return jnp.sum(out * out)

    ref_grads = jax.grad(lambda *a: loss("xla", *a), argnums=(0, 1, 2))(q, k, v)
    with pltpu.force_tpu_interpret_mode():
        got_grads = jax.grad(lambda *a: loss("pallas", *a), argnums=(0, 1, 2))(q, k, v)
    for gref, ggot in zip(ref_grads, got_grads):
        np.testing.assert_allclose(np.asarray(ggot), np.asarray(gref),
                                   rtol=5e-5, atol=5e-5)


def test_flash_gradients_match_with_bias():
    rs = np.random.RandomState(3)
    b, h, sq, sk, dh = 2, 2, 40, 33, 8
    q = jnp.asarray(rs.randn(b, h, sq, dh), jnp.float32)
    k = jnp.asarray(rs.randn(b, h, sk, dh), jnp.float32)
    v = jnp.asarray(rs.randn(b, h, sk, dh), jnp.float32)
    mask = jnp.asarray((rs.rand(b, sk) > 0.3).astype(np.int32)).at[:, 0].set(1)
    bias = jnp.broadcast_to(make_additive_mask(mask), (b, h, 1, sk))

    def loss(impl, q, k, v):
        out = _run(impl, q, k, v, bias=bias)
        return jnp.sum(out * out)

    ref_grads = jax.grad(lambda *a: loss("xla", *a), argnums=(0, 1, 2))(q, k, v)
    with pltpu.force_tpu_interpret_mode():
        got_grads = jax.grad(lambda *a: loss("pallas", *a), argnums=(0, 1, 2))(q, k, v)
    for gref, ggot in zip(ref_grads, got_grads):
        np.testing.assert_allclose(np.asarray(ggot), np.asarray(gref),
                                   rtol=5e-5, atol=5e-5)


def test_flash_real_kernel_is_used_above_fallback(monkeypatch):
    """Guard: shapes >=32 must go through the Pallas kernel, never the XLA
    fallback (which two round-1 tests silently exercised)."""
    import egovlpv2_tpu.ops.flash as flash_mod

    def _boom(*a, **kw):
        raise AssertionError("XLA fallback taken for a >=32 shape")

    monkeypatch.setattr("egovlpv2_tpu.ops.attention.attend", _boom)
    rs = np.random.RandomState(4)
    q = jnp.asarray(rs.randn(2, 33, 8), jnp.float32)
    k = jnp.asarray(rs.randn(2, 40, 8), jnp.float32)
    v = jnp.asarray(rs.randn(2, 40, 8), jnp.float32)
    with pltpu.force_tpu_interpret_mode():
        out = flash_mod.flash_attention(q, k, v, scale=8**-0.5)
    assert out.shape == (2, 33, 8)
