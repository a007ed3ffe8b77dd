"""Pallas conv3x3 kernel tests (interpret mode on CPU; the XLA fallback is
the production default until the kernel beats XLA's lowering)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

import mmr_tpu.ops.pallas.conv3x3 as k


@pytest.fixture(autouse=True)
def force_interpret(monkeypatch):
    monkeypatch.setattr(k, "_FORCE_PALLAS", True)
    monkeypatch.setattr(k, "_INTERPRET", True)


def _ref_conv(x, w, b, relu):
    return np.asarray(k._lax_conv(
        jnp.asarray(x).astype(jnp.bfloat16),
        jnp.asarray(w).astype(jnp.bfloat16), jnp.asarray(b), relu), np.float32)


@pytest.mark.parametrize("shape,cin,cout", [
    ((2, 16, 12, 8), 8, 8),
    ((1, 32, 30, 16), 16, 24),
    ((2, 64, 30, 8), 8, 16),
])
def test_kernel_matches_lax(rng, shape, cin, cout):
    x = rng.randn(*shape).astype(np.float32)
    w = (rng.randn(3, 3, cin, cout) * 0.1).astype(np.float32)
    b = rng.randn(cout).astype(np.float32)
    got = np.asarray(k._conv3x3_pallas(
        jnp.asarray(x), jnp.asarray(w), jnp.asarray(b), True), np.float32)
    ref = _ref_conv(x, w, b, True)
    np.testing.assert_allclose(got, ref, atol=0.05)


def test_dw_kernel_matches_lax(rng):
    x = rng.randn(2, 32, 30, 8).astype(np.float32)
    dy = rng.randn(2, 32, 30, 16).astype(np.float32)
    got = np.asarray(k._conv3x3_dw_pallas(jnp.asarray(x), jnp.asarray(dy)))
    ref = np.asarray(jax.lax.conv_general_dilated(
        jnp.asarray(x).astype(jnp.bfloat16).transpose(3, 1, 2, 0),
        jnp.asarray(dy).astype(jnp.bfloat16).transpose(1, 2, 0, 3),
        (1, 1), [(1, 1), (1, 1)], dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32).transpose(1, 2, 0, 3))
    # bf16 tap-stacking tolerance, relative to the gradient's scale
    assert np.abs(got - ref).max() <= 0.01 * np.abs(ref).max()


def test_custom_vjp_matches_autodiff(rng):
    """The custom VJP (through the lax fallback path) equals jax autodiff of
    the reference conv."""
    x = jnp.asarray(rng.randn(1, 16, 12, 8).astype(np.float32))
    w = jnp.asarray((rng.randn(3, 3, 8, 8) * 0.1).astype(np.float32))
    b = jnp.asarray(rng.randn(8).astype(np.float32))

    import mmr_tpu.ops.pallas.conv3x3 as kk
    # run fallback (not interpret kernel) for exact autodiff comparison
    kk._FORCE_PALLAS = False
    loss = lambda x, w, b: kk.conv3x3_bias_act(x, w, b, True).sum()
    ref_loss = lambda x, w, b: kk._lax_conv(x, w, b, True).sum()
    g1 = jax.grad(loss, argnums=(0, 1, 2))(x, w, b)
    g2 = jax.grad(ref_loss, argnums=(0, 1, 2))(x, w, b)
    for a, bb in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(bb), rtol=1e-4, atol=1e-4)
