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


# ---------------------------------------------------------------- packed v2

class TestPackedKernel:
    """Round-2 packed-lane block-Toeplitz kernel (conv3x3_packed.py),
    interpreter mode on CPU; real-TPU timings live in
    benchmarks/bench_conv_kernel.py."""

    def _with_kernel(self, fn):
        from mmr_tpu.ops.pallas import conv3x3_packed as k

        k._INTERPRET, k._FORCE = True, True
        try:
            return fn(k)
        finally:
            k._INTERPRET, k._FORCE = False, None

    @pytest.mark.parametrize("shape,cout", [
        ((2, 16, 16, 5), 7),     # odd channels -> padding path
        ((1, 8, 32, 16), 16),    # p=8 exact fill
        ((2, 8, 16, 32), 16),    # cin!=cout
        ((1, 16, 8, 128), 128),  # p=1 path
    ])
    def test_fwd_matches_lax(self, rng, shape, cout):
        def run(k):
            x = jnp.asarray(rng.randn(*shape).astype(np.float32), jnp.bfloat16)
            w = jnp.asarray(rng.randn(3, 3, shape[-1], cout).astype(np.float32) * 0.1)
            b = jnp.asarray(rng.randn(cout).astype(np.float32))
            got = k._conv_packed(x, w, b, relu=False)
            want = k._lax_conv(x, w, b, relu=False)
            np.testing.assert_allclose(np.asarray(got, np.float32),
                                       np.asarray(want, np.float32),
                                       atol=0.15, rtol=0.05)
        self._with_kernel(run)

    def test_relu_epilogue(self, rng):
        def run(k):
            x = jnp.asarray(rng.randn(1, 8, 16, 8).astype(np.float32), jnp.bfloat16)
            w = jnp.asarray(rng.randn(3, 3, 8, 8).astype(np.float32) * 0.1)
            b = jnp.zeros(8, jnp.float32)
            got = k._conv_packed(x, w, b, relu=True)
            assert float(jnp.min(got.astype(jnp.float32))) >= 0.0
            want = k._lax_conv(x, w, b, relu=True)
            np.testing.assert_allclose(np.asarray(got, np.float32),
                                       np.asarray(want, np.float32),
                                       atol=0.15, rtol=0.05)
        self._with_kernel(run)

    def test_vjp_matches_lax(self, rng):
        def run(k):
            x = jnp.asarray(rng.randn(2, 8, 16, 8).astype(np.float32), jnp.bfloat16)
            w = jnp.asarray(rng.randn(3, 3, 8, 12).astype(np.float32) * 0.1)
            b = jnp.asarray(rng.randn(12).astype(np.float32))

            def loss_kernel(x, w, b):
                y = k.conv3x3p_bias_act(x, w, b, True)
                return jnp.sum(y.astype(jnp.float32) ** 2)

            def loss_lax(x, w, b):
                # f32-pure reference (autodiff of the bf16 fallback trips
                # jax's mixed-dtype conv transpose; production never
                # autodiffs it — the op has a custom VJP)
                y = jax.lax.conv_general_dilated(
                    x.astype(jnp.float32), w, (1, 1), [(1, 1), (1, 1)],
                    dimension_numbers=("NHWC", "HWIO", "NHWC")) + b
                return jnp.sum(jnp.maximum(y, 0.0) ** 2)

            gk = jax.grad(loss_kernel, argnums=(0, 1, 2))(x, w, b)
            gl = jax.grad(loss_lax, argnums=(0, 1, 2))(x, w, b)
            for a, e, name, tol in zip(gk, gl, "x w b".split(), (0.5, 2.0, 0.5)):
                np.testing.assert_allclose(
                    np.asarray(a, np.float32), np.asarray(e, np.float32),
                    atol=tol, rtol=0.06, err_msg=f"d{name}")
        self._with_kernel(run)

    def test_toeplitz_fold_roundtrip(self, rng):
        """_fold_toeplitz_grad is the exact adjoint of _toeplitz."""
        from mmr_tpu.ops.pallas import conv3x3_packed as k

        w = jnp.asarray(rng.randn(3, 3, 5, 7).astype(np.float32))
        t = k._toeplitz(w, p=8, cp=16, cop=16)
        folded = k._fold_toeplitz_grad(t.astype(jnp.float32), w.shape, 8, 16, 16)
        # each true weight occupies exactly one slot per (dx, q) pair, so
        # folding the forward matrix returns p * w (up to _toeplitz's bf16 cast)
        np.testing.assert_allclose(np.asarray(folded), 8 * np.asarray(w, np.float32),
                                   rtol=1e-2, atol=1e-3)

    def test_plan_selection(self):
        from mmr_tpu.ops.pallas.conv3x3_packed import plan

        p = plan(512, 512, 16, 16)
        assert p and p["p"] * p["cp"] % 128 == 0 and p["l"] == 128
        p = plan(256, 256, 176, 32)
        assert p and (p["p"] * p["cp"]) % 128 == 0 and (p["p"] * p["cop"]) % 128 == 0
        assert plan(512, 509, 3, 16) is None or plan(512, 509, 3, 16)["p"] == 1
