"""Pallas banded-conv frontend kernel vs XLA references (interpret)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ctc_asr_tpu.models.layers import (conv2d_apply, conv2d_init,
                                       conv2d_matmul_apply)
from ctc_asr_tpu.ops.conv_pallas import (band_matrices, banded_conv_valid,
                                         conv2d_pallas_apply)
from ctc_asr_tpu.models import layers as layers_mod


def _params(key, kt, kf, cin, cout):
    return conv2d_init(jax.random.PRNGKey(key), kt, kf, cin, cout)


def test_band_matrices_match_padstack():
    """The one-einsum band assembly equals the per-column pad/stack."""
    for (F, kf, sf, cin, cout) in [(80, 41, 2, 1, 32), (40, 21, 2, 32, 32),
                                   (16, 5, 1, 4, 8)]:
        w = jax.random.normal(jax.random.PRNGKey(F), (3, kf, cin, cout))
        ref = layers_mod._band_matrices(w, F, sf)
        got = band_matrices(w, F, sf)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=1e-5, atol=1e-5)


def test_banded_conv_valid_matches_tap_matmuls():
    B, Tin, K, kt, N = 2, 200, 128, 5, 128
    x = jax.random.normal(jax.random.PRNGKey(0), (B, Tin, K), jnp.float32)
    w = jax.random.normal(jax.random.PRNGKey(1), (kt, K, N),
                          jnp.float32) * 0.1
    want = None
    for k in range(kt):
        yk = x[:, k:k + Tin - kt + 1] @ w[k]
        want = yk if want is None else want + yk
    got = banded_conv_valid(x, w, True, True)  # pallas, interpret
    assert got.shape == (B, Tin - kt + 1, N)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("use_pallas", [False, True])
def test_banded_conv_grads_match_autodiff(use_pallas):
    """Custom VJP == jax.grad through the explicit tap-matmul form."""
    B, Tin, K, kt, N = 2, 140, 128, 3, 128
    x = jax.random.normal(jax.random.PRNGKey(2), (B, Tin, K), jnp.float32)
    w = jax.random.normal(jax.random.PRNGKey(3), (kt, K, N),
                          jnp.float32) * 0.1

    def ref_loss(x, w):
        out_len = Tin - kt + 1
        y = sum(x[:, k:k + out_len] @ w[k] for k in range(kt))
        return jnp.sum(jnp.sin(y * 0.1))

    def got_loss(x, w):
        y = banded_conv_valid(x, w, use_pallas, True)
        return jnp.sum(jnp.sin(y * 0.1))

    gx_ref, gw_ref = jax.grad(ref_loss, argnums=(0, 1))(x, w)
    gx, gw = jax.grad(got_loss, argnums=(0, 1))(x, w)
    np.testing.assert_allclose(np.asarray(gx), np.asarray(gx_ref),
                               rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(np.asarray(gw), np.asarray(gw_ref),
                               rtol=2e-3, atol=2e-3)


@pytest.mark.parametrize("shape", [
    # (T, F, cin, cout, kt, kf, st, sf) — DS2 conv1/conv2 and odd sizes
    (90, 80, 1, 32, 11, 41, 2, 2),
    (45, 40, 32, 32, 11, 21, 1, 2),
    (37, 20, 3, 8, 5, 5, 2, 1),
    (20, 13, 2, 4, 3, 3, 1, 1),
])
def test_conv2d_pallas_matches_xla(shape):
    T, F, cin, cout, kt, kf, st, sf = shape
    B = 2
    p = _params(T, kt, kf, cin, cout)
    x = jax.random.normal(jax.random.PRNGKey(9), (B, T, F, cin),
                          jnp.float32)
    want = conv2d_apply(p, x, (st, sf), compute_dtype=jnp.float32)
    got = conv2d_pallas_apply(p, x, (st, sf), compute_dtype=jnp.float32,
                              interpret=True)
    assert got.shape == want.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-3, atol=1e-3)


def test_conv2d_pallas_grads_match_banded_xla():
    """End-to-end frontend grads: pallas path == conv2d_matmul_apply."""
    B, T, F = 2, 50, 40
    p1 = _params(1, 11, 21, 1, 8)
    p2 = _params(2, 5, 11, 8, 8)
    x = jax.random.normal(jax.random.PRNGKey(4), (B, T, F, 1), jnp.float32)

    def loss(fn, params):
        y1 = jnp.clip(fn(params["c1"], x, (2, 2),
                         compute_dtype=jnp.float32), 0, 20)
        y2 = fn(params["c2"], y1, (1, 2), compute_dtype=jnp.float32)
        return jnp.mean(y2 * y2)

    params = {"c1": p1, "c2": p2}
    import functools
    pallas_fn = functools.partial(conv2d_pallas_apply, interpret=True)
    g_ref = jax.grad(lambda pp: loss(conv2d_matmul_apply, pp))(params)
    g_got = jax.grad(lambda pp: loss(pallas_fn, pp))(params)
    for key in ("c1", "c2"):
        for leaf in ("w", "b"):
            np.testing.assert_allclose(
                np.asarray(g_got[key][leaf]), np.asarray(g_ref[key][leaf]),
                rtol=2e-3, atol=2e-3,
                err_msg=f"grad mismatch at {key}/{leaf}")


def test_xla_fallback_path():
    """use_pallas=False routes through the tap-matmul twin."""
    p = _params(7, 5, 5, 2, 4)
    x = jax.random.normal(jax.random.PRNGKey(5), (1, 30, 16, 2),
                          jnp.float32)
    want = conv2d_apply(p, x, (2, 2), compute_dtype=jnp.float32)
    got = conv2d_pallas_apply(p, x, (2, 2), compute_dtype=jnp.float32,
                              use_pallas=False)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-3, atol=1e-3)
