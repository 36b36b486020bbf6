"""Fused Pallas LSTM sequence kernel vs the lax.scan reference —
values AND gradients (custom BPTT), interpret mode on CPU."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ctc_asr_tpu.models.rnn import (birnn_apply, lstm_apply, lstm_init)


def _params_bi(F, H, seed=0):
    return {"fwd": lstm_init(jax.random.PRNGKey(seed), F, H),
            "bwd": lstm_init(jax.random.PRNGKey(seed + 1), F, H)}


@pytest.mark.parametrize("T,B,F,H,lens", [
    (6, 2, 4, 8, [6, 3]),
    (9, 3, 5, 8, [9, 5, 1]),
])
def test_uni_forward_parity(T, B, F, H, lens):
    params = lstm_init(jax.random.PRNGKey(0), F, H)
    x = jax.random.normal(jax.random.PRNGKey(1), (T, B, F))
    lengths = jnp.asarray(lens)
    want = np.asarray(lstm_apply(params, x, lengths, jnp.float32))
    got = np.asarray(lstm_apply(params, x, lengths, jnp.float32,
                                use_pallas=True, interpret=True))
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-3)


def test_bi_forward_parity():
    T, B, F, H = 8, 2, 4, 8
    params = _params_bi(F, H)
    x = jax.random.normal(jax.random.PRNGKey(2), (T, B, F))
    lengths = jnp.asarray([8, 5])
    want = np.asarray(birnn_apply(params, x, lengths, "lstm",
                                  jnp.float32))
    got = np.asarray(birnn_apply(params, x, lengths, "lstm", jnp.float32,
                                 use_pallas=True, interpret=True))
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-3)


def test_uni_gradient_parity():
    T, B, F, H = 7, 2, 4, 8
    params = lstm_init(jax.random.PRNGKey(0), F, H)
    x = jax.random.normal(jax.random.PRNGKey(1), (T, B, F))
    lengths = jnp.asarray([7, 4])
    w = jax.random.normal(jax.random.PRNGKey(9), (T, B, H))

    def loss(fn_kwargs):
        def f(p, xx):
            out = lstm_apply(p, xx, lengths, jnp.float32, **fn_kwargs)
            return jnp.sum(out * w)
        return f

    g_ref = jax.grad(loss({}), argnums=(0, 1))(params, x)
    g_pal = jax.grad(loss(dict(use_pallas=True, interpret=True)),
                     argnums=(0, 1))(params, x)
    for a, b in zip(jax.tree_util.tree_leaves(g_ref),
                    jax.tree_util.tree_leaves(g_pal)):
        # bf16 residuals + bf16 dxproj: ~0.4% per-element rounding
        # compounds through the BPTT chain (kernel numerics by design)
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=4e-2, atol=1e-2)


def test_bi_gradient_parity():
    T, B, F, H = 6, 2, 4, 8
    params = _params_bi(F, H)
    x = jax.random.normal(jax.random.PRNGKey(3), (T, B, F))
    lengths = jnp.asarray([6, 4])
    w = jax.random.normal(jax.random.PRNGKey(9), (T, B, 2 * H))

    def loss(kw):
        def f(p, xx):
            out = birnn_apply(p, xx, lengths, "lstm", jnp.float32, **kw)
            return jnp.sum(out * w)
        return f

    g_ref = jax.grad(loss({}), argnums=(0, 1))(params, x)
    g_pal = jax.grad(loss(dict(use_pallas=True, interpret=True)),
                     argnums=(0, 1))(params, x)
    for (pa, a), (pb, b) in zip(
            jax.tree_util.tree_flatten_with_path(g_ref)[0],
            jax.tree_util.tree_flatten_with_path(g_pal)[0]):
        # bf16 residuals + bf16 dxproj (see test_uni_gradient_parity)
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=4e-2, atol=1e-2,
                                   err_msg=str(pa))


def test_grad_zero_beyond_length():
    T, B, F, H = 8, 2, 4, 8
    params = lstm_init(jax.random.PRNGKey(0), F, H)
    x = jax.random.normal(jax.random.PRNGKey(1), (T, B, F))
    lengths = jnp.asarray([5, 8])

    g = jax.grad(lambda xx: jnp.sum(lstm_apply(
        params, xx, lengths, jnp.float32, use_pallas=True,
        interpret=True)))(x)
    g = np.asarray(g)
    assert np.allclose(g[5:, 0], 0.0)
    assert not np.allclose(g[:5, 0], 0.0)


def test_gru_forward_and_grad_parity():
    from ctc_asr_tpu.models.rnn import gru_apply, gru_init
    T, B, F, H = 7, 2, 4, 8
    params = gru_init(jax.random.PRNGKey(0), F, H)
    x = jax.random.normal(jax.random.PRNGKey(1), (T, B, F))
    lengths = jnp.asarray([7, 4])
    want = np.asarray(gru_apply(params, x, lengths, jnp.float32))
    got = np.asarray(gru_apply(params, x, lengths, jnp.float32,
                               use_pallas=True, interpret=True))
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-3)

    w = jax.random.normal(jax.random.PRNGKey(9), (T, B, H))

    def loss(kw):
        def f(p, xx):
            return jnp.sum(gru_apply(p, xx, lengths, jnp.float32, **kw)
                           * w)
        return f

    g_ref = jax.grad(loss({}), argnums=(0, 1))(params, x)
    g_pal = jax.grad(loss(dict(use_pallas=True, interpret=True)),
                     argnums=(0, 1))(params, x)
    for a, b in zip(jax.tree_util.tree_leaves(g_ref),
                    jax.tree_util.tree_leaves(g_pal)):
        # bf16 residuals + bf16 dxproj: ~0.4% per-element rounding
        # compounds through the BPTT chain (kernel numerics by design)
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=4e-2, atol=1e-2)


def test_bigru_pallas_parity():
    from ctc_asr_tpu.models.rnn import birnn_apply, gru_init
    T, B, F, H = 6, 2, 4, 8
    params = {"fwd": gru_init(jax.random.PRNGKey(1), F, H),
              "bwd": gru_init(jax.random.PRNGKey(2), F, H)}
    x = jax.random.normal(jax.random.PRNGKey(3), (T, B, F))
    lengths = jnp.asarray([6, 4])
    want = np.asarray(birnn_apply(params, x, lengths, "gru", jnp.float32))
    got = np.asarray(birnn_apply(params, x, lengths, "gru", jnp.float32,
                                 use_pallas=True, interpret=True))
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-3)


def test_bi_gradient_parity_multi_block():
    """T > TIME_BLOCK exercises the cross-block BPTT path: the revm1
    c/h-prev streaming, backward time-padding (T=20 is not a block
    multiple), and db accumulation across grid steps — at T <= 8 the
    whole suite runs as a single block and would miss regressions
    there."""
    from ctc_asr_tpu.ops import lstm_pallas as lp
    assert lp.TIME_BLOCK == 8, "update T below to stay > TIME_BLOCK"
    T, B, F, H = 20, 2, 4, 8
    params = _params_bi(F, H)
    x = jax.random.normal(jax.random.PRNGKey(11), (T, B, F))
    lengths = jnp.asarray([20, 13])
    w = jax.random.normal(jax.random.PRNGKey(12), (T, B, 2 * H))

    def loss(kw):
        def f(p, xx):
            out = birnn_apply(p, xx, lengths, "lstm", jnp.float32, **kw)
            return jnp.sum(out * w)
        return f

    g_ref = jax.grad(loss({}), argnums=(0, 1))(params, x)
    g_pal = jax.grad(loss(dict(use_pallas=True, interpret=True)),
                     argnums=(0, 1))(params, x)
    # atol widens vs the single-block test: bf16 rounding accumulates
    # over the longer chain in the summed weight grads (dx errors are
    # uniform over t with NO spikes at block boundaries — verified)
    for (pa, a), (pb, b) in zip(
            jax.tree_util.tree_flatten_with_path(g_ref)[0],
            jax.tree_util.tree_flatten_with_path(g_pal)[0]):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=5e-2, atol=2.5e-2, err_msg=str(pa))


def test_gru_gradient_parity_multi_block():
    from ctc_asr_tpu.models.rnn import gru_apply, gru_init
    T, B, F, H = 19, 2, 4, 8
    params = gru_init(jax.random.PRNGKey(0), F, H)
    x = jax.random.normal(jax.random.PRNGKey(13), (T, B, F))
    lengths = jnp.asarray([19, 11])
    w = jax.random.normal(jax.random.PRNGKey(14), (T, B, H))

    def loss(kw):
        def f(p, xx):
            return jnp.sum(gru_apply(p, xx, lengths, jnp.float32, **kw)
                           * w)
        return f

    g_ref = jax.grad(loss({}), argnums=(0, 1))(params, x)
    g_pal = jax.grad(loss(dict(use_pallas=True, interpret=True)),
                     argnums=(0, 1))(params, x)
    for a, b in zip(jax.tree_util.tree_leaves(g_ref),
                    jax.tree_util.tree_leaves(g_pal)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=4e-2, atol=1e-2)


# ---------------------------------------------------------------------------
# Fused-kernel TT decision + VMEM envelope regression (VERDICT r2 #2).
#
# _pick_tt is calibrated against REAL v5e hardware: VMEM safety comes
# from the 100M vmem_limit_bytes request (the ds3 geometry nd=2/B=32/
# H=800 hard-OOM'd Mosaic's default 16M scoped limit in-step — 17.38M
# at TT=2, 19.08M at TT=4 — and ALL five production geometries then
# ran clean at TT=8 under the raised limit, diag_vmem_envelope r3);
# the TT choice itself is the measured speed optimum (see _pick_tt
# docstring for the sweep). This table pins both so a future model
# tweak that regresses either fails CI.
# ---------------------------------------------------------------------------

def test_vmem_envelope_decision_table():
    from ctc_asr_tpu.ops.lstm_pallas import _pick_tt, fused_fits
    T = 400
    expect = {
        (2, 32, 512): 8,   # ds2 ladder shape: 1.36 ms, TT=8 optimal
        (2, 32, 640): 4,   # 2.043 (TT=4) < 2.084 (2) < 2.125 (8)
        (2, 64, 576): 2,   # TT=1 3.073 ~ best; 2 within noise, 8 -3%
        (2, 32, 800): 2,   # ds3 rung: 3.171 (2) ~ 3.159 (4) < 3.488 (8)
        (2, 128, 512): 1,  # bench batch: 4.829 (1) < 5.286 (8)
        (2, 8, 800): 8,    # small-batch: overhead-bound, deep blocks
    }
    for (nd, B, H), tt in expect.items():
        got = _pick_tt(nd, B, H, 4 * H, T)
        assert got == tt, f"nd={nd} B={B} H={H}: TT {got} != pinned {tt}"
        assert fused_fits(nd, B, H, 4 * H), (nd, B, H)
    # under the raised limit B=256/H=512 fits scoped VMEM again (it is
    # HBM-, not VMEM-, bound at T=400); keep the guard callable.
    assert fused_fits(2, 256, 512, 2048)


def test_pick_tt_never_exceeds_t():
    from ctc_asr_tpu.ops.lstm_pallas import _pick_tt
    assert _pick_tt(2, 8, 64, 256, 3) <= 3
    assert _pick_tt(1, 2, 8, 32, 1) == 1
