"""Per-piece BiLSTM layer timing at the bench batch (RTT-corrected,
full-gradient chained — see diag_bwd_breakdown.py for the protocol).

Isolates, at B=32/T=400/H=512 (the conv_bilstm3 bench shape after
stride-2 downsampling):
  - xproj dot_general alone (fwd / fwd+bwd)
  - fused kernel fwd alone
  - full layer fwd / fwd+bwd (kernel + xproj + dwh)
with roofline FLOP accounting printed alongside.
"""

import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from ctc_asr_tpu.models import rnn as rnn_mod

from diag_common import timed  # noqa: E402  (shared protocol)


def main():
    B, T, H, Fin = 32, 400, 512, 1024   # layer-2 shape: input 2H
    if len(sys.argv) > 1:
        B = int(sys.argv[1])
    G = 4 * H
    rng = np.random.default_rng(0)
    x = jax.device_put(jnp.asarray(
        rng.standard_normal((T, B, Fin)).astype(np.float32)))
    lengths = jax.device_put(jnp.full((B,), T, jnp.int32))
    params = {"fwd": rnn_mod.lstm_init(jax.random.PRNGKey(0), Fin, H),
              "bwd": rnn_mod.lstm_init(jax.random.PRNGKey(1), Fin, H)}
    stacked_np = jax.tree.map(np.asarray, rnn_mod.stack_bi_params(params))
    stacked = jax.tree.map(jax.device_put, stacked_np)

    # roofline FLOPs
    f_xproj = 2 * 2 * T * B * Fin * G           # both dirs
    f_rec = 2 * 2 * T * B * H * G               # h@wh both dirs
    f_dwh = 2 * 2 * T * B * H * G
    f_dx = f_xproj                               # dgates @ wx^T
    f_dwx = f_xproj

    xd = rnn_mod.stack_dirs(x).astype(jnp.bfloat16)
    xd = jax.device_put(jax.jit(lambda a: a)(xd))

    def xproj_fwd(p):
        out = jax.lax.dot_general(
            xd, p["wx"].astype(jnp.bfloat16),
            dimension_numbers=(((3,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
        return jnp.sum(out) * 1e-6, None

    timed("xproj dot_general fwd", {"wx": stacked["wx"]}, xproj_fwd,
          flops=f_xproj)

    xproj_b = jax.device_put(jax.jit(lambda a: jax.lax.dot_general(
        a, stacked["wx"].astype(jnp.bfloat16),
        dimension_numbers=(((3,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32).astype(jnp.bfloat16))(xd))

    # NB: xproj/xd ride through timed(const=...) so they are jit
    # ARGUMENTS (closed-over device arrays bake into the HLO as
    # constants and overflow the axon remote-compile body limit at
    # B=128) but stay OUT of the chained carry (whose per-iteration
    # eps-add + grad reduction would add HBM traffic proportional to
    # the activation size, distorting every roofline column).
    def kernel_fwd(p, c):
        start = jnp.zeros((2, B, 1), jnp.int32)
        end = jnp.full((2, B, 1), T, jnp.int32)
        from ctc_asr_tpu.ops.lstm_pallas import lstm_seq_pallas
        out = lstm_seq_pallas(c["xp"], p["b"], p["wh"].astype(jnp.bfloat16),
                              start, end, False)
        return jnp.sum(out.astype(jnp.float32)) * 1e-6, None

    timed("lstm kernel fwd only",
          {"b": stacked["b"], "wh": stacked["wh"]},
          kernel_fwd, flops=f_rec, const={"xp": xproj_b})

    def kernel_fwdbwd(p, c):
        start = jnp.zeros((2, B, 1), jnp.int32)
        end = jnp.full((2, B, 1), T, jnp.int32)
        from ctc_asr_tpu.ops.lstm_pallas import lstm_seq_pallas

        def loss(pp):
            out = lstm_seq_pallas(c["xp"], pp["b"],
                                  pp["wh"].astype(jnp.bfloat16),
                                  start, end, False)
            return jnp.sum(out.astype(jnp.float32) ** 2) * 1e-6
        l, g = jax.value_and_grad(loss)(p)
        return l, g

    timed("lstm kernel fwd+bwd (w/ dwh)",
          {"b": stacked["b"], "wh": stacked["wh"]},
          kernel_fwdbwd, flops=f_rec * 2 + f_dwh, const={"xp": xproj_b})

    def layer_fwd(p, c):
        out = rnn_mod.birnn_pair_apply(
            p, jax.lax.dot_general(
                c["xd"], p["wx"].astype(jnp.bfloat16),
                dimension_numbers=(((3,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32),
            lengths, "lstm")
        return jnp.sum(out.astype(jnp.float32)) * 1e-6, None

    timed("full layer fwd", stacked, layer_fwd,
          flops=f_xproj + f_rec, const={"xd": xd})

    def layer_fwdbwd(p, c):
        def loss(pp):
            out = rnn_mod.birnn_pair_apply(
                pp, jax.lax.dot_general(
                    c["xd"].astype(jnp.bfloat16),
                    pp["wx"].astype(jnp.bfloat16),
                    dimension_numbers=(((3,), (1,)), ((0,), (0,))),
                    preferred_element_type=jnp.float32),
                lengths, "lstm")
            return jnp.sum(out.astype(jnp.float32) ** 2) * 1e-6
        return jax.value_and_grad(loss)(p)

    timed("full layer fwd+bwd", stacked, layer_fwdbwd,
          flops=2 * f_xproj + 2 * f_rec + f_dwh + f_dwx,
          const={"xd": xd})


if __name__ == "__main__":
    main()
