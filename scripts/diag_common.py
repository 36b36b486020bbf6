"""Shared measurement protocol for the diag_* scripts.

Encodes the hard-won axon-tunnel rules in ONE place (see BASELINE.md
"Timing methodology notes"):

1. Chain N_CHAIN iterations inside one jitted ``lax.scan`` and fetch a
   single scalar — ``block_until_ready`` returns at enqueue through the
   tunnel, so only a host scalar fetch is a true barrier.
2. Subtract the measured scalar-fetch RTT (~25 ms) once, not per iter.
3. Feed the FULL gradient tree back into the carry — consuming one
   leaf lets XLA dead-code-eliminate most of the backward pass.
"""

import time

import jax
import jax.numpy as jnp

N_CHAIN = 50
RTT = None


def measure_rtt() -> float:
    x = jax.device_put(jnp.float32(1.0))
    for _ in range(2):
        float(x + 1)
    t0 = time.perf_counter()
    for _ in range(5):
        float(x + 1)
    return (time.perf_counter() - t0) / 5


def timed(name, params, body, flops=None, peak=197e12,
          n_chain=N_CHAIN, const=None):
    """body(params[, const]) -> (scalar, grads-pytree-or-None);
    prints ms/iter.

    Chains the full gradient tree through the carry (anti-DCE) and
    subtracts the tunnel RTT. ``flops`` adds a TF/s + %-of-peak column
    (peak defaults to v5e bf16 MXU). ``const`` is a pytree of LARGE
    NON-CHAINED inputs (e.g. activations): it rides as a jit argument —
    never a closed-over constant (which bakes into the HLO and can
    overflow the axon remote-compile body limit) and never part of the
    chained carry (whose per-iteration eps-add and grad reduction would
    add untracked HBM traffic proportional to its size, distorting the
    roofline columns)."""
    global RTT

    @jax.jit
    def run(p, c):
        def step(carry, _):
            loss, g = body(carry) if const is None else body(carry, c)
            eps = loss * 1e-30
            if g is not None:
                eps = eps + sum(jnp.sum(leaf.astype(jnp.float32))
                                for leaf in jax.tree_util.tree_leaves(g)) \
                    * 1e-30
            return jax.tree.map(lambda a: a + eps.astype(a.dtype),
                                carry), None
        p2, _ = jax.lax.scan(step, params, None, length=n_chain)
        return jax.tree_util.tree_leaves(p2)[0].ravel()[0]

    float(run(params, const))
    if RTT is None:
        RTT = measure_rtt()
    t0 = time.perf_counter()
    float(run(params, const))
    dt = (time.perf_counter() - t0 - RTT) / n_chain
    extra = ""
    if flops:
        extra = f"  ({flops/dt/1e12:6.1f} TF/s, " \
                f"{100*flops/dt/peak:5.1f}% MXU peak)"
    print(f"{name:40s} {dt*1000:9.3f} ms{extra}", flush=True)
    return dt
