"""Hardware calibration of the fused-LSTM scoped-VMEM envelope.

Round 2 ended with a real Mosaic scoped-VMEM OOM at the ds3 contract
geometry (nd=2, B=32, H=800: 19.08M measured vs the 16M limit at TT=4,
where the analytic model said 10.67M — VERDICT r2 missing #3). The
committed fix applies a 2x safety factor for H>512 (`lstm_pallas._pick_tt`)
but was never re-run on hardware. This script closes that loop:

- runs fused fwd+bwd at each geometry with the MODEL-CHOSEN TT and
  reports run/OOM + chained step time (diag_common protocol);
- `--force-tt N` overrides `_pick_tt` to probe where the true envelope
  actually sits (e.g. does H=640/B=32 really need the 2x demotion from
  TT=4 to TT=2, per ADVICE r2 #4?).

Each probe runs in-process; a Mosaic "Scoped allocation exceeds..."
compile error is caught and reported as OOM (the PJRT client survives
compile errors).

Usage:
    python scripts/diag_vmem_envelope.py                  # model TTs
    python scripts/diag_vmem_envelope.py --force-tt 4     # probe TT=4
    python scripts/diag_vmem_envelope.py --geoms 2,32,800
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from ctc_asr_tpu.ops import lstm_pallas
from diag_common import timed

DEFAULT_GEOMS = [
    (2, 32, 512),    # ds2 ladder shape — known good (TT=8)
    (2, 32, 640),    # ADVICE r2 #4: just above the H>512 gate
    (2, 64, 576),    # ADVICE r2 #4: second interpolation point
    (2, 32, 800),    # ds3 contract rung — the round-2 OOM geometry
    (2, 128, 512),   # bench default batch
]


def probe(nd, B, H, T, force_tt=None):
    G = 4 * H
    orig = lstm_pallas._pick_tt
    if force_tt is not None:
        lstm_pallas._pick_tt = lambda *a: force_tt
    tt = lstm_pallas._pick_tt(nd, B, H, G, T)
    rng = np.random.default_rng(0)
    xproj = jax.device_put(jnp.asarray(
        rng.standard_normal((nd, T, B, G)).astype(np.float32))
        .astype(jnp.bfloat16))
    b = jax.device_put(jnp.zeros((nd, G), jnp.float32))
    wh = jax.device_put(jnp.asarray(
        (rng.standard_normal((nd, H, G)) / np.sqrt(H)).astype(np.float32))
        .astype(jnp.bfloat16))
    start = jax.device_put(jnp.zeros((nd, B, 1), jnp.int32))
    end = jax.device_put(jnp.full((nd, B, 1), T, jnp.int32))

    def body(p, c):
        def loss_fn(wh_):
            h = lstm_pallas.lstm_seq_pallas(c["xproj"], p["b"], wh_,
                                            start, end)
            return jnp.sum(h.astype(jnp.float32)) * 1e-6
        loss, g = jax.value_and_grad(loss_fn)(p["wh"])
        return loss, {"dwh": g}

    name = f"nd={nd} B={B:3d} H={H} TT={tt}"
    try:
        dt = timed(name, {"wh": wh, "b": b}, body,
                   flops=2 * 2 * nd * T * B * H * G, const={"xproj": xproj})
        out = {"geom": (nd, B, H), "tt": tt, "ok": True,
               "ms": round(dt * 1e3, 3)}
    except Exception as e:  # Mosaic OOM is a compile-time RuntimeError
        msg = str(e).split("\n")[0][:140]
        print(f"{name:40s}      OOM/ERR: {msg}", flush=True)
        out = {"geom": (nd, B, H), "tt": tt, "ok": False, "err": msg}
    finally:
        lstm_pallas._pick_tt = orig
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--geoms", default=None,
                    help="semicolon list of nd,B,H triples")
    ap.add_argument("--t", type=int, default=400)
    ap.add_argument("--force-tt", type=int, default=None)
    args = ap.parse_args()
    geoms = DEFAULT_GEOMS
    if args.geoms:
        geoms = [tuple(int(x) for x in g.split(","))
                 for g in args.geoms.split(";")]
    import json
    results = [probe(nd, B, H, args.t, args.force_tt) for nd, B, H in geoms]
    print(json.dumps(results))


if __name__ == "__main__":
    main()
