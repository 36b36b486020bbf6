"""Sweep dryrun_multichip over n_devices x {dp, dp x tp} (VERDICT r1 #2).

Each n spawns a child with a matching virtual CPU device count (the
respawn logic lives in __graft_entry__.dryrun_multichip, which runs the
pure-DP mesh AND the hybrid dp x tp mesh at every even n). One command
validates the full sharded-step matrix without a cluster:

    python scripts/dryrun_sweep.py        # n = 2, 4, 8
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from __graft_entry__ import dryrun_multichip


def main():
    sizes = [int(x) for x in (sys.argv[1:] or ["2", "4", "8"])]
    for n in sizes:
        dryrun_multichip(n)
    print(f"[dryrun_sweep] OK for n in {sizes} (dp + dp x tp each)")


if __name__ == "__main__":
    main()
