#!/usr/bin/env python
"""Seed the persistent compile cache with the flagship-geometry sharded
train step on the N-virtual-device CPU mesh, so dryrun_multichip's
flagship-compile phase (and DPMN_RUN_COMPILE_ONLY=1 re-runs) load it in
minutes instead of re-doing ~10-40 min of local XLA:CPU compilation.

Usage: python tools/warm_flagship_mesh.py [n_devices]
"""

import sys
import time

sys.path.insert(0, ".")

from __graft_entry__ import _force_virtual_mesh, flagship_mesh_compile  # noqa: E402

if __name__ == "__main__":
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    _force_virtual_mesh(n)
    t0 = time.monotonic()

    def tick(msg):
        print(f"[warm +{time.monotonic() - t0:7.1f}s] {msg}", flush=True)

    flagship_mesh_compile(n, tick)
