"""Pinned single-thread CPU probe: one fixed numpy workload, prints seconds.
Used to label measurement windows (the sandbox is a shared microVM; loadavg
is blind to co-tenancy — BENCH/BASELINE.md r5). Quiet reference recorded in
OPTIMIZATION_r06.md. Run: `python tools/host_probe.py`."""
import os
os.environ.setdefault("OMP_NUM_THREADS", "1")
os.environ.setdefault("OPENBLAS_NUM_THREADS", "1")
import time

import numpy as np

a = np.random.default_rng(0).standard_normal((1200, 1200))
best = min(
    (lambda t0=time.time(): (a @ a, time.time() - t0)[1])() for _ in range(3)
)
print(f"{best:.3f}")
