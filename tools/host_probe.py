"""Host-speed probe: a fixed single-core Python workload plus a fixed
32-thread numpy workload, each timed. The sandbox shares its host —
same-code bench swings >2x have been observed — so the bench records
are only comparable when this probe reads in its quiet band. Quiet
reference (measured on an idle window): single ~= 1.0s, parallel ~=
0.35s; values >1.5x those mean an external load window — do not
record benches."""

from __future__ import annotations

import time


def probe() -> tuple[float, float]:
    t0 = time.perf_counter()
    acc = 0
    for i in range(20_000_000):
        acc += i ^ (i >> 3)
    single = time.perf_counter() - t0

    import numpy as np
    from concurrent.futures import ThreadPoolExecutor

    a = np.random.default_rng(0).random((1200, 1200))

    def work(_):
        return float(np.sum(a @ a))

    t0 = time.perf_counter()
    with ThreadPoolExecutor(32) as ex:
        list(ex.map(work, range(32)))
    parallel = time.perf_counter() - t0
    return single, parallel


if __name__ == "__main__":
    s, p = probe()
    print(f"single={s:.3f}s parallel={p:.3f}s")
