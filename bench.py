"""Headline benchmark: PianoPIR offline hint generation on the SIFT1M-shaped DB.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Workload matches the reference's canonical private-search configuration
(BASELINE.md): n=1e6 entries of 640 B (128 f32 ‖ 32 u32), batch size 32
(16 partitions), FailureProbLog2=8 — the exact DB the Go implementation
preprocesses in 2.64 s on an 8-thread AVX2/AES-NI CPU
(private-search-report.txt:14). vs_baseline = reference_time / our_time
(>1 = faster than the reference).

Environment knobs:
  PACMANN_BENCH_N        entries (default 1_000_000)
  PACMANN_BENCH_SMALL=1  quick CI-sized run (n=65_536)
"""

import json
import os
import sys
import time

import numpy as np

REFERENCE_HINTGEN_S = 2.64  # private-search-report.txt:14


def main() -> int:
    n = int(os.environ.get("PACMANN_BENCH_N", "1000000"))
    if os.environ.get("PACMANN_BENCH_SMALL"):
        n = 65_536
    dim, m = 128, 32
    entry_bytes = 4 * dim + 4 * m
    batch = m

    import jax

    on_tpu = jax.devices()[0].platform == "tpu"

    rng = np.random.default_rng(0)
    raw = rng.integers(0, 2**32, size=(n, entry_bytes // 4), dtype=np.uint32)

    from pacmann_tpu.pir.engine import FusedBatchPianoPIR

    pir = FusedBatchPianoPIR(n, entry_bytes, batch, raw, 8, device=on_tpu)

    # warm-up: compile every kernel shape once
    pir.preprocessing(rng=np.random.default_rng(1))
    # timed run
    t0 = time.perf_counter()
    pir.preprocessing(rng=np.random.default_rng(2))
    t = time.perf_counter() - t0

    db_gb = n * entry_bytes / 1e9
    scale = n / 1_000_000.0  # linear-ish scaling when running reduced sizes
    vs = REFERENCE_HINTGEN_S * scale / t

    print(json.dumps({
        "metric": "pir_hintgen_time_sift1m_db",
        "value": round(t, 4),
        "unit": "s",
        "vs_baseline": round(vs, 3),
        "extra": {
            "n": n,
            "entry_bytes": entry_bytes,
            "db_gb": round(db_gb, 3),
            "db_gbps": round(db_gb / t, 3),
            "platform": jax.devices()[0].platform,
            "reference_s": REFERENCE_HINTGEN_S,
        },
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
