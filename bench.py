"""Headline benchmark: PianoPIR offline hint generation on the SIFT1M-shaped DB.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Workload matches the reference's canonical private-search configuration
(BASELINE.md): n=1e6 entries of 640 B (128 f32 ‖ 32 u32), batch size 32
(16 partitions), FailureProbLog2=8 — the exact DB the Go implementation
preprocesses in 2.64 s on an 8-thread AVX2/AES-NI CPU
(private-search-report.txt:14). vs_baseline = reference_time / our_time
(>1 = faster than the reference).

Engine: DevicePianoEngine (pir/device_engine.py) — hint state device-resident,
one fused program for hint generation. Also reports the online batch latency
(96 oblivious fetches = one beam-search step at step/parallel=20/3).

Environment knobs:
  PACMANN_BENCH_N        entries (default 1_000_000)
  PACMANN_BENCH_SMALL=1  quick CI-sized run (n=65_536)
  PACMANN_BENCH_LINEAR=1 the paper's 100M-u32-dot linear-scan baseline
                         (graphann_test.go:249-283) as one MXU pass
  PACMANN_BENCH_BIG=1    reference TestBatchPIRPerf config instead
                         (n=3,201,821 x 896 B, batch 32 — the largest
                         config the reference perf-tests; prints prep time,
                         per-batch latency, and the reference's estimated
                         ANN latency formula (batch*parallel + rtt) * step
                         with rtt=50ms, parallel=2, step=15
                         [pianopir/pir_test.go:204-275])
"""

import functools
import json
import os
import sys
import time

import numpy as np

REFERENCE_HINTGEN_S = 2.64  # private-search-report.txt:14


def synth_raw(n: int, entry_u32: int, seed: int = 0,
              float_cols: int = 0, nbr_cols: int = 0) -> np.ndarray:
    """Fast synthetic DB: tile one random megablock, then make rows unique.
    (Content is irrelevant to timing; uniqueness keeps correctness checks
    meaningful.) The first `float_cols` words carry valid f32 bit patterns
    so vector decoding yields finite distances. When `nbr_cols` > 0, the
    words [float_cols, float_cols+nbr_cols) are rewritten with DISTINCT
    uniform ids in [0, n): the fused search decodes its graph from these
    columns, and tiled/garbage words there would make nearly every fetch
    a duplicate of id 0 / n-1 after one step — wildly overstating the
    dedup rate and understating hint-refresh maintenance."""
    rng = np.random.default_rng(seed)
    block = 1 << 14
    base = rng.integers(0, 2**32, size=(block, entry_u32), dtype=np.uint32)
    if float_cols:
        base[:, :float_cols] = np.ascontiguousarray(
            rng.random((block, float_cols), dtype=np.float32)).view("<u4")
    reps = (n + block - 1) // block
    raw = np.tile(base, (reps, 1))[:n]
    raw[:, 0] = np.arange(n, dtype=np.uint32)  # distinct entries
    if nbr_cols:
        raw[:, float_cols:float_cols + nbr_cols] = rng.integers(
            0, n, size=(n, nbr_cols), dtype=np.uint32)
    return raw


def synth_raw_device(n: int, entry_u32: int, seed: int = 0,
                     float_cols: int = 0, nbr_cols: int = 0):
    """Device twin of synth_raw: the DB is synthesized IN HBM, so nothing
    crosses the tunnel (a 640 MB host upload takes minutes-to-hours on a
    congested day; DevicePianoEngine._pack_db takes device-resident raw
    with zero upload). Same structure: valid f32 bit patterns in the first
    float_cols words, uniform neighbor ids, distinct first word. Content
    differs from synth_raw (different RNG) — timing-equivalent, and all
    correctness checks fetch the compared rows from this array."""
    import jax
    import jax.numpy as jnp

    @functools.partial(jax.jit, static_argnums=(1, 2, 3))
    def gen(key, n, entry_u32, float_cols, nbr_cols=nbr_cols):
        k1, k2, k3 = jax.random.split(key, 3)
        raw = jax.random.bits(k1, (n, entry_u32), dtype=jnp.uint32)
        if float_cols:
            f = jax.random.uniform(k2, (n, float_cols), jnp.float32)
            raw = raw.at[:, :float_cols].set(
                jax.lax.bitcast_convert_type(f, jnp.uint32))
        if nbr_cols:
            nb = jax.random.randint(k3, (n, nbr_cols), 0, n, jnp.int32)
            raw = raw.at[:, float_cols:float_cols + nbr_cols].set(
                nb.astype(jnp.uint32))
        return raw.at[:, 0].set(jnp.arange(n, dtype=jnp.uint32))

    return gen(jax.random.PRNGKey(seed), n, entry_u32, float_cols)


def synth_raw_auto(n: int, entry_u32: int, seed: int = 0,
                   float_cols: int = 0, nbr_cols: int = 0):
    """Device synthesis on TPU (zero-upload), host NumPy elsewhere.
    PACMANN_BENCH_HOST_SYNTH=1 forces the host path on TPU too."""
    from pacmann_tpu.utils.platform import on_tpu

    if on_tpu() and not os.environ.get("PACMANN_BENCH_HOST_SYNTH"):
        return synth_raw_device(n, entry_u32, seed, float_cols, nbr_cols)
    return synth_raw(n, entry_u32, seed, float_cols, nbr_cols)


def _rows(raw, idx):
    """Fetch compared rows host-side: free for host raw, a per-row D2H for
    device raw (640 B/row — never the full DB)."""
    if isinstance(raw, np.ndarray):
        return raw[idx]
    return np.asarray(raw[np.asarray(idx)])


def big_perf() -> int:
    """Reference TestBatchPIRPerf twin (pianopir/pir_test.go:204-275):
    n=3,201,821 entries of 896 B (112 u64), batch 32, failLog2=8. Times
    preprocessing and per-batch online queries, then applies the reference's
    estimated-ANN-latency formula (avgBatch * parallel + rtt) * step with
    rtt=50 ms, parallel=2, step=15."""
    import jax

    from pacmann_tpu.pir.device_engine import DevicePianoEngine

    n, entry_bytes, batch = 3_201_821, 896, 32
    raw = synth_raw_auto(n, entry_bytes // 4)
    pir = DevicePianoEngine(n, entry_bytes, batch, raw, 8)
    jax.block_until_ready(pir.db)

    pir.preprocessing(rng=np.random.default_rng(1))  # compile
    runs = []
    for i in range(3):
        t0 = time.perf_counter()
        pir.preprocessing(rng=np.random.default_rng(2 + i))
        runs.append(time.perf_counter() - t0)
    prep_s = min(runs)

    rng = np.random.default_rng(3)
    pir.query([int(i) for i in rng.integers(0, n, batch)])  # compile
    iters, ok, tot = 50, 0, 0
    checks = []
    t1 = time.perf_counter()
    for _ in range(iters):
        ids = [int(i) for i in rng.integers(0, n, batch)]
        out = pir.query(ids)
        checks.append((ids, out))
    batch_ms = (time.perf_counter() - t1) / iters * 1000
    for ids, out in checks:  # row fetches outside the timed loop
        exp = _rows(raw, ids)
        for r in range(len(ids)):
            tot += 1
            ok += int(np.array_equal(out[r], exp[r]))

    rtt_ms, parallel, step = 50.0, 2, 15
    ann_ms = (batch_ms * parallel + rtt_ms) * step

    db_gb = n * entry_bytes / 1e9
    print(json.dumps({
        "metric": "pir_big_prep_time_3p2m_db",
        "value": round(prep_s, 4),
        "unit": "s",
        "vs_baseline": 0,
        "extra": {
            "n": n,
            "entry_bytes": entry_bytes,
            "db_gb": round(db_gb, 3),
            "db_gbps": round(db_gb / prep_s, 3),
            "batch_ms": round(batch_ms, 2),
            "batch_success_rate": round(ok / max(tot, 1), 4),
            "estimated_ann_latency_ms": round(ann_ms, 1),
            "formula": "(batch_ms*2 + 50ms) * 15  [pir_test.go:270-274]",
            "platform": jax.devices()[0].platform,
            "note": "no published reference number for this config "
                    "(t.Logf only); recorded for regression tracking",
        },
    }))
    return 0


def linear_scan() -> int:
    """The paper's optimized linear-scan baseline: wall-clock of 100M
    128-dim u32 dot products (graphann_test.go:249-283, README:30-32),
    here as one int32 matmul pass on the MXU."""
    import jax
    import jax.numpy as jnp

    from pacmann_tpu.ops.distance import inner_product_xla

    rng = np.random.default_rng(0)
    n, d, q = 1_000_000, 128, 100          # 100M dots
    v = jnp.asarray(rng.integers(0, 2**16, size=(n, d), dtype=np.uint32))
    qs = jnp.asarray(rng.integers(0, 2**16, size=(q, d), dtype=np.uint32))
    np.asarray(inner_product_xla(qs, v)[-1, -1])  # compile
    t0 = time.perf_counter()
    out = inner_product_xla(qs, v)
    np.asarray(out[-1, -1])
    dt = time.perf_counter() - t0
    print(json.dumps({
        "metric": "linear_scan_100m_u32_dots",
        "value": round(dt, 4),
        "unit": "s",
        "vs_baseline": 0,
        "extra": {
            "dots": n * q,
            "gdots_per_s": round(n * q / dt / 1e9, 2),
            "platform": jax.devices()[0].platform,
            "note": "reference prints this from TestInnerProduct; no "
                    "number recorded in its repo",
        },
    }))
    return 0


_PROBE_SRC = (
    "import jax, jax.numpy as jnp; "
    "x = jnp.zeros((8, 128), jnp.float32); "
    "print(float((x + 1.0).sum()))"
)


def _wait_for_backend() -> bool:
    """Bounded wait for the accelerator backend before the timed run.

    The round-3 driver bench failed (rc=1) because the axon TPU backend was
    transiently DOWN ('Unable to initialize backend ... UNAVAILABLE'); the
    outage pattern recurs (CLAUDE.md).  Probe with a tiny device op in a
    SUBPROCESS — a hung or failed init there cannot poison this process's
    JAX state — and retry every ~2 min up to PACMANN_BENCH_WAIT_S (default
    20 min).  On deadline we proceed anyway: behavior degrades to exactly
    the old immediate-failure path, never worse."""
    import subprocess

    max_wait_s = float(os.environ.get("PACMANN_BENCH_WAIT_S", "1200"))
    if max_wait_s <= 0:
        return True                     # wait disabled: no probe at all
    deadline = time.monotonic() + max_wait_s
    attempt = 0
    while True:
        attempt += 1
        # clamp the probe to the remaining budget so the total wait never
        # overshoots PACMANN_BENCH_WAIT_S by a probe length
        probe_s = min(240.0, max(1.0, deadline - time.monotonic()))
        proc = subprocess.Popen(
            [sys.executable, "-c", _PROBE_SRC],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE)
        try:
            _, err = proc.communicate(timeout=probe_s)
            if proc.returncode == 0:
                if attempt > 1:
                    print(f"# backend up after {attempt} probes",
                          file=sys.stderr)
                return True
            msg = (err or b"").decode(errors="replace").strip()
            print(f"# backend probe {attempt} failed: {msg[-200:]}",
                  file=sys.stderr)
        except subprocess.TimeoutExpired:
            # SIGTERM first with a grace period: a SIGKILLed probe can die
            # mid remote-compile, which wedges the tunnel for minutes
            # (CLAUDE.md) — slowing the very recovery this loop waits for
            proc.terminate()
            try:
                proc.communicate(timeout=30)
            except subprocess.TimeoutExpired:
                proc.kill()
                proc.communicate()
            print(f"# backend probe {attempt} hung ({probe_s:.0f} s); "
                  "retrying", file=sys.stderr)
        if time.monotonic() >= deadline:
            print("# backend still unavailable at deadline; proceeding",
                  file=sys.stderr)
            return False
        time.sleep(min(120.0, max(5.0, deadline - time.monotonic())))


def main() -> int:
    _wait_for_backend()
    if os.environ.get("PACMANN_BENCH_LINEAR"):
        return linear_scan()
    if os.environ.get("PACMANN_BENCH_BIG"):
        return big_perf()
    n = int(os.environ.get("PACMANN_BENCH_N", "1000000"))
    if os.environ.get("PACMANN_BENCH_SMALL"):
        n = 65_536
    dim, m = 128, 32
    entry_bytes = 4 * dim + 4 * m
    batch = m

    import jax

    from pacmann_tpu.pir.device_engine import DevicePianoEngine

    raw = synth_raw_auto(n, entry_bytes // 4, float_cols=dim, nbr_cols=m)
    pir = DevicePianoEngine(n, entry_bytes, batch, raw, 8)
    jax.block_until_ready(pir.db)

    # warm-up: compile every kernel shape once
    pir.preprocessing(rng=np.random.default_rng(1))
    # timed hint generation: min of 3 (tunnel noise)
    runs = []
    for i in range(3):
        t0 = time.perf_counter()
        pir.preprocessing(rng=np.random.default_rng(2 + i))
        runs.append(time.perf_counter() - t0)
    t = min(runs)

    # online: batches of 96 (one beam step at parallel=3, m=32), spread ids
    rng = np.random.default_rng(3)
    ids = [int(i) for i in rng.integers(0, n, 96)]
    pir.query(ids)  # compile
    iters, ok, tot = 10, 0, 0
    checks = []
    t1 = time.perf_counter()
    for _ in range(iters):
        ids = [int(i) for i in rng.integers(0, n, 96)]
        out = pir.query(ids)
        checks.append((ids, out))
    online_ms = (time.perf_counter() - t1) / iters * 1000
    for ids, out in checks:  # row fetches outside the timed loop
        exp = _rows(raw, ids)
        for r in range(len(ids)):
            tot += 1
            ok += int(np.array_equal(out[r], exp[r]))

    # fused end-to-end private query: the full 20-step beam+PIR search as
    # one device program. Accounting mirrors the reference report's TWO
    # per-query lines (private-search-report.txt:16,19): compute per query
    # (refresh excluded — ensure_budget runs it beforehand, and any
    # mid-search refresh is subtracted via last_maintenance_s) and
    # amortized maintenance per query (all hint-regeneration time spread
    # over the queries served). Reference: 55.9 ms compute + 115 ms maint.
    from pacmann_tpu.private.fused_search import FusedPrivateSearch

    sids = rng.choice(n, min(1000, int(np.sqrt(n))), replace=False)
    srows = _rows(raw, sids)  # only the start rows cross the tunnel
    svecs = np.ascontiguousarray(srows[:, :dim]).view("<f4")
    snbrs = srows[:, dim : dim + m].astype(np.int64) % n
    fs = FusedPrivateSearch(pir, sids, svecs, snbrs, dim=dim, m=m, n=n)

    from pacmann_tpu.pir.params import expected_success_rate

    def fused_time(G: int, seed0: int, reps: int = 3):
        q = rng.random((G, dim), dtype=np.float32)
        fs.search(q, k=10, max_step=20, parallel=3, seed=seed0)  # compile
        comp = []
        fs.maintenance_s = 0.0
        fs.refreshes = 0
        fs.fetch_stats[:] = 0
        for rep in range(reps):
            fs.ensure_budget(20, G, 3)
            t2 = time.perf_counter()
            fs.search(q, k=10, max_step=20, parallel=3, seed=seed0 + 1 + rep)
            comp.append(time.perf_counter() - t2 - fs.last_maintenance_s)
        maint_ms = fs.maintenance_s * 1000 / (reps * G)
        # diagnostics: refresh count + per-refresh cost separate the two
        # possible maintenance inflations (under-drained windows vs
        # slower-in-context refreshes)
        fused_time.last_diag = {
            "refreshes": fs.refreshes,
            "per_refresh_s": round(fs.maintenance_s
                                   / max(fs.refreshes, 1), 4),
        }
        # analytic contract: expected served/wanted from the FCFS quota
        # binomial + 2^-fail hint miss at the measured avg wanted/step —
        # measured success should sit within a few % of this bound
        P = pir.config.partition_num
        quota = G * 3 * m // P
        want_step = int(round(fs.fetch_stats[0] / (reps * 20)))
        bound = expected_success_rate(want_step, P, quota, 8)
        return min(comp) * 1000 / G, maint_ms, fs.fetch_success_rate(), bound

    fused_query_ms, _, _, _ = fused_time(1, 9)

    # device-only twin of the group-1 latency: R raw segment dispatches
    # back-to-back with ONE dependent D2H sync at the end, so the
    # per-dispatch tunnel round trip amortizes away and what remains is
    # device compute + kernel launches — the number a real co-located
    # serving deployment would see (the wall figure above includes the
    # measurement tunnel's ~27 ms RTT once per search).
    import jax.numpy as jnp

    from pacmann_tpu.private.fused_search import _fused_segment, _seed_beam
    from pacmann_tpu.pir.params import DEFAULT_PROGRAM_POINT

    pir.preprocessing(rng=np.random.default_rng(5))  # fresh budget window
    p1, c1 = pir.params, pir.config
    g1kw = dict(psize=c1.partition_size, C=p1.chunk_size,
                R=p1.max_query_per_chunk, Hp=p1.primary_hint_num,
                S=p1.set_size, k=pir.k, max_q=p1.max_query_num,
                dpp=DEFAULT_PROGRAM_POINT, dim=dim, m=m,
                P=c1.partition_num, parallel=3,
                quota=3 * m // c1.partition_num, n=n,
                route=pir.kernel_route)
    q1_d = jnp.asarray(rng.random((1, dim), dtype=np.float32))

    def _g1_once(state, seed):
        beam = _seed_beam(q1_d, fs.start_ids, fs.start_vecs, fs.start_nbrs,
                          parallel=3, cap=3 + 20 * 3 * m, m=m)
        state, beam, stats = _fused_segment(
            pir.db, state, beam, q1_d,
            jax.random.split(jax.random.PRNGKey(seed), 20),
            jnp.int32(0), jnp.int32(20), **g1kw)
        return state, stats

    g1_state = pir.state
    g1_state, g1_stats = _g1_once(g1_state, 70)   # warm (compile + sync)
    np.asarray(g1_stats)
    g1_reps = 8
    t3 = time.perf_counter()
    for rp in range(g1_reps):
        g1_state, g1_stats = _g1_once(g1_state, 71 + rp)
    np.asarray(g1_stats)
    fused_query_device_ms = (time.perf_counter() - t3) / g1_reps * 1000
    pir.state = g1_state
    pir.queries_made_in_partition += (g1_reps + 1) * 20 * g1kw["quota"]
    fused16_ms_per_query, maint_ms_per_query, succ16, bound16 = fused_time(
        16, 20, reps=5)
    diag16 = fused_time.last_diag
    fused32_ms_per_query, maint32_ms_per_query, succ32, bound32 = fused_time(
        32, 40, reps=5)
    diag32 = fused_time.last_diag
    fused64_ms_per_query, maint64_ms_per_query, succ64, bound64 = fused_time(
        64, 60, reps=5)
    diag64 = fused_time.last_diag

    db_gb = n * entry_bytes / 1e9
    scale = n / 1_000_000.0
    vs = REFERENCE_HINTGEN_S * scale / t

    from pacmann_tpu.pir.device_engine import (
        _resolve_aes_route, _resolve_route)

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
            "online_ms_per_batch96": round(online_ms, 2),
            "online_success_rate": round(ok / max(tot, 1), 4),
            "fused_private_query_ms": round(fused_query_ms, 2),
            "fused_private_query_device_ms": round(
                fused_query_device_ms, 2),
            "fused16_ms_per_query": round(fused16_ms_per_query, 2),
            "fused32_ms_per_query": round(fused32_ms_per_query, 2),
            "maintenance_ms_per_query_group16": round(maint_ms_per_query, 2),
            "maintenance_ms_per_query_group32": round(
                maint32_ms_per_query, 2),
            "fused64_ms_per_query": round(fused64_ms_per_query, 2),
            "maintenance_ms_per_query_group64": round(
                maint64_ms_per_query, 2),
            "fused16_fetch_success": round(succ16, 4),
            "fused32_fetch_success": round(succ32, 4),
            "fused64_fetch_success": round(succ64, 4),
            "fused16_success_bound": round(bound16, 4),
            "fused32_success_bound": round(bound32, 4),
            "fused64_success_bound": round(bound64, 4),
            "fused16_refresh_diag": diag16,
            "fused32_refresh_diag": diag32,
            "fused64_refresh_diag": diag64,
            "reference_query_compute_ms": 55.9,
            "reference_maintenance_ms": 115.0,
            "platform": jax.devices()[0].platform,
            "protocol_route": _resolve_route(None),
            "aes_route": _resolve_aes_route(),
            "reference_s": REFERENCE_HINTGEN_S,
        },
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
