"""SIFT100M per-chip shard proof on REAL hardware (VERDICT r3 task 6).

reports/sift100m_plan.json closes the 100M-tier byte budget on paper:
8 chips x 2 partitions x 6.25M entries x 640 B (run-private-search.sh's
SIFT100M config: n=1e8, d=128, m=32, batch 32 -> 16 partitions,
step=32, parallel=4). This probe runs ONE chip's exact shard on the real
v5e — same partition size, same derived PianoPIR parameters — and
measures the plan's compute half:

  - offline hint-gen (preprocessing) wall-clock  [plan estimate 4.2 s]
  - online batch step at the per-shard shapes (128 global fetches /
    16 partitions = quota 8 per partition per step; 32 steps/query)
  - exact correctness of served entries against the packed DB
  - HBM residency (device memory_stats where the plugin exposes them)

The 11.9 GiB DB shard is synthesized DIRECTLY into the packed
(S, P, C*k, 128) layout in HBM — raw (8 GB) + packed cannot coexist on a
16 GB chip, and the tunnel cannot upload 8 GB (measured 0.3-6 MB/s) —
via a deterministic u32 mix of the flat index, so the host can compute
any expected entry without holding the DB.

Usage: python scripts/probe_100m_shard.py [--n 12500000] [--steps 32]
"""
import argparse
import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

MIX_A = np.uint32(2654435761)   # Knuth multiplicative hash, wraps mod 2^32
MIX_B = np.uint32(0x9E3779B9)


@functools.partial(jax.jit, static_argnums=(0, 1, 2, 3))
def synth_packed(S: int, P: int, CK: int, L: int):
    """(S, P, CK, L) u32 pattern db[s,p,r,l] = mix(flat_index), generated
    in one fused iota pass (no RNG state, no second buffer)."""
    def flat(dim):
        return jax.lax.broadcasted_iota(jnp.uint32, (S, P, CK, L), dim)

    f = ((flat(0) * np.uint32(P) + flat(1)) * np.uint32(CK)
         + flat(2)) * np.uint32(L) + flat(3)
    return f * MIX_A + MIX_B


def expected_entry(gidx: int, *, psize, C, k, P, entry_u32) -> np.ndarray:
    """Host twin of synth_packed for one entry (160 u32 words)."""
    p, i = divmod(gidx, psize)
    s, c = divmod(i, C)
    words = []
    for r in range(k):
        row = np.uint32(((np.uint32(s) * np.uint32(P) + np.uint32(p))
                         * np.uint32(C * k)
                         + np.uint32(c * k + r)) * np.uint32(128))
        lane = np.arange(128, dtype=np.uint32)
        words.append((row + lane) * MIX_A + MIX_B)
    return np.concatenate(words)[:entry_u32]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=12_500_000,
                    help="shard entries (2 partitions of the 100M tier)")
    ap.add_argument("--steps", type=int, default=32)
    ap.add_argument("--quota", type=int, default=8,
                    help="per-partition sub-queries per step (100M tier: "
                         "parallel*m/partitions = 4*32/16)")
    args = ap.parse_args()

    from pacmann_tpu.pir.device_engine import (
        DevicePianoEngine, _pir_batch)
    from pacmann_tpu.pir.params import DEFAULT_PROGRAM_POINT

    n, entry_bytes, batch = args.n, 640, 4        # batch 4 -> P=2 local
    entry_u32 = entry_bytes // 4

    # Derive first (cheap, host-only) so synthesis knows the shapes.
    from pacmann_tpu.pir.params import derive_batch_params, derive_piano_params
    from pacmann_tpu.pir import layout
    c = derive_batch_params(n, entry_bytes, batch, 8)
    p = derive_piano_params(c.partition_size, entry_bytes, 8)
    k = layout.entry_rows(entry_u32)
    P, S, C = c.partition_num, p.set_size, p.chunk_size
    print(f"shard: n={n} P={P} psize={c.partition_size} C={C} S={S} "
          f"Hp={p.primary_hint_num} T={p.total_tags} R={p.max_query_per_chunk} "
          f"max_q={p.max_query_num}", flush=True)
    db_gib = S * P * C * k * 128 * 4 / 2**30
    print(f"packed db: {db_gib:.2f} GiB", flush=True)

    t0 = time.perf_counter()
    db = synth_packed(S, P, C * k, 128)
    np.asarray(db[-1, -1, -1, -1])                # force materialization
    t_synth = time.perf_counter() - t0
    print(f"synth: {t_synth:.1f} s", flush=True)

    eng = DevicePianoEngine(n, entry_bytes, batch, None, 8,
                            verbose=True, packed_db=db)
    del db

    # ---- offline: real hint generation (the plan's 4.2 s/chip estimate)
    t0 = time.perf_counter()
    eng.preprocessing(rng=np.random.default_rng(7))
    t_prep_cold = time.perf_counter() - t0        # includes remote compile
    t0 = time.perf_counter()
    eng.preprocessing(rng=np.random.default_rng(8))
    t_prep = time.perf_counter() - t0
    print(f"prep: cold {t_prep_cold:.1f} s (incl compile), warm "
          f"{t_prep:.2f} s", flush=True)

    mem = {}
    try:
        mem = {kk: int(v) for kk, v in
               jax.local_devices()[0].memory_stats().items()
               if "bytes" in kk}
        print(f"hbm in use: {mem.get('bytes_in_use', 0)/2**30:.2f} GiB "
              f"(peak {mem.get('peak_bytes_in_use', 0)/2**30:.2f})",
              flush=True)
    except Exception as e:                        # plugin may not expose
        print(f"memory_stats unavailable: {e}", flush=True)

    # write prep results NOW: the probe's later phases have their own
    # failure modes and the prep measurements must survive them
    out_path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "reports", "sift100m_shard.json")
    report = {
        "config": {"n_shard": n, "entry_bytes": entry_bytes,
                   "partitions": P, "partition_size": c.partition_size,
                   "chunk_size": C, "set_size": S,
                   "primary_hint_num": p.primary_hint_num,
                   "max_query_num": p.max_query_num},
        "db_gib": round(db_gib, 3),
        "synth_s": round(t_synth, 2),
        "prep_cold_s": round(t_prep_cold, 2),
        "prep_warm_s": round(t_prep, 3),
        "plan_prep_est_s": 4.2,
        "hbm": mem,
        "platform": jax.devices()[0].platform,
    }
    with open(out_path, "w") as f:
        json.dump(report, f, indent=1)

    # ---- online sub-phase probes first (localize faults at tier shapes:
    # prep was blocked by three distinct compile/memory failure modes
    # before it ran, each only identifiable by bisection)
    rng = np.random.default_rng(11)
    from pacmann_tpu.pir.device_engine import (
        _select_step, _server_answer, DEFAULT_PROGRAM_POINT as _dpp)
    pp0 = eng.params
    for tag, fn in (
        ("select", lambda: _select_step(
            eng.state,
            jnp.asarray(rng.integers(0, c.partition_size, size=(2, P))
                        .astype(np.int32)),
            jnp.asarray((rng.integers(0, 2**31, size=(2, P, S),
                                      dtype=np.int64) % C).astype(np.uint32)),
            C=C, R=pp0.max_query_per_chunk, Hp=pp0.primary_hint_num, S=S,
            k=eng.k, max_q=pp0.max_query_num, dpp=_dpp)),
        ("server_scan", lambda: _server_answer(
            eng.db,
            jnp.asarray((rng.integers(0, 2**31, size=(2, P, S),
                                      dtype=np.int64) % C).astype(np.uint32)),
            k=eng.k)),
    ):
        t0 = time.perf_counter()
        try:
            r = fn()
            np.asarray(jax.tree.leaves(r)[0].reshape(-1)[-1])
            print(f"online sub-phase {tag}: OK "
                  f"({time.perf_counter()-t0:.1f}s)", flush=True)
        except Exception as e:
            print(f"online sub-phase {tag}: FAIL {type(e).__name__}: "
                  f"{str(e)[:200]}", flush=True)
            report[f"online_{tag}_error"] = str(e)[:300]
            with open(out_path, "w") as f:
                json.dump(report, f, indent=1)

    # chained split-program round (the measure_comm client/server boundary
    # path): select -> scan -> finish as three dispatches — exercises the
    # finish phase, which the single-program probes above skip
    from pacmann_tpu.pir.device_engine import _finish_step
    try:
        t0 = time.perf_counter()
        idx2 = jnp.asarray(rng.integers(
            0, c.partition_size, size=(2, P)).astype(np.int32))
        rnd2 = jnp.asarray((rng.integers(0, 2**31, size=(2, P, S),
                                         dtype=np.int64) % C)
                           .astype(np.uint32))
        kwp = dict(C=C, R=pp0.max_query_per_chunk, Hp=pp0.primary_hint_num,
                   S=S, k=eng.k, dpp=_dpp)
        sel, qs = _select_step(eng.state, idx2, rnd2,
                               max_q=pp0.max_query_num, **kwp)
        resp = _server_answer(eng.db, qs, k=eng.k)
        new_state, entries, oks = _finish_step(eng.state, sel, resp, **kwp)
        np.asarray(entries[-1, -1, -1])
        eng.state = new_state
        print(f"online sub-phase finish (split round): OK "
              f"({time.perf_counter()-t0:.1f}s)", flush=True)
    except Exception as e:
        print(f"online sub-phase finish: FAIL {type(e).__name__}: "
              f"{str(e)[:200]}", flush=True)
        report["online_finish_error"] = str(e)[:300]
        with open(out_path, "w") as f:
            json.dump(report, f, indent=1)

    # ---- correctness: serve real batches through the public query API
    ok = tot = 0
    for _ in range(4):
        ids = [int(x) for x in rng.integers(0, n, size=batch)]
        out = eng.query(ids)
        for r, g in enumerate(ids):
            exp = expected_entry(g, psize=c.partition_size, C=C, k=k,
                                 P=P, entry_u32=entry_u32)
            served = np.any(out[r] != 0)
            if served:
                tot += 1
                ok += int(np.array_equal(out[r], exp))
    print(f"exact served entries: {ok}/{tot}", flush=True)
    report["exact_entries"] = [ok, tot]
    with open(out_path, "w") as f:
        json.dump(report, f, indent=1)
    assert ok == tot and tot > 0, "served entries mismatch"

    # ---- online: the batch step at per-shard shapes, host-looped over
    # the engine's own step path (the split three-program route at this
    # tier — async dispatches pipeline over the tunnel, so the loop costs
    # ~one round trip, not NSTEP)
    Q, NSTEP = args.quota, args.steps
    pp = eng.params

    def step_batch(i):
        idx = rng.integers(0, c.partition_size, size=(Q, P)).astype(np.int32)
        rnd = (rng.integers(0, 2**31, size=(Q, P, S), dtype=np.int64)
               % C).astype(np.uint32)
        return jnp.asarray(idx), jnp.asarray(rnd)

    def run_steps():
        ent = None
        for i in range(NSTEP):
            idx, rnd = step_batch(i)
            eng.state, ent, oks = eng._online(idx, rnd)
        np.asarray(ent[-1, -1, -1])               # sync the whole chain

    run_steps()                                   # compile + warm
    t0 = time.perf_counter()
    run_steps()
    t_step = (time.perf_counter() - t0) / NSTEP
    t_query = t_step * NSTEP
    # per-query maintenance: each query consumes quota*NSTEP of the
    # max_query_num window per partition (all partitions advance together)
    queries_per_window = pp.max_query_num // (Q * NSTEP)
    maint = t_prep / max(queries_per_window, 1)
    print(f"online: {t_step*1000:.2f} ms/step -> {t_query*1000:.1f} ms/query "
          f"compute ({NSTEP} steps); maintenance {maint*1000:.1f} ms/query "
          f"({queries_per_window} queries/window)", flush=True)

    report["config"].update(quota_per_step=Q, steps_per_query=NSTEP)
    report.update(
        step_ms=round(t_step * 1000, 3),
        query_compute_ms=round(t_query * 1000, 2),
        maintenance_ms_per_query=round(maint * 1000, 2),
        queries_per_window=queries_per_window,
        exact_entries=[ok, tot],
    )
    with open(out_path, "w") as f:
        json.dump(report, f, indent=1)
    print(f"report -> {out_path}", flush=True)


if __name__ == "__main__":
    main()
