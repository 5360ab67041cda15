"""SIFT100M per-chip shard proof on REAL hardware (VERDICT r3 task 6 +
r4 task 2: the full fused private SEARCH at the big tier).

reports/sift100m_plan.json closes the 100M-tier byte budget on paper:
8 chips x 2 partitions x 6.25M entries x 640 B (run-private-search.sh's
SIFT100M config: n=1e8, d=128, m=32, batch 32 -> 16 partitions,
step=32, parallel=4). This probe runs ONE chip's exact shard on the real
v5e — same partition size, same derived PianoPIR parameters — and
measures:

  - offline hint-gen (preprocessing) wall-clock  [plan estimate 4.2 s]
  - online batch step at the per-shard shapes (128 global fetches /
    16 partitions = quota 8 per partition per step; 32 steps/query)
  - exact correctness of served entries against the host entry formula
  - the END-TO-END fused private search (beam+PIR) over the shard via
    the big-tier chained-programs route (FusedPrivateSearch auto-splits
    when the DB exceeds _PREP_SPLIT_DB_BYTES), with per-entry exactness
    asserted THROUGH the search's own fetch chain
  - HBM residency (device memory_stats where the plugin exposes them)

The 11.9 GiB DB shard is synthesized DIRECTLY into the packed
(S, P, C*k, 128) layout in HBM — raw (8 GB) + packed cannot coexist on a
16 GB chip, and the tunnel cannot upload 8 GB (measured 0.3-6 MB/s).
Entries decode as a VALID private-search vertex DB (the oracle packing,
private/oracle.py: f32[128] vector ‖ u32[32] neighbor ids) from a
deterministic u32 mix of the id, so the host can compute any expected
entry / vector / neighbor list without holding the DB, and the beam
actually traverses a (pseudo-random) graph.

Usage: python scripts/probe_100m_shard.py [--n 12500000] [--steps 32]
       [--search-steps 32] [--search-parallel 4] [--cpu] [--force-split]
"""
import argparse
import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

MIX_A = np.uint32(2654435761)   # Knuth multiplicative hash, wraps mod 2^32
MIX_B = np.uint32(0x9E3779B9)
D_VEC = 128                     # vector lanes (the tier's d)
M_NBR = 32                      # neighbor slots (the tier's m)


def host_vec(gidx: int) -> np.ndarray:
    """(128,) f32 vector of entry gidx — host twin of the device synth."""
    w = np.arange(D_VEC, dtype=np.uint32)
    h = (np.uint32(gidx) * np.uint32(D_VEC) + w) * MIX_A + MIX_B
    return (h >> np.uint32(8)).astype(np.float32) * np.float32(2.0 ** -24)


def host_nbrs(gidx: int, n: int) -> np.ndarray:
    """(32,) u32 neighbor ids of entry gidx — host twin."""
    j = np.arange(M_NBR, dtype=np.uint32)
    h = (np.uint32(gidx) ^ (j * MIX_B)) * MIX_A
    h = h ^ (h >> np.uint32(15))
    return h % np.uint32(n)


def expected_entry(gidx: int, *, n: int, entry_u32: int) -> np.ndarray:
    """Host twin of one packed entry (160 u32 words: vec bits ‖ nbrs)."""
    return np.concatenate(
        [host_vec(gidx).view(np.uint32), host_nbrs(gidx, n)])[:entry_u32]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=12_500_000,
                    help="shard entries (2 partitions of the 100M tier)")
    ap.add_argument("--steps", type=int, default=32)
    ap.add_argument("--quota", type=int, default=8,
                    help="per-partition sub-queries per step (100M tier: "
                         "parallel*m/partitions = 4*32/16)")
    ap.add_argument("--search-steps", type=int, default=32,
                    help="beam steps of the fused private search phase "
                         "(0 skips it)")
    ap.add_argument("--search-parallel", type=int, default=4)
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (small-shape smoke)")
    ap.add_argument("--force-split", action="store_true",
                    help="force the big-tier chained route even when the "
                         "DB is under the auto-split threshold (smoke)")
    ap.add_argument("--out", default=None,
                    help="report path (default reports/sift100m_shard.json "
                         "on TPU; /tmp/sift100m_smoke.json under --cpu so "
                         "smoke runs never clobber the hardware record)")
    args = ap.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    @functools.partial(jax.jit, static_argnums=(0, 1, 2, 3, 4, 5, 6))
    def synth_packed(S: int, P: int, CK: int, L: int, psize: int, n: int,
                     k: int):
        """(S, P, CK, L) u32 packed DB whose entries decode as the vertex
        oracle's packing: word w of entry gidx is
          w <  128        : bit pattern of f32 vector lane w  (in [0,1))
          128 <= w < 160  : neighbor id  mix2(gidx, w-128) % n
          w >= 160        : 0 (row padding)
        generated in one fused iota pass — no RNG state, no second buffer.
        Rows past psize in the last chunks are layout padding (never
        addressed by real queries; they only contribute consistently to
        hint parities)."""
        def flat(dim):
            return jax.lax.broadcasted_iota(jnp.uint32, (S, P, CK, L), dim)

        s_, p_, r_, l_ = flat(0), flat(1), flat(2), flat(3)
        kk = np.uint32(k)
        c = r_ // kk
        rr = r_ - c * kk
        C = np.uint32(CK // k)
        gidx = p_ * np.uint32(psize) + s_ * C + c
        w = rr * np.uint32(L) + l_
        h = (gidx * np.uint32(D_VEC) + w) * MIX_A + MIX_B
        vf = (h >> np.uint32(8)).astype(jnp.float32) * jnp.float32(2.0 ** -24)
        vbits = jax.lax.bitcast_convert_type(vf, jnp.uint32)
        j = w - np.uint32(D_VEC)
        hn = (gidx ^ (j * MIX_B)) * MIX_A
        hn = hn ^ (hn >> np.uint32(15))
        nbr = hn % np.uint32(n)
        return jnp.where(
            w < np.uint32(D_VEC), vbits,
            jnp.where(w < np.uint32(D_VEC + M_NBR), nbr, np.uint32(0)))

    from pacmann_tpu.pir.device_engine import DevicePianoEngine

    n, entry_bytes, batch = args.n, 640, 4        # batch 4 -> P=2 local
    entry_u32 = entry_bytes // 4
    assert entry_u32 == D_VEC + M_NBR

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
    db = synth_packed(S, P, C * k, 128, c.partition_size, n, k)
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
    if args.out:
        out_path = args.out
    elif args.cpu:
        out_path = "/tmp/sift100m_smoke.json"
    else:
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

    def save():
        with open(out_path, "w") as f:
            json.dump(report, f, indent=1)

    save()

    # ---- correctness: serve real batches through the public query API
    rng = np.random.default_rng(11)
    ok = tot = 0
    for _ in range(4):
        ids = [int(x) for x in rng.integers(0, n, size=batch)]
        out = eng.query(ids)
        for r, g in enumerate(ids):
            exp = expected_entry(g, n=n, entry_u32=entry_u32)
            if np.any(out[r] != 0):
                tot += 1
                ok += int(np.array_equal(out[r], exp))
    print(f"exact served entries: {ok}/{tot}", flush=True)
    report["exact_entries"] = [ok, tot]
    save()
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
    )
    save()

    # ---- the END-TO-END fused private search over the shard (VERDICT r4
    # task 2: the flagship beam+PIR search running at the >4 GiB tier via
    # the big-tier chained-programs route, fused_search.py:_route_step /
    # _select_step / _server_answer / _finish_step / _update_step — all
    # state device-resident, dispatches pipeline).
    if args.search_steps <= 0:
        print(f"report -> {out_path}", flush=True)
        return

    from pacmann_tpu.pir.device_engine import (
        DEFAULT_PROGRAM_POINT as _dpp, _finish_step, _select_step,
        _server_answer)
    from pacmann_tpu.private import fused_search as fsm
    from pacmann_tpu.private.fused_search import FusedPrivateSearch

    steps, par = args.search_steps, args.search_parallel
    n_starts = 64
    sids = ((np.arange(n_starts, dtype=np.uint64) * 2654435761) % n) \
        .astype(np.int64)
    svecs = np.stack([host_vec(int(g)) for g in sids])
    snbrs = np.stack([host_nbrs(int(g), n) for g in sids]).astype(np.int64)
    fs = FusedPrivateSearch(eng, sids, svecs, snbrs, dim=D_VEC, m=M_NBR, n=n)
    if args.force_split:
        fs.split_route = True
    route = "split" if fs._use_split() else "fused"
    print(f"search route: {route}", flush=True)
    report["search_route"] = route
    queries = rng.random((4, D_VEC)).astype(np.float32)

    # Entry exactness THROUGH the search's own chained fetch path: route
    # two steps from a seeded beam, serve them with the exact program
    # chain the timed search uses (this also IS the remote-compile warmup
    # for those programs), and check every served (quota, P) entry
    # against the host formula.
    Qn = 1
    F = Qn * par * M_NBR
    quota = F // P
    cap = par + steps * par * M_NBR
    qd = jnp.asarray(queries[:1])
    beam = fsm._seed_beam(qd, fs.start_ids, fs.start_vecs, fs.start_nbrs,
                          parallel=par, cap=cap, m=M_NBR)
    keys = jax.random.split(jax.random.PRNGKey(5), steps)
    rand_all, rnd_all = fsm._draw_step_randoms(
        keys, Qn=Qn, parallel=par, m=M_NBR, n=n, quota=quota, P=P,
        S=S, C=C)
    route_kw = dict(psize=c.partition_size, C=C, S=S, m=M_NBR, P=P,
                    parallel=par, quota=quota, n=n)
    sel_kw = dict(C=C, R=pp.max_query_per_chunk, Hp=pp.primary_hint_num,
                  S=S, k=eng.k, dpp=_dpp, route=eng.kernel_route)
    upd_kw = dict(dim=D_VEC, m=M_NBR, k=eng.k, P=P, parallel=par,
                  quota=quota)
    stats = jnp.zeros(3, jnp.int32)
    ok_e = tot_e = 0
    t0 = time.perf_counter()
    for g in range(2):
        beam, ro, idx_q, rnd = fsm._route_step(
            beam, qd, rand_all, rnd_all, jnp.int32(g), **route_kw)
        sel, qs = _select_step(eng.state, idx_q, rnd,
                               max_q=pp.max_query_num, **sel_kw)
        resp = _server_answer(eng.db, qs, k=eng.k)
        eng.state, entries, oks = _finish_step(eng.state, sel, resp,
                                               **sel_kw)
        idx_np, ok_np, ent_np = (np.asarray(idx_q), np.asarray(oks),
                                 np.asarray(entries))
        for r in range(quota):
            for pi in range(P):
                li = int(idx_np[r, pi])
                if li < 0 or not bool(ok_np.reshape(quota, P)[r, pi]):
                    continue
                exp = expected_entry(pi * c.partition_size + li, n=n,
                                     entry_u32=entry_u32)
                ent_row = ent_np.reshape(quota, P, -1)[r, pi]
                ok_e += int(np.array_equal(ent_row[:entry_u32], exp))
                tot_e += 1
        beam, stats = fsm._update_step(beam, stats, qd, entries, oks, ro,
                                       jnp.int32(g), **upd_kw)
    eng.queries_made_in_partition += 2 * quota
    print(f"search-chain exact entries: {ok_e}/{tot_e} "
          f"({time.perf_counter()-t0:.1f}s incl. compiles)", flush=True)
    report["search_exact_entries"] = [ok_e, tot_e]
    save()
    assert ok_e == tot_e and tot_e > 0, "search-chain entries mismatch"

    # warm end-to-end search (compiles _finish_topk; everything else is
    # already compiled by the verification chain above)
    fs.ensure_budget(steps, Qn, par, min_steps=steps)
    t0 = time.perf_counter()
    ans = fs.search(queries[:1], k=10, max_step=steps, parallel=par, seed=6)
    t_warm = time.perf_counter() - t0
    print(f"search warm call: {t_warm:.1f} s, answers {ans[0][:4]}...",
          flush=True)

    # timed group-1 searches; hints refreshed OUTSIDE the timed region
    # (maintenance is accounted separately, like the reference report)
    times = []
    for i in range(3):
        fs.ensure_budget(steps, Qn, par, min_steps=steps)
        t0 = time.perf_counter()
        out = fs.search(queries[i + 1: i + 2], k=10, max_step=steps,
                        parallel=par, seed=7 + i)
        times.append(time.perf_counter() - t0)
    t_search = min(times)
    consumed = steps * quota
    maint_search = t_prep * consumed / pp.max_query_num
    succ = fs.fetch_success_rate()
    print(f"fused private search: {t_search*1000:.1f} ms/query "
          f"({steps} steps x parallel {par}, quota {quota}/partition), "
          f"maintenance {maint_search*1000:.1f} ms/query amortized, "
          f"fetch success {succ:.4f}", flush=True)

    # answer sanity: the returned ranking must agree with host-recomputed
    # true distances (the ids' vectors are host-computable)
    q0 = queries[3]
    d_host = [float(((host_vec(int(a)) - q0) ** 2).sum())
              for a in out[0] if a >= 0]
    assert all(x <= y + 1e-4 for x, y in zip(d_host, d_host[1:])), d_host
    print(f"answer ranking consistent with host distances "
          f"({len(d_host)} answers)", flush=True)

    report.update(
        search_steps=steps, search_parallel=par,
        search_quota_per_partition=quota,
        search_ms_per_query=round(t_search * 1000, 2),
        search_maintenance_ms_per_query=round(maint_search * 1000, 2),
        search_fetch_success=round(succ, 4),
        search_warm_s=round(t_warm, 2),
        search_refreshes=fs.refreshes,
    )
    save()
    print(f"report -> {out_path}", flush=True)


if __name__ == "__main__":
    main()
