"""Minimize the big-tier fused-online-program fault (VERDICT r4 weak #2).

At the SIFT100M shard (11.94 GiB packed DB) the single fused online
program `_online_step` COMPILES but its execution faults with an opaque
INTERNAL error at the result read, while the identical computation as
three chained programs (select / server scan / finish) runs fine — the
workaround `DevicePianoEngine._online` routes big tiers through the
split path (device_engine.py:884-896). This probe pins down WHERE the
fused program starts faulting, the way probe_corridor_fault.py pins the
beam-table crash.

Hypothesis under test: the fault tracks the DB crossing **2^31 u32
elements** (8.59 GiB) — a signed-i32 linearized-index overflow inside
some XLA fusion that only forms in the single-program version (the split
programs keep the server scan's blocked MM kernel in its own module).
The ladder therefore brackets both interesting boundaries:

  - 4.30 GiB  (just above _PREP_SPLIT_DB_BYTES — is the 4 GiB routing
               threshold conservative, or already necessary?)
  - 6.15 GiB
  - 8.20 GiB  (just UNDER 2^31 u32 elements)
  - 8.80 GiB  (just OVER  2^31 u32 elements)
  - 11.94 GiB (the SIFT100M shard where the fault was first seen)

Each shape runs in its OWN subprocess (`--one N`): a faulting execution
can poison the process/tunnel state, and smallest-first ordering plus
process isolation keeps one fault from shadowing the rest of the ladder.
The split route is re-run in the same subprocess after a fused fault to
confirm the split/fused discrepancy at that exact shape.

DB content is an arbitrary iota mix (the fault is shape-dependent, not
data-dependent) over zeroed dummy hint state (dummy_preprocessing), so a
shape costs one synth + one online compile, no hint generation.

Usage:
  python scripts/probe_fused_fault.py              # ladder on real TPU
  python scripts/probe_fused_fault.py --one 8388608   # single shape
  python scripts/probe_fused_fault.py --cpu        # tiny-shape smoke
"""
import argparse
import functools
import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

# shard-tier config constants (run-private-search.sh SIFT100M per chip)
ENTRY_BYTES = 640
BATCH = 4            # -> P=2 partitions, like the 100M per-chip shard
QUOTA = 8

# n values whose packed DBs bracket the two candidate boundaries; the
# packed entry is k=2 rows x 128 lanes x 4 B = 1 KiB (+ chunk padding)
LADDER = [4_400_000, 6_300_000, 8_350_000, 8_700_000, 12_500_000]
CPU_LADDER = [16_384, 32_768]


def run_one(n: int, cpu: bool, real: bool = False) -> dict:
    """Subprocess body: one shape, fused first, split on fused fault."""
    import jax
    if cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from pacmann_tpu.pir import layout
    from pacmann_tpu.pir.device_engine import (
        DevicePianoEngine, _finish_step, _online_step, _select_step,
        _server_answer, DEFAULT_PROGRAM_POINT)
    from pacmann_tpu.pir.params import derive_batch_params, derive_piano_params

    entry_u32 = ENTRY_BYTES // 4
    c = derive_batch_params(n, ENTRY_BYTES, BATCH, 8)
    p = derive_piano_params(c.partition_size, ENTRY_BYTES, 8)
    k = layout.entry_rows(entry_u32)
    P, S, C = c.partition_num, p.set_size, p.chunk_size
    db_elems = S * P * C * k * 128
    rec = {"n": n, "P": P, "C": C, "S": S,
           "db_gib": round(db_elems * 4 / 2**30, 3),
           "db_u32_elems": int(db_elems),
           "over_i32_elems": bool(db_elems > 2**31)}
    print(f"shape: {rec}", flush=True)

    @functools.partial(jax.jit, static_argnums=(0, 1, 2, 3))
    def synth(S, P, CK, L):
        def flat(dim):
            return jax.lax.broadcasted_iota(jnp.uint32, (S, P, CK, L), dim)
        f = ((flat(0) * np.uint32(P) + flat(1)) * np.uint32(CK)
             + flat(2)) * np.uint32(L) + flat(3)
        return f * np.uint32(2654435761) + np.uint32(0x9E3779B9)

    t0 = time.perf_counter()
    db = synth(S, P, C * k, 128)
    np.asarray(db[-1, -1, -1, -1])
    print(f"synth {time.perf_counter()-t0:.1f}s", flush=True)

    eng = DevicePianoEngine(n, ENTRY_BYTES, BATCH, None, 8, packed_db=db)
    del db

    def prep():
        if real:
            eng.preprocessing(rng=np.random.default_rng(3))
        else:
            eng.dummy_preprocessing(rng=np.random.default_rng(3))

    t0 = time.perf_counter()
    prep()
    rec["real_state"] = real
    print(f"prep ({'real' if real else 'dummy'}) "
          f"{time.perf_counter()-t0:.1f}s", flush=True)

    rng = np.random.default_rng(5)
    idx_q = jnp.asarray(
        rng.integers(0, c.partition_size, size=(QUOTA, P)).astype(np.int32))
    rnd = jnp.asarray((rng.integers(0, 2**31, size=(QUOTA, P, S),
                                    dtype=np.int64) % C).astype(np.uint32))
    kw = dict(C=C, R=p.max_query_per_chunk, Hp=p.primary_hint_num, S=S,
              k=eng.k, dpp=DEFAULT_PROGRAM_POINT, route=eng.kernel_route)

    # --- the single fused program, forced regardless of the split guard
    t0 = time.perf_counter()
    try:
        state2, entries, oks = _online_step(
            eng.db, dict(eng.state), idx_q, rnd, max_q=p.max_query_num, **kw)
        np.asarray(entries[-1, -1, -1])              # the faulting read
        rec["fused"] = "ok"
        print(f"fused: ok ({time.perf_counter()-t0:.1f}s incl compile)",
              flush=True)
    except Exception as e:
        rec["fused"] = f"FAULT {type(e).__name__}: {str(e)[:300]}"
        print(f"fused: FAULT after {time.perf_counter()-t0:.1f}s: "
              f"{type(e).__name__}: {str(e)[:300]}", flush=True)

    # --- the split route at the same shape (donation consumed eng.state
    # only on fused success; rebuild state either way)
    prep()
    t0 = time.perf_counter()
    try:
        sel, qs = _select_step(eng.state, idx_q, rnd,
                               max_q=p.max_query_num, **kw)
        resp = _server_answer(eng.db, qs, k=eng.k)
        state2, entries, oks = _finish_step(eng.state, sel, resp, **kw)
        np.asarray(entries[-1, -1, -1])
        rec["split"] = "ok"
        print(f"split: ok ({time.perf_counter()-t0:.1f}s incl compile)",
              flush=True)
    except Exception as e:
        rec["split"] = f"FAULT {type(e).__name__}: {str(e)[:300]}"
        print(f"split: FAULT {type(e).__name__}: {str(e)[:300]}", flush=True)
    return rec


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--one", type=int, default=0,
                    help="run a single shape in-process (subprocess body)")
    ap.add_argument("--real", action="store_true",
                    help="real preprocessing instead of dummy state (the "
                         "original fault context had real hint state; this "
                         "costs a full hint generation per shape)")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--timeout", type=int, default=1500,
                    help="per-shape subprocess bound (remote compiles are "
                         "20-120 s; synth+2 compiles fit well inside)")
    args = ap.parse_args()

    if args.one:
        rec = run_one(args.one, args.cpu, args.real)
        print("RESULT " + json.dumps(rec), flush=True)
        # exit code encodes the fused verdict for the driver loop
        sys.exit(0 if rec.get("fused") == "ok" else 2)

    ladder = CPU_LADDER if args.cpu else LADDER
    out_path = ("/tmp/fused_fault_smoke.json" if args.cpu else
                os.path.join(os.path.dirname(os.path.dirname(
                    os.path.abspath(__file__))),
                    "reports", "fused_fault_bisect.json"))
    results = []
    for n in ladder:
        cmd = [sys.executable, os.path.abspath(__file__), "--one", str(n)]
        if args.cpu:
            cmd.append("--cpu")
        if args.real:
            cmd.append("--real")
        print(f"=== n={n}", flush=True)
        try:
            cp = subprocess.run(cmd, capture_output=True, text=True,
                                timeout=args.timeout)
        except subprocess.TimeoutExpired as e:
            results.append({"n": n, "fused": "TIMEOUT",
                            "tail": (e.stdout or "")[-400:]})
            print(f"n={n}: TIMEOUT", flush=True)
            continue
        line = next((ln for ln in cp.stdout.splitlines()
                     if ln.startswith("RESULT ")), None)
        if line:
            results.append(json.loads(line[len("RESULT "):]))
        else:
            results.append({"n": n, "fused": f"DIED rc={cp.returncode}",
                            "tail": (cp.stdout + cp.stderr)[-400:]})
        print(cp.stdout[-600:], flush=True)
        with open(out_path, "w") as f:
            json.dump(results, f, indent=1)
    print(f"report -> {out_path}", flush=True)


if __name__ == "__main__":
    main()
