"""Device-resident batch-PIR engine: protocol contracts with hint state in
device memory (TestBatchPIRBasic semantics, pir_test.go:60-202, plus the
budget/refresh behavior of TestPIRBasic, :9-58)."""

import numpy as np

from pacmann_tpu.pir.device_engine import DevicePianoEngine


def _mk(rng, n=8192, entry_bytes=32, batch=32, fail=20):
    raw = rng.integers(0, 2**32, size=(n, entry_bytes // 4), dtype=np.uint32)
    pir = DevicePianoEngine(n, entry_bytes, batch, raw, fail)
    pir.preprocessing(rng=np.random.default_rng(100))
    return raw, pir


def test_device_spread_queries_exact():
    rng = np.random.default_rng(50)
    raw, pir = _mk(rng)
    c = pir.config
    ids = []
    for _ in range(2):
        ids += [int(i * c.partition_size + rng.integers(0, c.partition_size))
                for i in range(c.partition_num)]
    out = pir.query(ids)
    for r, idx in enumerate(ids):
        assert np.array_equal(out[r], raw[idx]), f"row {r} idx {idx}"


def test_device_duplicate_ids_in_batch():
    rng = np.random.default_rng(51)
    raw, pir = _mk(rng)
    ids = [7] * 32
    out = pir.query(ids)
    # quota rows answer exactly; the rest are served from the responses map
    assert np.array_equal(out[0], raw[7])
    assert np.array_equal(out[1], raw[7])


def test_device_overflow_dropped_to_zeros():
    rng = np.random.default_rng(52)
    raw, pir = _mk(rng)
    c = pir.config
    ids = list(range(32))  # all in partition 0
    out = pir.query(ids)
    answered = 32 // c.partition_num
    for r in range(answered):
        assert np.array_equal(out[r], raw[ids[r]])
    for r in range(answered, 32):
        assert np.all(out[r] == 0)


def test_device_cache_hits_across_batches():
    rng = np.random.default_rng(53)
    raw, pir = _mk(rng)
    c = pir.config
    ids = [int(i * c.partition_size) for i in range(c.partition_num)] * 2
    pir.query(ids)
    fin_before = int(np.asarray(pir.state["finished"]).sum())
    pir.query(ids)  # all cached -> no budget consumed
    fin_after = int(np.asarray(pir.state["finished"]).sum())
    assert fin_after == fin_before


def test_device_budget_reprep():
    rng = np.random.default_rng(54)
    n, batch = 2048, 32
    raw = rng.integers(0, 2**32, size=(n, 8), dtype=np.uint32)
    pir = DevicePianoEngine(n, 32, batch, raw, 20)
    pir.preprocessing(rng=np.random.default_rng(101))
    rounds = pir.params.max_query_num
    ok = 0
    for _ in range(rounds):
        ids = [int(rng.integers(0, n)) for _ in range(batch)]
        out = pir.query(ids)
        for r, idx in enumerate(ids):
            if np.array_equal(out[r], raw[idx]):
                ok += 1
    assert ok > rounds * batch * 0.65  # lossy FCFS bound (see test_batch_pir)


def test_device_nondivisible_padding():
    rng = np.random.default_rng(55)
    raw, pir = _mk(rng, n=8000)
    c = pir.config
    ids = [int(i * c.partition_size + rng.integers(0, min(
        c.partition_size, 8000 - i * c.partition_size)))
        for i in range(c.partition_num)]
    out = pir.query(ids)
    for r, idx in enumerate(ids):
        assert np.array_equal(out[r], raw[idx])
