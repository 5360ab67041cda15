"""XOR parity scans over the chunk-major PIR database.

TPU-native equivalent of the reference's two XOR hot loops:
  - online server scan: PrivateQuery XORs one PRF-selected entry per chunk
    (/root/reference/pianopir/pir.go:65-88) via AVX `xorSlices`
    (aes_amd64.s:133-157);
  - offline hint generation: every chunk is XORed into every primary/backup
    hint parity at its PRF offset (pir.go:303-352).

Both are the same computation — out[b] = XOR_s db[s, offsets[b, s]] with an
optional per-(b, s) skip mask — so one kernel family serves both. The scan
streams chunks from HBM while parities stay resident, turning the gather-heavy
loop into stream + in-VMEM row gather + XOR accumulate.

Shapes (see pir/layout.py): db (S, C*k, 128); offsets (B, S) u32 in [0, C);
skip (B, S) bool; out (B, k, 128) u32.
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from pacmann_tpu.utils.platform import default_interpret


# ---------------------------------------------------------------------------
# XLA path: lax.scan over chunks (works everywhere; XLA lowers the row gather
# to the TPU's native gather).


@functools.partial(jax.jit, static_argnames=("k",))
def xor_scan_xla(db, offsets, skip, k: int):
    """out[b] = XOR_s (skip[b,s] ? 0 : db[s, offsets[b,s]*k : +k, :])."""
    B, S = offsets.shape

    def body(acc, inp):
        chunk, off_s, skip_s = inp
        rows = (off_s[:, None] * k + jnp.arange(k, dtype=jnp.uint32)).reshape(-1)
        g = jnp.take(chunk, rows.astype(jnp.int32), axis=0).reshape(B, k, 128)
        g = jnp.where(skip_s[:, None, None], jnp.uint32(0), g)
        return acc ^ g, None

    acc0 = jnp.zeros((B, k, 128), jnp.uint32)
    acc, _ = jax.lax.scan(body, acc0, (db, offsets.T, skip.T))
    return acc


def xor_scan_np(db, offsets, skip, k: int):
    """NumPy twin for tests. Same shapes/semantics as xor_scan_xla."""
    import numpy as np

    B, S = offsets.shape
    acc = np.zeros((B, k, 128), np.uint32)
    for s in range(S):
        rows = offsets[:, s].astype(np.int64)[:, None] * k + np.arange(k)
        g = db[s][rows.reshape(-1)].reshape(B, k, 128).copy()
        g[skip[:, s]] = 0
        acc ^= g
    return acc


@functools.partial(jax.jit, static_argnames=("k",))
def xor_gather_xla(db, offsets, skip, k: int):
    """Flat-gather XOR: materialize all (B, S, k) selected rows in one gather
    and XOR-reduce over chunks. Best for SMALL batches (online queries):
    one shallow op instead of an S-step scan. Memory = B*S*k*512 bytes.
    Same contract as xor_scan_xla."""
    B, S = offsets.shape
    CK = db.shape[1]
    flat = db.reshape(S * CK, 128)
    rows = (
        jnp.arange(S, dtype=jnp.int32)[None, :, None] * CK
        + offsets.astype(jnp.int32)[:, :, None] * k
        + jnp.arange(k, dtype=jnp.int32)[None, None, :]
    )
    g = jnp.take(flat, rows.reshape(-1), axis=0).reshape(B, S, k, 128)
    g = jnp.where(skip[:, :, None, None], jnp.uint32(0), g)
    return jax.lax.reduce(g, jnp.uint32(0), jax.lax.bitwise_xor, (1,))


# Above this many gathered bytes the flat-gather path's materialized
# (B, S, k, 128) tensor stops fitting comfortably; stream chunks instead.
_GATHER_BYTES_LIMIT = 256 * 1024 * 1024


def xor_scan_device(db, offsets, skip, k: int):
    """Pick the right device XOR strategy by working-set size."""
    B, S = offsets.shape
    if B * S * k * 512 <= _GATHER_BYTES_LIMIT:
        return xor_gather_xla(db, offsets, skip, k)
    return xor_scan_xla(db, offsets, skip, k)


@functools.partial(jax.jit, static_argnames=("k",))
def xor_gather_parts(db4, offsets, k: int):
    """Partition-major flat-gather XOR: db4 (S, P, C*k, 128) u32, offsets
    (P, S) u32 — ONE sub-query per partition. Returns (P, k, 128).
    This is the per-round server scan of the partition-sharded engine; with
    db4 sharded on its partition axis, it runs with zero collectives."""
    P, S = offsets.shape
    rows = (offsets.T.astype(jnp.int32)[:, :, None] * k
            + jnp.arange(k, dtype=jnp.int32)[None, None, :])   # (S, P, k)
    g = jnp.take_along_axis(db4, rows[..., None], axis=2)       # (S, P, k, 128)
    return jax.lax.reduce(g, jnp.uint32(0), jax.lax.bitwise_xor, (0,))


@functools.partial(jax.jit, static_argnames=("k",))
def xor_gather_multi(db4, offsets, k: int):
    """Partition-major flat-gather XOR for Q sub-queries per partition:
    db4 (S, P, C*k, 128), offsets (Q, P, S) u32 -> (Q, P, k, 128).
    One gather + XOR-reduce; working set Q*P*S*k*512 bytes."""
    Q, P, S = offsets.shape
    rows = (jnp.transpose(offsets, (2, 1, 0)).astype(jnp.int32)[:, :, :, None]
            * k + jnp.arange(k, dtype=jnp.int32))        # (S, P, Q, k)
    g = jnp.take_along_axis(
        db4, rows.reshape(S, P, Q * k)[..., None], axis=2)  # (S, P, Q*k, 128)
    g = g.reshape(S, P, Q, k, 128)
    red = jax.lax.reduce(g, jnp.uint32(0), jax.lax.bitwise_xor, (0,))
    return jnp.moveaxis(red, 0, 1)                        # (Q, P, k, 128)


# Measured crossover between the two online server-scan strategies: below
# this many gathered bytes the flat gather beats the MM kernel's fixed
# full-DB-stream floor (~2 ms); above it the gather's ~6 GB/s effective rate
# loses. Routing is decided at TRACE time, so it is pinned per compiled
# shape for the process lifetime (jit cache keyed on shapes) — which is the
# desired behavior: a given batch shape always takes the same path.
_MM_ROUTE_BYTES = 64 << 20


def xor_server_scan(db4, qs, k: int, route: str | None = None):
    """The server's online batch scan: db4 (S, P, C*k, 128), qs (Q, P, S)
    u32 offset vectors -> (Q, P, k, 128) parities.

    On TPU, LARGE batches route through the one-hot-matmul kernel (as
    hint-gen does): the flat random-row gather measured only ~6 GB/s
    effective at group-16 shapes (33 ms/call — the fused-search
    bottleneck), while the MM kernel streams every chunk once at HBM rate
    and does row selection on the MXU (~2 ms). SMALL batches keep the
    gather: the MM kernel's full-DB stream is a fixed ~2 ms floor that
    loses to a sub-millisecond 12 MB gather (group-1 fused regressed
    39 -> 77 ms when MM was unconditional). Both are bit-identical
    (test_server_scan_mm_route_matches_gather covers both on CPU).

    route: None = auto (size/platform heuristic, see _MM_ROUTE_BYTES);
    "mm" / "gather" force a path (tests exercise the TPU-default MM branch
    off-TPU this way; off-TPU the MM kernel runs interpreted).
    """
    from pacmann_tpu.utils.platform import on_tpu

    Q, P, S = qs.shape
    gathered = Q * P * S * k * 512          # bytes the gather touches
    if route is None:
        route = ("mm" if on_tpu() and gathered >= _MM_ROUTE_BYTES
                 else "gather")
    if route == "gather":
        return xor_gather_multi(db4, qs, k)
    table = jnp.transpose(qs, (1, 0, 2))                 # (P, Q, S)
    skip = jnp.zeros(table.shape, bool)
    out = xor_hintgen_mm(db4, table, skip, k)            # (P, Q, k*128)
    return jnp.transpose(out, (1, 0, 2)).reshape(Q, P, k, 128)


@functools.partial(jax.jit, static_argnames=("k",))
def xor_scan_parts(db4, offsets, skip, k: int):
    """Partition-major chunk-streaming XOR scan (hint generation):
    db4 (S, P, C*k, 128); offsets (P, B, S) u32; skip (P, B, S) bool.
    Returns (P, B, k, 128). Streams one chunk of every partition per step."""
    P, B, S = offsets.shape

    def body(acc, inp):
        chunk, off_s, skip_s = inp     # (P, C*k, 128), (P, B), (P, B)
        rows = (off_s.astype(jnp.int32)[:, :, None] * k
                + jnp.arange(k, dtype=jnp.int32)[None, None, :])  # (P, B, k)
        g = jnp.take_along_axis(chunk, rows.reshape(P, B * k)[..., None],
                                axis=1).reshape(P, B, k, 128)
        g = jnp.where(skip_s[:, :, None, None], jnp.uint32(0), g)
        return acc ^ g, None

    acc0 = jnp.zeros((P, B, k, 128), jnp.uint32)
    acc, _ = jax.lax.scan(
        body, acc0,
        (db4, jnp.moveaxis(offsets, 2, 0), jnp.moveaxis(skip, 2, 0)))
    return acc


# ---------------------------------------------------------------------------
# One-hot-matmul hint generation: the production Pallas kernel.
#
# The round-1 gather kernel (below) is blocked by Mosaic's single-vreg
# dynamic_gather. This kernel sidesteps gathers entirely: each grid step
# selects this hint block's row from the current chunk with a one-hot matrix
# multiply on the MXU. A one-hot row picks exactly one chunk entry, so the
# matmul "sum" IS the gather (never mix chunks into one matmul — that would
# sum entries where the protocol needs XOR; the XOR accumulation across
# chunks happens on the VMEM-resident parity block instead).
#
# u32 payloads ride through the MXU exactly as four u8 bit-planes in bf16
# (0..255 and their one-hot dot products are exact in bf16/f32). Parity
# blocks stay in VMEM across the whole chunk stream (grid revisiting), so
# HBM traffic is chunk streams + one parity write — the round-1 XLA scan
# paid a full parity-array round trip per chunk (~48 GB at SIFT1M scale).


def _hintgen_mm_kernel(off_ref, db_ref, out_ref, *, Cb: int, bb: int,
                       k: int):
    """Grid (P, hint-blocks, S, C//Cb), chunk sub-blocks innermost.

    off_ref (1, S, bb) i32: this block's offsets for ALL chunks (value C =
    skip) — the whole sheet rides in VMEM so it is DMA'd once per block,
    and row s is a dynamic sublane slice (Mosaic-legal; dynamic LANE
    slicing is not); db_ref (1, 1, Cb*k, 128) u32: entries [t*Cb,
    (t+1)*Cb) of chunk s in the engine's NATIVE row layout (entry c =
    rows c*k..c*k+k-1) — consuming db4 as-is matters: reshaping to
    (C, k*128) entry-major is a physical 1:1 copy of the whole DB on
    TPU (lane-dim change), which doubled HBM and OOM'd the 11.9 GiB
    SIFT100M shard. out_ref (1, bb, E=k*128) u32: the parity block,
    VMEM-resident across the whole chunk stream.

    The chunk axis is blocked (Cb <= 1024 entries) because a full chunk
    + its one-hot overflow the 16 MB scoped VMEM at C=8192; offsets
    outside [t*Cb, (t+1)*Cb) one-hot to zero rows, which are
    XOR-neutral, so blocking changes nothing semantically. Entry
    selection runs as k MXU dots — the r-th selects rows c*k+r — whose
    (bb, 128) results concatenate on lanes to the (bb, E) entry block.
    """
    s = pl.program_id(2)
    t = pl.program_id(3)

    @pl.when((s == 0) & (t == 0))
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    # Mosaic has no u32<->f32 casts: work on the same bits as i32 (logical
    # shifts keep plane extraction exact) and bitcast back at the end.
    rows = jax.lax.bitcast_convert_type(db_ref[0, 0], jnp.int32)  # (Cb*k, L)
    L = rows.shape[-1]
    offs = off_ref[0, pl.ds(s, 1), :]                # (1, bb) i32
    offm = jnp.broadcast_to(offs, (Cb * k, bb))
    rowm = jax.lax.broadcasted_iota(jnp.int32, (Cb * k, bb), 0)
    planes = [(jax.lax.shift_right_logical(rows, 8 * p)
               & jnp.int32(0xFF)).astype(jnp.float32).astype(jnp.bfloat16)
              for p in range(4)]                     # (Cb*k, L) each
    parts = []
    for r in range(k):
        # Mt[row, b] = (row == (offs[b] - t*Cb)*k + r); skips (offs == C)
        # and out-of-block offsets match no row -> zero contribution
        mt = (rowm == (offm - t * jnp.int32(Cb)) * k + r).astype(
            jnp.bfloat16)                            # (Cb*k, bb)
        g = jnp.zeros((bb, L), jnp.int32)
        for p in range(4):
            gp = jax.lax.dot_general(
                mt, planes[p], (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)  # (bb, L) exact ints
            g = g | (gp.astype(jnp.int32) << (8 * p))
        parts.append(g)
    g = parts[0] if k == 1 else jnp.concatenate(parts, axis=1)  # (bb, k*L)
    out_ref[0] = out_ref[0] ^ jax.lax.bitcast_convert_type(g, jnp.uint32)


def _hintgen_mm_kernel_s8(off_ref, db_ref, out_ref, *, Cb: int, bb: int,
                          k: int):
    """int8 variant of _hintgen_mm_kernel (same grid/block contract).

    Byte planes ride the MXU as SIGNED int8: reinterpreting a byte v as s8
    gives w = v - 256*(v>=128), the one-hot dot returns exactly w (or 0 on a
    skip), and w & 0xFF recovers v — no bias plane needed. s8*s8->s32 dots
    run at 2x the bf16 MXU rate on v5e.
    """
    s = pl.program_id(2)
    t = pl.program_id(3)

    @pl.when((s == 0) & (t == 0))
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    rows = jax.lax.bitcast_convert_type(db_ref[0, 0], jnp.int32)  # (Cb*k, L)
    L = rows.shape[-1]
    offs = off_ref[0, pl.ds(s, 1), :]                # (1, bb) i32
    offm = jnp.broadcast_to(offs, (Cb * k, bb))
    rowm = jax.lax.broadcasted_iota(jnp.int32, (Cb * k, bb), 0)
    planes = []
    for p in range(4):
        byte = (jax.lax.shift_right_logical(rows, 8 * p)
                & jnp.int32(0xFF))
        # sign-extend the byte: (x << 24) >> 24 arithmetic
        planes.append(jax.lax.shift_right_arithmetic(
            jax.lax.shift_left(byte, 24), 24).astype(jnp.int8))
    parts = []
    for r in range(k):
        mt = (rowm == (offm - t * jnp.int32(Cb)) * k + r).astype(
            jnp.int8)                                # (Cb*k, bb) one-hot
        g = jnp.zeros((bb, L), jnp.int32)
        for p in range(4):
            gp = jax.lax.dot_general(
                mt, planes[p], (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)    # (bb, L) = w or 0
            g = g | ((gp & jnp.int32(0xFF)) << (8 * p))
        parts.append(g)
    g = parts[0] if k == 1 else jnp.concatenate(parts, axis=1)  # (bb, k*L)
    out_ref[0] = out_ref[0] ^ jax.lax.bitcast_convert_type(g, jnp.uint32)


_MM_KERNELS = {"bf16": _hintgen_mm_kernel, "s8": _hintgen_mm_kernel_s8}


@functools.partial(jax.jit, static_argnames=("C", "k", "bb", "interpret",
                                             "dot"))
def _hintgen_mm_padded(db4, offsets, C, k, bb, interpret, dot="s8"):
    """db4 (S, P, C*k, 128) u32 — the engine's NATIVE layout, consumed
    as-is: an entry-major (C, E) reshape is a physical full-DB copy on
    TPU (lane-dim change), which doubled HBM and OOM'd the 11.9 GiB
    SIFT100M shard. offsets (P, S, Tp) i32 (C = skip), Tp % bb == 0.
    Returns (P, Tp, E) u32.

    The chunk axis runs as C//Cb sub-blocks of Cb <= 1024 entries (see
    _hintgen_mm_kernel): a full chunk + its one-hot overflow the 16 MB
    scoped VMEM at C=8192. Cb == C at SIFT1M shapes and below."""
    P, S, Tp = offsets.shape
    L = db4.shape[3]
    E = k * L
    # row block Cb*k <= 1024: with Cb=1024 AND k=2 the working set
    # (off sheet + db block + one-hots + planes) measured 4 KB over the
    # 16 MB scoped VMEM limit at the SIFT100M shard shapes
    Cb = min(C, max(1, 1024 // k))
    cap = Cb
    while C % Cb:
        # Cb must DIVIDE C or the grid silently drops the tail sub-block
        # (C=8192/k=2 -> 512 divides; k=3 tiers -> 341 would truncate)
        Cb -= 1
    if Cb < cap // 2:
        import warnings

        # engine C is always a power of two, so this only fires for direct
        # public-API calls with awkward C: a prime-ish C degrades to a
        # near-C-step chunk sub-grid — correct but pathologically slow
        warnings.warn(
            f"xor_hintgen_mm: chunk size C={C} has no divisor near the "
            f"VMEM cap ({cap}); using Cb={Cb} => {C // Cb} sub-blocks per "
            "chunk. Prefer a power-of-two C.", stacklevel=3)
    grid = (P, Tp // bb, S, C // Cb)
    kernel = functools.partial(_MM_KERNELS[dot], Cb=Cb, bb=bb, k=k)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((P, Tp, E), jnp.uint32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, S, bb), lambda p, hb, s, t: (p, 0, hb),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, Cb * k, L),
                         lambda p, hb, s, t: (s, p, t, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, bb, E), lambda p, hb, s, t: (p, hb, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(offsets, db4)


@functools.partial(jax.jit, static_argnames=("C", "pad_to"))
def _hintgen_mm_offsets(table, skip, *, C: int, pad_to: int):
    """(P, T, S) u32 offsets + (P, T, S) bool skip -> (P, S, Tp) i32 with
    skips folded in as C and the hint axis padded to Tp (pad rows = C)."""
    off = jnp.where(skip, jnp.int32(C), table.astype(jnp.int32))
    off = jnp.swapaxes(off, 1, 2)                    # (P, S, T)
    T = off.shape[2]
    if pad_to > T:
        off = jnp.pad(off, ((0, 0), (0, 0), (0, pad_to - T)),
                      constant_values=C)
    return off


def xor_hintgen_mm(db4, table, skip, k: int, interpret=None, dot="s8"):
    """One-hot-matmul hint generation (production TPU path).

    db4 (S, P, C*k, 128) u32 (the engine's chunk-major layout); table
    (P, T, S) u32 PRF offsets; skip (P, T, S) bool -> (P, T, k*128) u32.
    Same contract as xor_scan_parts followed by a (P, T, Ep) reshape.
    dot: "s8" (signed-byte planes, 2x MXU rate) or "bf16".
    """
    if interpret is None:
        interpret = default_interpret()
    S, P, CK, _ = db4.shape
    C = CK // k
    E = k * 128
    T = table.shape[1]
    # bb sizes the one-hot intermediates; 1024 keeps the kernel's scoped
    # VMEM under the 16 MB limit (2048 OOMs the compiler).
    nblocks = max(1, -(-T // 1024))
    bb = -(-T // nblocks)
    bb = -(-bb // 128) * 128                         # lane-aligned block
    Tp = nblocks * bb
    off = _hintgen_mm_offsets(jnp.asarray(table), jnp.asarray(skip),
                              C=C, pad_to=Tp)
    if C <= 1024:
        # entry-major fast path: the (C, E) reshape is a physical 1:1 DB
        # copy on TPU, affordable at <= ~1 GB tiers, and it halves the
        # one-hot MXU work (contraction over C entries, not C*k rows)
        dbE = jnp.asarray(db4).reshape(S, P, C, E)
        out = _hintgen_mm_padded(dbE, off, C, 1, bb, interpret, dot)
    else:
        # big-C tiers (SIFT100M shard: C=8192, 11.9 GiB): consume the
        # native layout as-is — the reshape copy would OOM HBM
        out = _hintgen_mm_padded(jnp.asarray(db4), off, C, k, bb,
                                 interpret, dot)
    return out[:, :T]


def xor_scan_host(db, offsets, skip, k: int):
    """Host-tier scan: native AVX2 kernel when built, NumPy otherwise."""
    from pacmann_tpu import native_lib

    if native_lib.available():
        return native_lib.xor_scan(db, offsets, skip, k)
    return xor_scan_np(db, offsets, skip, k)
