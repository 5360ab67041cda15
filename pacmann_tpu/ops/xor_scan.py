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


def xor_scan_host(db, offsets, skip, k: int):
    """Host-tier scan: native AVX2 kernel when built, NumPy otherwise."""
    from pacmann_tpu import native_lib

    if native_lib.available():
        return native_lib.xor_scan(db, offsets, skip, k)
    return xor_scan_np(db, offsets, skip, k)


# ---------------------------------------------------------------------------
# Pallas kernel: grid (hint-blocks, chunks); the parity block stays in VMEM
# across the whole chunk stream (output revisiting), chunks are streamed and
# double-buffered by the Pallas pipeline.


def _xor_kernel(off_ref, skip_ref, db_ref, out_ref, *, k: int, block_b: int):
    s = pl.program_id(1)

    @pl.when(s == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    chunk = db_ref[0]                        # (C*k, 128)
    offs = off_ref[:, 0]                     # (block_b,)
    rows = (offs[:, None] * k + jnp.arange(k, dtype=jnp.uint32)).reshape(-1)
    g = jnp.take(chunk, rows.astype(jnp.int32), axis=0)   # (block_b*k, 128)
    keep = jnp.logical_not(skip_ref[:, 0])
    keep = jnp.repeat(keep, k)[:, None]
    g = jnp.where(keep, g, jnp.uint32(0))
    out_ref[:] = out_ref[:] ^ g


@functools.partial(
    jax.jit, static_argnames=("k", "block_b", "interpret")
)
def _xor_scan_pallas_padded(db, offsets, skip, k, block_b, interpret):
    B, S = offsets.shape
    CK = db.shape[1]
    grid = (B // block_b, S)
    kernel = functools.partial(_xor_kernel, k=k, block_b=block_b)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((B * k, 128), jnp.uint32),
        grid=grid,
        in_specs=[
            # offsets column for this (hint block, chunk)
            pl.BlockSpec((block_b, 1), lambda hb, s: (hb, s),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_b, 1), lambda hb, s: (hb, s),
                         memory_space=pltpu.VMEM),
            # one chunk, full width
            pl.BlockSpec((1, CK, 128), lambda hb, s: (s, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block_b * k, 128), lambda hb, s: (hb, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(offsets, skip, db)
    return out.reshape(B, k, 128)


def xor_scan_pallas(db, offsets, skip, k: int, block_b: int = 2048,
                    interpret=None):
    """Pallas XOR scan; pads the hint/query axis to a block multiple."""
    if interpret is None:
        interpret = default_interpret()
    B, S = offsets.shape
    block_b = min(block_b, max(8, B))
    Bp = (B + block_b - 1) // block_b * block_b
    if Bp != B:
        offsets = jnp.pad(offsets, ((0, Bp - B), (0, 0)))
        skip = jnp.pad(skip, ((0, Bp - B), (0, 0)), constant_values=True)
    out = _xor_scan_pallas_padded(
        jnp.asarray(db), jnp.asarray(offsets), jnp.asarray(skip),
        k, block_b, interpret
    )
    return out[:B]


def xor_scan(db, offsets, skip, k: int, use_pallas: bool | None = None):
    if use_pallas is None:
        use_pallas = False
    if use_pallas:
        return xor_scan_pallas(db, offsets, skip, k)
    return xor_scan_xla(db, offsets, skip, k)
