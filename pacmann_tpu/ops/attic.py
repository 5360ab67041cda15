"""Measured-negative / non-compilable kernels, kept OUT of the production
namespace (VERDICT r4 weak #5): each carries a full implementation, tests,
and a recorded verdict, but none is the routed path. They stay importable
(a) as regression/route-equivalence surfaces and (b) so the measurements in
RESULTS.md remain reproducible.

Contents and verdicts:

* ``xor_hintgen_pallas`` — partition-major Pallas hint-gen gather kernel.
  Correct under the interpreter, NOT compilable by the current Mosaic
  toolchain (tpu.dynamic_gather spans a single vreg / 8 sublanes, so
  arbitrary in-VMEM row gathers are inexpressible). Production path:
  xor_scan.xor_hintgen_mm (one-hot matmul) / xor_scan_parts (XLA gather).

* ``xor_scan_pallas`` — flat (non-partitioned) Pallas XOR-scan. Superseded
  by the same MM kernel; kept for the (S, C*k, 128) layout tests.

* ``xor_hintgen_mm_s8p`` / ``to_plane_major_s8`` — plane-major signed-byte
  MM scan. ~9 % faster than the production s8 kernel at online shapes but
  costs a +1.02 GiB resident DB copy at SIFT1M (probe_mm_variants);
  verdict: not worth the memory, default off.

* ``refresh_parity`` — Pallas Phase-C parity rewrite. MEASURED on real v5e
  (probe_select_finish, 2026-08-18): LOSES 7x to the XLA gather+select form
  (14.50 vs 2.10 ms/step) — the kernel streams the whole (Hp, Ep) parity
  block per partition while serializing a Q-step scalar loop. Production
  route: the dense XLA rewrite in device_engine._pir_finish; the "pallas"
  protocol route now uses only the claim kernel (which ties XLA).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from pacmann_tpu.ops.xor_scan import _hintgen_mm_offsets
from pacmann_tpu.utils.platform import default_interpret


# ---------------------------------------------------------------------------
# Plane-major s8 one-hot-matmul scan (probe-only: +1 GiB layout at SIFT1M)


def _hintgen_mm_kernel_s8p(off_ref, db_ref, out_ref, *, C: int, bb: int,
                           sc: int):
    """Plane-major s8 variant of xor_scan._hintgen_mm_kernel_s8: db_ref
    (1, sc, 4, C, E) holds byte plane p of chunks [s*sc, (s+1)*sc)
    PRE-EXTRACTED as signed int8 (see to_plane_major_s8), so the per-step
    shift/mask/sign-extend chain (~16 wide VPU ops) disappears; each plane
    is a static slice straight into the MXU. sc chunks per grid step
    amortize the fixed per-step grid/DMA bookkeeping."""
    s = pl.program_id(2)

    @pl.when(s == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    acc = jax.lax.bitcast_convert_type(out_ref[0], jnp.int32)  # (bb, E)
    for j in range(sc):
        offs = off_ref[0, pl.ds(s * sc + j, 1), :]   # (1, bb) i32
        offm = jnp.broadcast_to(offs, (C, bb))
        colm = jax.lax.broadcasted_iota(jnp.int32, (C, bb), 0)
        mt = (offm == colm).astype(jnp.int8)         # (C, bb) one-hot
        g = jnp.zeros(out_ref.shape[1:], jnp.int32)  # (bb, E)
        for plane in range(4):
            gp = jax.lax.dot_general(
                mt, db_ref[j, 0, plane], (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)    # (bb, E) = w or 0
            g = g | ((gp & jnp.int32(0xFF)) << (8 * plane))
        acc = acc ^ g
    out_ref[0] = jax.lax.bitcast_convert_type(acc, jnp.uint32)


@functools.partial(jax.jit, static_argnames=("k",))
def to_plane_major_s8(db4, k: int):
    """(S, P, C*k, 128) u32 chunk-major DB -> (S, P, 4, C, E) s8 byte
    planes (plane p = byte p of each u32, sign-reinterpreted). One-time
    layout for the plane-major MM kernels; same total bytes as db4."""
    S, P, CK, _ = db4.shape
    C = CK // k
    E = k * 128
    x = jax.lax.bitcast_convert_type(
        db4.reshape(S, P, C, E), jnp.int32)
    # astype(int8) wraps two's-complement, which IS the sign reinterpretation
    planes = [
        ((jax.lax.shift_right_logical(x, 8 * p) & jnp.int32(0xFF))
         .astype(jnp.int8))
        for p in range(4)
    ]
    return jnp.stack(planes, axis=2)                 # (S, P, 4, C, E)


@functools.partial(jax.jit, static_argnames=("C", "bb", "sc", "interpret"))
def _hintgen_mm_s8p_padded(dbp, offsets, C, bb, sc, interpret):
    """dbp (S, P, 4, C, E) s8; offsets (P, S, Tp) i32 (C = skip),
    Tp % bb == 0, S % sc == 0. Returns (P, Tp, E) u32."""
    P, S, Tp = offsets.shape
    E = dbp.shape[4]
    grid = (P, Tp // bb, S // sc)
    kernel = functools.partial(_hintgen_mm_kernel_s8p, C=C, bb=bb, sc=sc)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((P, Tp, E), jnp.uint32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, S, bb), lambda p, hb, s: (p, 0, hb),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((sc, 1, 4, C, E), lambda p, hb, s: (s, p, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, bb, E), lambda p, hb, s: (p, hb, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(offsets, dbp)


def xor_hintgen_mm_s8p(dbp, table, skip, k: int, sc: int = 1,
                       interpret=None):
    """One-hot-matmul scan over a plane-major s8 DB (see to_plane_major_s8).
    Same contract as xor_scan.xor_hintgen_mm: table (P, T, S) u32 offsets,
    skip (P, T, S) bool -> (P, T, k*128) u32. sc = chunks per grid step and
    must divide S (no silent adjustment — benchmark labels depend on it)."""
    if interpret is None:
        interpret = default_interpret()
    S, P, _, C, E = dbp.shape
    T = table.shape[1]
    if S % sc:
        raise ValueError(f"sc={sc} must divide S={S}")
    nblocks = max(1, -(-T // 1024))
    bb = -(-T // nblocks)
    bb = -(-bb // 128) * 128
    Tp = nblocks * bb
    off = _hintgen_mm_offsets(jnp.asarray(table), jnp.asarray(skip),
                              C=C, pad_to=Tp)
    out = _hintgen_mm_s8p_padded(dbp, off, C, bb, sc, interpret)
    return out[:, :T]


# ---------------------------------------------------------------------------
# Partition-major Pallas hint-gen gather kernel (NOT compilable: Mosaic's
# dynamic_gather spans one vreg only)


def _hintgen_kernel(off_ref, skip_ref, db_ref, out_ref, *, k: int, bb: int):
    """Grid (P, hint-blocks, S), chunks innermost: the parity block stays in
    VMEM while its partition's chunks stream through. Mosaic's gather needs
    input/indices/output shapes equal, so the block is sized to the chunk:
    bb = C entries -> (C*k, 128) gather."""
    s = pl.program_id(2)

    @pl.when(s == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    chunk = db_ref[0, 0]                       # (C*k, 128)
    # extract column s with an equal-shape lane gather (dynamic lane slices
    # are not expressible in Mosaic); all lanes agree, collapse with max
    off_blk = off_ref[0]                       # (bb, S)
    s_mat = jnp.full(off_blk.shape, s, jnp.int32)
    offs = jnp.max(jnp.take_along_axis(off_blk, s_mat, axis=1), axis=1)
    skip_blk = skip_ref[0]                     # (bb, S) i32 0/1
    skp = jnp.max(jnp.take_along_axis(skip_blk, s_mat, axis=1), axis=1)

    # row_mat[i, :] = offs[i//k]*k + i%k, built without sublane reshapes
    offs_m = jnp.broadcast_to(offs[:, None], (bb, 128))
    j_pat = jax.lax.broadcasted_iota(jnp.int32, (bb * k, 128), 0) % k
    row_mat = jnp.repeat(offs_m * k, k, axis=0) + j_pat
    g = jnp.take_along_axis(chunk, row_mat, axis=0)      # (bb*k, 128)
    keep_m = jnp.repeat(
        jnp.broadcast_to(skp[:, None], (bb, 128)), k, axis=0)
    g = jnp.where(keep_m == 0, g, jnp.uint32(0))
    out_ref[:] = out_ref[:] ^ g


@functools.partial(jax.jit, static_argnames=("k", "interpret"))
def _hintgen_pallas_padded(db4, offsets, skip, k, interpret):
    P, B, S = offsets.shape
    CK = db4.shape[2]
    bb = CK // k
    grid = (P, B // bb, S)
    kernel = functools.partial(_hintgen_kernel, k=k, bb=bb)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((P, B * k, 128), jnp.uint32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, bb, S), lambda p, hb, s: (p, hb, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bb, S), lambda p, hb, s: (p, hb, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, CK, 128), lambda p, hb, s: (s, p, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, bb * k, 128), lambda p, hb, s: (p, hb, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(offsets, skip, db4)
    return out.reshape(P, B, k, 128)


def xor_hintgen_pallas(db4, offsets, skip, k: int, interpret=None):
    """Pallas hint-generation scan on the partition-major DB:
    db4 (S, P, C*k, 128); offsets/skip (P, B, S) -> (P, B, k, 128).
    Same contract as xor_scan.xor_scan_parts.

    STATUS: correct under the interpreter, but NOT compilable by the current
    Mosaic toolchain — tpu.dynamic_gather only spans a single vreg (8
    sublanes), so arbitrary in-VMEM row gathers are inexpressible
    ("Multiple source vregs along gather dimension"). The production path is
    xor_scan_parts (XLA's native gather); revisit when Mosaic grows
    multi-vreg gathers."""
    if interpret is None:
        interpret = default_interpret()
    P, B, S = offsets.shape
    bb = db4.shape[2] // k
    Bp = (B + bb - 1) // bb * bb
    offsets = jnp.asarray(offsets, jnp.int32)
    skip = jnp.asarray(skip)
    if Bp != B:
        offsets = jnp.pad(offsets, ((0, 0), (0, Bp - B), (0, 0)))
        skip = jnp.pad(skip, ((0, 0), (0, Bp - B), (0, 0)),
                       constant_values=True)
    out = _hintgen_pallas_padded(
        jnp.asarray(db4), offsets, skip.astype(jnp.int32), k, interpret)
    return out[:, :B]


# ---------------------------------------------------------------------------
# Flat Pallas XOR scan (superseded by the one-hot-matmul kernel)


def _xor_kernel(off_ref, db_ref, out_ref, *, k: int, block_b: int):
    """Grid (hint blocks, chunks). The parity block stays resident in VMEM
    across the whole chunk stream (output revisiting); each grid step gathers
    this block's rows from the current chunk and XORs them in. Skips ride in
    the offsets: entries >= C*k address the chunk's zero padding row."""
    s = pl.program_id(1)

    @pl.when(s == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    chunk = db_ref[0]                        # (C*k + pad, 128), tail = zeros
    offs = off_ref[:, pl.ds(s, 1)][:, 0]     # (block_b,) row-block ids
    rows = (offs[:, None] * k
            + jnp.arange(k, dtype=jnp.int32)[None, :]).reshape(-1)
    g = jnp.take(chunk, rows, axis=0)        # (block_b*k, 128)
    out_ref[:] = out_ref[:] ^ g


@functools.partial(
    jax.jit, static_argnames=("k", "block_b", "interpret")
)
def _xor_scan_pallas_padded(db, offsets, k, block_b, interpret):
    """db (S, C*k + k_pad, 128) with a zeroed pad row block at the end;
    offsets (B, S) i32 row-block ids (skips point at the pad block)."""
    B, S = offsets.shape
    CK = db.shape[1]
    grid = (B // block_b, S)
    kernel = functools.partial(_xor_kernel, k=k, block_b=block_b)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((B * k, 128), jnp.uint32),
        grid=grid,
        in_specs=[
            # this hint block's full offset row (all chunks)
            pl.BlockSpec((block_b, S), lambda hb, s: (hb, 0),
                         memory_space=pltpu.VMEM),
            # one chunk, full width
            pl.BlockSpec((1, CK, 128), lambda hb, s: (s, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block_b * k, 128), lambda hb, s: (hb, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(offsets, db)
    return out.reshape(B, k, 128)


def xor_scan_pallas(db, offsets, skip, k: int, block_b: int = 2048,
                    interpret=None):
    """Pallas XOR scan; pads the hint/query axis to a block multiple and
    folds the skip mask into the offsets (skipped -> zero pad rows appended
    to every chunk)."""
    if interpret is None:
        interpret = default_interpret()
    B, S = offsets.shape
    CK = db.shape[1]
    block_b = min(block_b, max(8, B))
    Bp = (B + block_b - 1) // block_b * block_b
    # append one zeroed row block per chunk; pad sublanes to a multiple of 8
    pad_rows = ((CK + k + 7) // 8 * 8) - CK
    dbp = jnp.pad(jnp.asarray(db), ((0, 0), (0, pad_rows), (0, 0)))
    off = jnp.asarray(offsets, jnp.int32)
    off = jnp.where(jnp.asarray(skip), jnp.int32(CK // k), off)
    if Bp != B:
        off = jnp.pad(off, ((0, Bp - B), (0, 0)),
                      constant_values=CK // k)
    out = _xor_scan_pallas_padded(dbp, off, k, block_b, interpret)
    return out[:B]


# ---------------------------------------------------------------------------
# Pallas Phase-C parity refresh (loses 7x to the XLA gather+select form)


def _refresh_kernel(hit_ref, ok_ref, np_ref, pin_ref, pout_ref,
                    *, hb: int, Q: int):
    """Grid (P, Hp//hb). Stream this partition's parity block through VMEM
    and overwrite the <= Q refreshed rows in place (rows unique per
    partition by the claim invariant). hit/ok are full (P, Q) SMEM arrays
    indexed by program_id (Mosaic forbids (1, Q) SMEM row blocks)."""
    p = pl.program_id(0)
    b = pl.program_id(1)
    start = b * hb
    pout_ref[:] = pin_ref[:]

    def body(q, _):
        h = hit_ref[p, q]

        @pl.when((ok_ref[p, q] != 0) & (h >= start) & (h < start + hb))
        def _():
            pout_ref[0, pl.ds(h - start, 1), :] = np_ref[0, pl.ds(q, 1), :]

        return 0

    jax.lax.fori_loop(0, Q, body, 0)


def _pick_hb(Hp: int, cap: int = 1024) -> int:
    """Largest divisor of Hp that is <= cap and a multiple of 8 (sublane
    tile). Hp is always a multiple of the pow2 chunk size in real configs;
    fall back to the whole axis for odd test shapes."""
    for nb in range(-(-Hp // cap), Hp + 1):
        if Hp % nb == 0 and (Hp // nb) % 8 == 0 and Hp // nb <= cap:
            return Hp // nb
    return Hp


@functools.partial(jax.jit, static_argnames=("interpret",))
def _refresh_parity_impl(ppar, new_par, hit, ok, *, interpret: bool):
    P, Hp, Ep = ppar.shape
    Q = hit.shape[0]
    hb = _pick_hb(Hp)
    ht = hit.T.astype(jnp.int32)        # (P, Q)
    okt = ok.T.astype(jnp.int32)
    npt = jnp.swapaxes(new_par, 0, 1)                          # (P, Q, Ep)

    kernel = functools.partial(_refresh_kernel, hb=hb, Q=Q)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((P, Hp, Ep), jnp.uint32),
        grid=(P, Hp // hb),
        in_specs=[
            pl.BlockSpec((P, Q), lambda p, b: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((P, Q), lambda p, b: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, Q, Ep), lambda p, b: (p, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, hb, Ep), lambda p, b: (p, b, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, hb, Ep), lambda p, b: (p, b, 0),
                               memory_space=pltpu.VMEM),
        input_output_aliases={3: 0},
        interpret=interpret,
    )(ht, okt, npt, ppar)


def refresh_parity(ppar, new_par, hit, ok, *, interpret: bool | None = None):
    """Overwrite ppar[p, hit[q, p], :] with new_par[q, p, :] wherever
    ok[q, p] (hit slots unique per partition). ppar (P, Hp, Ep) u32,
    new_par (Q, P, Ep) u32, hit (Q, P) i32, ok (Q, P) bool.

    MEASURED: loses 7x to the XLA gather+select form (module docstring);
    not routed anywhere."""
    if interpret is None:
        interpret = default_interpret()
    return _refresh_parity_impl(ppar, new_par, hit, ok, interpret=interpret)


def refresh_parity_np(ppar, new_par, hit, ok):
    """NumPy twin of refresh_parity."""
    out = ppar.copy()
    Q, P = hit.shape
    for p in range(P):
        for q in range(Q):
            if ok[q, p]:
                out[p, hit[q, p]] = new_par[q, p]
    return out
