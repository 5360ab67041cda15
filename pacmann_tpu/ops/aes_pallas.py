"""Pallas bitsliced AES-128-MMO: the whole 10-round circuit in one kernel.

The XLA-compiled circuit (ops/aes.py) evaluates ~2000 boolean gate ops per
block; XLA splits them into hundreds of fusions whose intermediates round-
trip HBM, so the measured table-generation rate (~180 M evals/s on v5e) is
~20x below the VPU bound. This kernel keeps every round's state in
VMEM/registers: per grid step a (16 bytes, ws, 128)-shaped plane block
rides through all 10 rounds, and only the input words and the MMO output
word touch HBM.

Layout choice: the 16-byte axis is the LEADING (untiled) axis of each bit
plane, so ShiftRows / MixColumns byte permutations are static slices +
concatenation over whole (ws, 128) vector tiles — register renames, not
sublane shuffles (which Mosaic handles poorly). The (ws, 128) minor block
is pure lane data: every gate is one dense VPU op across all 16 bytes.

Round keys enter as (11, 8) u32 "mask16" words — bit j of mask16[r][b] is
bit b of round-key byte j — and expand in-kernel to byte-row masks with an
iota compare (the full 0/~0 plane masks would be 185 MB at P=16 table
scale; the packed form is 352 bytes/partition in SMEM).

Used by the offline PRF-table phase (device_engine._prep_fused) and
benchmarked against the XLA circuit; bit-exactness is pinned against the
FIPS-validated host oracle (tests/test_aes.py vectors ride through
prf_offset_table_device).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from pacmann_tpu.ops import aes as aes_ops
from pacmann_tpu.ops.aes import _SHIFT_ROWS, _ROT1, _ROT2, _ROT3
from pacmann_tpu.utils.platform import default_interpret


def masks_to_mask16(masks) -> jnp.ndarray:
    """(..., 11, 8, 16) full 0/~0 round-key plane masks -> (..., 11, 8) u32
    packed byte-bit words (bit j = byte j's key bit)."""
    masks = jnp.asarray(masks)
    bits = (masks & jnp.uint32(1)).astype(jnp.uint32)
    sh = jnp.arange(16, dtype=jnp.uint32)
    return jnp.sum(bits << sh, axis=-1, dtype=jnp.uint32)


def _perm_concat(plane, perm):
    """Static byte-axis permutation as slices + concat: whole-tile register
    moves, the only form Mosaic lowers (no gather support). XLA-CPU
    compiles thousands of these pathologically slowly, hence the twin."""
    return jnp.concatenate([plane[i : i + 1] for i in perm], axis=0)


def _perm_take(plane, perm):
    """The same permutation as one constant-index gather (XLA-friendly)."""
    return plane[np.asarray(perm)]


def _xtime_list(x):
    return [x[7], x[0] ^ x[7], x[1], x[2] ^ x[7], x[3] ^ x[7],
            x[4], x[5], x[6]]


def _mix_list(x, perm):
    xs = _xtime_list(x)
    return [
        xs[b] ^ perm(xs[b], _ROT1) ^ perm(x[b], _ROT1)
        ^ perm(x[b], _ROT2) ^ perm(x[b], _ROT3)
        for b in range(8)
    ]


def _mmo_low32_planes(s0, read_m16, perm):
    """The shared 10-round MMO circuit on byte-leading planes.

    s0: list of 8 (16, ws, 128) u32 bit planes; read_m16(r, b) -> scalar
    u32 whose bit j is round-key byte j's bit b; perm = the byte-axis
    permutation primitive (_perm_concat in the Pallas kernel, _perm_take
    in the XLA twin; their equivalence is unit-tested). Returns the 8
    output planes restricted to bytes 0..3 (the MMO low u32). The twin
    lets a cheap XLA-vs-host-oracle test pin the circuit; the kernel adds
    only ref/SMEM plumbing."""
    shape = s0[0].shape
    byte_iota = jax.lax.broadcasted_iota(jnp.uint32, shape, 0)

    def key_xor(x, r):
        out = []
        for b in range(8):
            m16 = read_m16(r, b)
            km = jnp.uint32(0) - ((m16 >> byte_iota) & jnp.uint32(1))
            out.append(x[b] ^ km)
        return out

    x = key_xor(s0, 0)
    for r in range(1, 10):
        x = aes_ops._sbox_planes(x)
        x = [perm(p, _SHIFT_ROWS) for p in x]
        x = _mix_list(x, perm)
        x = key_xor(x, r)
    x = aes_ops._sbox_planes(x)
    x = [perm(p, _SHIFT_ROWS) for p in x]
    x = key_xor(x, 10)
    return [x[b][:4] ^ s0[b][:4] for b in range(8)]  # MMO feed-forward


def _aes_mmo_kernel(m16_ref, s0_ref, out_ref):
    """Grid (P, lane-blocks). s0 block (8, 16, ws, 128) u32 bit planes
    (shared across partitions — the PRF input framing is key-independent);
    m16 (1, 11, 8) u32 SMEM per-partition packed round keys; out block
    (1, 8, 4, ws, 128): MMO output bytes 0..3 (the low-u32 planes)."""
    s0 = [s0_ref[b] for b in range(8)]
    out = _mmo_low32_planes(s0, lambda r, b: m16_ref[0, r, b], _perm_concat)
    for b in range(8):
        out_ref[0, b] = out[b]


@functools.partial(jax.jit, static_argnames=("ws", "interpret"))
def _aes_mmo_low32_blocks(m16, s0, *, ws: int, interpret: bool):
    """m16 (P, 11, 8) u32; s0 (8, 16, Ls, 128) u32 planes (shared input).
    Returns (P, 8, 4, Ls, 128) u32: per-partition low-word output planes."""
    P = m16.shape[0]
    Ls = s0.shape[2]
    nb = Ls // ws
    return pl.pallas_call(
        _aes_mmo_kernel,
        out_shape=jax.ShapeDtypeStruct((P, 8, 4, Ls, 128), jnp.uint32),
        grid=(P, nb),
        in_specs=[
            pl.BlockSpec((1, 11, 8), lambda p, ib: (p, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((8, 16, ws, 128), lambda p, ib: (0, 0, ib, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 8, 4, ws, 128),
                               lambda p, ib: (p, 0, 0, ib, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(m16, s0)


def _aes_mmo_kernel_perp(m16_ref, s0_ref, out_ref):
    """Per-partition-input variant: s0 block (1, 8, 16, ws, 128) — each
    partition evaluates its own lane block (the table-free online PRF,
    where tags/xs differ per partition)."""
    s0 = [s0_ref[0, b] for b in range(8)]
    out = _mmo_low32_planes(s0, lambda r, b: m16_ref[0, r, b], _perm_concat)
    for b in range(8):
        out_ref[0, b] = out[b]


@functools.partial(jax.jit, static_argnames=("ws", "interpret"))
def _aes_mmo_low32_blocks_perp(m16, s0, *, ws: int, interpret: bool):
    """m16 (P, 11, 8) u32; s0 (P, 8, 16, Ls, 128) u32 per-partition input
    planes. Returns (P, 8, 4, Ls, 128) u32 low-word output planes."""
    P = m16.shape[0]
    Ls = s0.shape[3]
    nb = Ls // ws
    return pl.pallas_call(
        _aes_mmo_kernel_perp,
        out_shape=jax.ShapeDtypeStruct((P, 8, 4, Ls, 128), jnp.uint32),
        grid=(P, nb),
        in_specs=[
            pl.BlockSpec((1, 11, 8), lambda p, ib: (p, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 8, 16, ws, 128), lambda p, ib: (p, 0, 0, ib, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 8, 4, ws, 128),
                               lambda p, ib: (p, 0, 0, ib, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(m16, s0)


def _kernel_ws() -> int:
    """Lane-block sublanes: 8 keeps the live bit-plane set (~50 values of
    16x8x128 u32 = ~3 MB) comfortably inside VMEM."""
    return 8


def _pack_table_block(base, Lc: int, S: int):
    """PRF input planes for ONE lattice block: word-group g, bit-slot r
    evaluates point n = base + r*Lc + g, g in [0, Lc). Returns s0
    (8, 16, Lc//128, 128) u32.

    COLUMN-MAJOR slot assignment (within the block), not the row-major
    n = 32g+r: a pure relabeling (the kernel is pointwise in lanes), but
    it lets _unpack_block emit the block's linear order with a plain
    reshape — the row-major form needed a (P, L, 32)-ish transpose whose
    tiny-minor-dims tiling padded 1.1 GB to 70 GB at the SIFT100M tier
    (measured compile OOM). All bit shuffles ride transpose32_cols: the
    32-axis is swapped with static slices, the big Lc axis stays
    lane-minor. `base` may be traced (lax.map over blocks)."""
    from pacmann_tpu.ops.bitops import transpose32_cols

    nidx = (base.astype(jnp.uint32) if hasattr(base, "dtype")
            else np.uint32(base))
    nidx = (nidx
            + jax.lax.broadcasted_iota(jnp.uint32, (32, Lc), 0)
            * np.uint32(Lc)
            + jax.lax.broadcasted_iota(jnp.uint32, (32, Lc), 1))
    lo = nidx % np.uint32(S)
    hi = (nidx // np.uint32(S)) << np.uint32(3)  # (tag<<35)+x framing, hi

    def word_planes(w):                       # (32, Lc) values -> (8, 4, Lc)
        t = transpose32_cols(w)               # plane p at [p, g]
        return jnp.transpose(t.reshape(4, 8, Lc), (1, 0, 2))

    z = jnp.zeros((8, 4, Lc), jnp.uint32)
    s0 = jnp.concatenate(
        [word_planes(lo), word_planes(hi), z, z], axis=1)   # (8, 16, Lc)
    return s0.reshape(8, 16, Lc // 128, 128)


def _unpack_block(out, P, Lc: int):
    """(P, 8, 4, Lc//128, 128) output planes -> (P, 32*Lc) u32 values in
    the block's linear order (slot (r, g) holds point base + r*Lc + g)."""
    from pacmann_tpu.ops.bitops import transpose32_cols

    blk = out.reshape(P, 8, 4, Lc)                      # (P, 8b, 4j, Lc)
    cols = jnp.transpose(blk, (0, 2, 1, 3)).reshape(P, 32, Lc)  # col 8j+b
    return transpose32_cols(cols).reshape(P, 32 * Lc)   # [p, r*Lc+g]


# One lattice block's input-plane sheet stays ~256 MB: the whole-lattice
# sheet at the SIFT100M tier is 2.2 GB (+ a 2 GB layout copy for the
# pallas operand), which did not fit next to the 11.9 GiB DB shard.
# Single block at SIFT1M scales and below (sheet ~26 MB).
_TABLE_BLOCK_WORDS = 1 << 19


@functools.partial(jax.jit, static_argnames=("T", "S", "chunk_mask",
                                             "interpret"))
def prf_tables_pallas(masks, T: int, S: int, chunk_mask: int,
                      interpret: bool | None = None):
    """All P partitions' PRF offset tables via the Pallas AES kernel:
    masks (P, 11, 8, 16) full round-key plane masks -> (P, T, S) u32.
    Same contract as lax.map over aes._prf_table_on_device (bit-exact)."""
    if interpret is None:
        interpret = default_interpret()
    P = masks.shape[0]
    ws = _kernel_ws()
    n = T * S
    lane_pad = 32 * ws * 128                  # evals per (ws, 128) block
    m16 = masks_to_mask16(masks)              # (P, 11, 8)

    Lc = min(_TABLE_BLOCK_WORDS, -(-n // (32 * 128)) * 128)
    Lc = -(-Lc // (ws * 128)) * (ws * 128)    # whole kernel grid blocks
    per_blk = 32 * Lc
    n_blk = -(-n // per_blk)
    pad = n_blk * per_blk

    def one_block(base):
        s0 = _pack_table_block(base, Lc, S)
        out = _aes_mmo_low32_blocks(m16, s0, ws=ws, interpret=interpret)
        return _unpack_block(out, P, Lc)      # (P, per_blk)

    if n_blk == 1:
        vals = one_block(0)
    else:
        # lax.map: ONE copy of the kernel + pack/unpack in the program,
        # ~256 MB of input planes live at a time (the whole-lattice sheet
        # at the SIFT100M tier is 2.2 GB + a layout copy — it did not fit
        # next to the 11.9 GiB DB shard)
        bases = jnp.arange(n_blk, dtype=jnp.uint32) * jnp.uint32(per_blk)
        vals = jnp.moveaxis(jax.lax.map(one_block, bases), 0, 1)
        vals = vals.reshape(P, pad)
    return (vals[:, :n] & jnp.uint32(chunk_mask)).reshape(P, T, S)


@functools.partial(jax.jit, static_argnames=("T", "S", "chunk_mask"))
def prf_tables_bytefirst_xla(masks, T: int, S: int, chunk_mask: int):
    """XLA twin of prf_tables_pallas: the SAME packing, round circuit
    (_mmo_low32_planes) and unpacking, with round-key scalars read from a
    traced array instead of SMEM. Exists so the circuit is testable
    cheaply off-TPU (the pallas interpreter pays a multi-minute compile);
    the kernel adds only BlockSpec/SMEM plumbing on top of this."""
    P = masks.shape[0]
    ws = _kernel_ws()
    n = T * S
    lane_pad = 32 * ws * 128
    pad = -(-n // lane_pad) * lane_pad
    Lc = pad // 32
    s0 = _pack_table_block(0, Lc, S)          # single block (test scale)
    Ls = s0.shape[2]
    m16 = masks_to_mask16(masks)
    outs = []
    for p in range(P):                        # test-scale P only
        blocks = []
        for ib in range(Ls // ws):
            planes = [s0[b, :, ib * ws : (ib + 1) * ws] for b in range(8)]
            o = _mmo_low32_planes(planes, lambda r, b: m16[p, r, b],
                                  _perm_take)
            blocks.append(jnp.stack(o))       # (8, 4, ws, 128)
        outs.append(jnp.concatenate(blocks, axis=2))
    out = jnp.stack(outs)                     # (P, 8, 4, Ls, 128)
    vals = _unpack_block(out, P, Lc)
    return (vals[:, :n] & jnp.uint32(chunk_mask)).reshape(P, T, S)


@functools.partial(jax.jit, static_argnames=("interpret",))
def prf_eval_fused_pallas(masks, tags, xs, chunk_mask,
                          interpret: bool | None = None):
    """Pallas twin of aes.prf_eval_fused: out[p, l] = PRF_p(tags[p, l],
    xs[p, l]) & chunk_mask, per-partition keys, one kernel. masks
    (P, 11, 8, 16); tags/xs (P, L0) u32. The table-free client's online
    primitive (pir.go:404-427).

    Lane padding is one (ws, 128)-word block = 32768 evals/partition (the
    kernel's grid granule): ~1.4x the needed work at the SIFT1M step shape
    (L0 = 2*Q*S = 23808) but up to ~16x at tiny test configs — acceptable
    because sub-vreg blocks would pad to the same vector-op count anyway
    (the (16, ws, 128) gates cost ceil(ws/8) sublane tiles regardless)."""
    if interpret is None:
        interpret = default_interpret()
    P, L0 = tags.shape
    ws = _kernel_ws()
    lane_pad = 32 * ws * 128
    L = -(-L0 // lane_pad) * lane_pad
    if L != L0:
        tags = jnp.pad(tags, ((0, 0), (0, L - L0)))
        xs = jnp.pad(xs, ((0, 0), (0, L - L0)))
    lo = xs.reshape(-1)
    hi = (tags << jnp.uint32(3)).reshape(-1)
    zeros = jnp.zeros_like(lo)
    s0 = aes_ops._pack_words([lo, hi, zeros, zeros])    # (8, 16, P*L/32)
    Ls = L // 32 // 128
    s0 = jnp.transpose(s0.reshape(8, 16, P, Ls, 128), (2, 0, 1, 3, 4))
    m16 = masks_to_mask16(masks)
    out = _aes_mmo_low32_blocks_perp(m16, s0, ws=ws, interpret=interpret)
    blk = out.reshape(P, 8, 4, L // 32)                 # (P, 8b, 4j, W)
    arr = jnp.transpose(blk, (0, 3, 2, 1)).reshape(-1, 32)
    vals = aes_ops.transpose32(arr).reshape(P, L)[:, :L0]
    return vals & jnp.uint32(chunk_mask)
