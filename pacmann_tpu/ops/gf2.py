"""GF(2^8) host-side machinery for the bitsliced AES circuit.

The bitsliced S-box (ops/aes.py) computes x^254 = x^{-1} in GF(2^8) via an
addition chain whose squarings and final affine map are *linear over GF(2)*.
This module derives those 8x8 (and 8x15) bit-matrices programmatically from
the field definition, so the circuit is correct by construction; the FIPS-197
test vectors in tests/test_aes.py validate the whole pipeline.

Reference equivalence: the Go reference evaluates its PRF with AES-NI assembly
(/root/reference/pianopir/aes_amd64.s:19-126); on TPU there is no AES
instruction, so the S-box becomes a boolean circuit over u32 lanes.
"""

import numpy as np

AES_POLY = 0x11B  # x^8 + x^4 + x^3 + x + 1


def gf_mul(a: int, b: int) -> int:
    r = 0
    while b:
        if b & 1:
            r ^= a
        a <<= 1
        if a & 0x100:
            a ^= AES_POLY
        b >>= 1
    return r


def gf_pow(a: int, e: int) -> int:
    r = 1
    while e:
        if e & 1:
            r = gf_mul(r, a)
        a = gf_mul(a, a)
        e >>= 1
    return r


def _linear_matrix(fn) -> np.ndarray:
    """8x8 GF(2) matrix M (rows=out bit, cols=in bit) for a linear map fn."""
    m = np.zeros((8, 8), dtype=np.uint8)
    for i in range(8):
        y = fn(1 << i)
        for o in range(8):
            m[o, i] = (y >> o) & 1
    return m

# Squaring is linear over GF(2); collapse repeated squarings into one matrix.
SQ1 = _linear_matrix(lambda x: gf_pow(x, 2))    # x -> x^2
SQ2 = _linear_matrix(lambda x: gf_pow(x, 4))    # x -> x^4
SQ4 = _linear_matrix(lambda x: gf_pow(x, 16))   # x -> x^16


def _reduction_matrix() -> np.ndarray:
    """8x15 matrix folding carry-less product coefficients z_0..z_14 mod poly."""
    m = np.zeros((8, 15), dtype=np.uint8)
    for k in range(15):
        v = 1 << k
        # reduce x^k mod AES_POLY
        for bit in range(14, 7, -1):
            if v & (1 << bit):
                v ^= AES_POLY << (bit - 8)
        for o in range(8):
            m[o, k] = (v >> o) & 1
    return m

RED = _reduction_matrix()

# AES affine layer: s = A*x ^ 0x63 applied after inversion.
_AFFINE_C = 0x63


def _affine(x: int) -> int:
    y = 0
    for o in range(8):
        b = 0
        for t in (0, 4, 5, 6, 7):
            b ^= (x >> ((o + t) % 8)) & 1
        y |= b << o
    return y ^ _AFFINE_C

AFFINE_M = _linear_matrix(lambda x: _affine(x) ^ _AFFINE_C)
AFFINE_C_BITS = tuple((_AFFINE_C >> o) & 1 for o in range(8))


def sbox_table() -> np.ndarray:
    """The AES S-box derived from the field (no hardcoded table)."""
    t = np.zeros(256, dtype=np.uint8)
    for x in range(256):
        inv = gf_pow(x, 254) if x else 0
        t[x] = _affine(inv)
    return t

SBOX = sbox_table()
