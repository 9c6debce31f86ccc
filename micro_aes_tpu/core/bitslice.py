"""Bitsliced AES: the S-box as a GF((2^2)^2)^2 tower-field boolean circuit.

Rationale (SURVEY §7 "hard parts"): TPUs have no efficient per-byte
gather, so the table-lookup SubBytes of core/cipher.py is the correctness
oracle only.  Here each of the 128 state bits becomes a *plane* — a uint32
word holding that bit for 32 blocks — and every AES round is pure XOR/AND
plane algebra on the VPU:

  * SubBytes  -> basis change into the tower field, a ~40-AND inversion
                 circuit, basis change back + affine (derived, not copied:
                 the isomorphism matrices are *searched for* at import
                 time from the field definitions and verified against all
                 256 S-box entries);
  * ShiftRows -> a static permutation of the 16 byte-position columns;
  * MixColumns-> xtime is a plane-index shuffle + conditional XOR;
  * AddRoundKey-> XOR with broadcast key planes.

State layout: planes[8, 16, W] uint32 — bit index, byte position, packed
batch (W = N/32 blocks).  The same circuit functions run inside the
Pallas kernel (ops/pallas_cipher.py) and in plain jnp.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .cipher import INV_SHIFT_PERM, SHIFT_PERM
from .sbox import INV_SBOX, SBOX

# ---------------------------------------------------------------------------
# Host-side tower-field arithmetic (plain ints) used to derive the matrices
# ---------------------------------------------------------------------------
# GF(4) = GF(2)[w]/(w^2+w+1), element = b1<<1 | b0
# GF(16) = GF(4)[y]/(y^2+y+W), element = c1<<2 | c0  (W = 0b10)
# GF(256) = GF(16)[z]/(z^2+z+nu), element = d1<<4 | d0


def _gf4_mul(a, b):
    ah, al, bh, bl = a >> 1, a & 1, b >> 1, b & 1
    t = ah & bh
    return (((ah & bl) ^ (al & bh) ^ t) << 1) | ((al & bl) ^ t)


def _gf16_mul(a, b):
    a1, a0, b1, b0 = a >> 2, a & 3, b >> 2, b & 3
    hi = _gf4_mul(a1, b0) ^ _gf4_mul(a0, b1) ^ _gf4_mul(a1, b1)
    lo = _gf4_mul(a0, b0) ^ _gf4_mul(0b10, _gf4_mul(a1, b1))
    return (hi << 2) | lo


def _make_gf256t_mul(nu):
    def mul(a, b):
        a1, a0, b1, b0 = a >> 4, a & 15, b >> 4, b & 15
        hi = _gf16_mul(a1, b0) ^ _gf16_mul(a0, b1) ^ _gf16_mul(a1, b1)
        lo = _gf16_mul(a0, b0) ^ _gf16_mul(nu, _gf16_mul(a1, b1))
        return (hi << 4) | lo
    return mul


def _find_nu():
    squares_plus = {_gf16_mul(a, a) ^ a for a in range(16)}
    for nu in range(1, 16):
        if nu not in squares_plus:
            return nu
    raise AssertionError("no irreducible z^2+z+nu found")


_NU = _find_nu()
_TMUL = _make_gf256t_mul(_NU)


def _tower_pow(a, k):
    r = 1
    for _ in range(k):
        r = _TMUL(r, a)
    return r


def _find_isomorphism():
    """Root of the AES polynomial in the tower field -> basis-change
    matrix M with bits(phi(v)) = M @ bits(v) over GF(2)."""
    for r in range(2, 256):
        # p(r) = r^8 + r^4 + r^3 + r + 1 in the tower field
        p = _tower_pow(r, 8) ^ _tower_pow(r, 4) ^ _tower_pow(r, 3) ^ r ^ 1
        if p == 0:
            cols = [_tower_pow(r, i) for i in range(8)]
            m = np.zeros((8, 8), dtype=np.uint8)
            for i, c in enumerate(cols):
                for k in range(8):
                    m[k, i] = (c >> k) & 1
            return m
    raise AssertionError("AES polynomial has no root in tower field")


def _gf2_matinv(m):
    n = m.shape[0]
    a = np.concatenate([m.astype(np.uint8), np.eye(n, dtype=np.uint8)], axis=1)
    for col in range(n):
        piv = next(r for r in range(col, n) if a[r, col])
        a[[col, piv]] = a[[piv, col]]
        for r in range(n):
            if r != col and a[r, col]:
                a[r] ^= a[col]
    return a[:, n:]


def _affine_matrix():
    """L of the AES affine transform y = L x ^ 0x63."""
    L = np.zeros((8, 8), dtype=np.uint8)
    for k in range(8):
        for j in range(5):  # x, rotl1..rotl4
            L[k, (k - j) % 8] ^= 1
    return L


_M = _find_isomorphism()           # AES bits -> tower bits
_MI = _gf2_matinv(_M)              # tower bits -> AES bits
_L = _affine_matrix()
_LI = _gf2_matinv(_L)

# Forward S-box: out = (L @ MI) . towerinv(M . x) ^ 0x63
MAT_IN_F = _M
MAT_OUT_F = (_L @ _MI) % 2
CONST_OUT_F = 0x63
# Inverse S-box: out = MI . towerinv((M @ LI) . x ^ (M @ LI).c) with c=0x63
MAT_IN_B = (_M @ _LI) % 2
_c_bits = np.array([(0x63 >> k) & 1 for k in range(8)], np.uint8)
CONST_IN_B = int.from_bytes(
    bytes([np.packbits((MAT_IN_B @ _c_bits) % 2, bitorder="little")[0]]), "little"
)
MAT_OUT_B = _MI
CONST_OUT_B = 0


# ---------------------------------------------------------------------------
# The plane circuit (works on any array type supporting ^ and &)
# ---------------------------------------------------------------------------

def _xor_program(mat) -> tuple[list, list]:
    """Greedy pair-factoring (Paar) of a GF(2) matrix into a straight-line
    XOR program.  Returns (ops, outputs): ops are (a, b) signal-index
    pairs appended after the 8 inputs; outputs[k] is the signal index of
    row k (or -1 for a zero row)."""
    rows = [frozenset(i for i in range(8) if mat[k, i]) for k in range(8)]
    rows = [set(r) for r in rows]
    nsignals = 8
    ops: list[tuple[int, int]] = []
    while True:
        from collections import Counter

        pairs = Counter()
        for r in rows:
            rs = sorted(r)
            for x in range(len(rs)):
                for y in range(x + 1, len(rs)):
                    pairs[(rs[x], rs[y])] += 1
        if not pairs:
            break
        (a, b), cnt = pairs.most_common(1)[0]
        if cnt < 1 or all(len(r) <= 1 for r in rows):
            break
        ops.append((a, b))
        new = nsignals
        nsignals += 1
        for r in rows:
            if a in r and b in r:
                r.discard(a)
                r.discard(b)
                r.add(new)
        if all(len(r) <= 1 for r in rows):
            break
    outputs = [next(iter(r)) if r else -1 for r in rows]
    return ops, outputs


def _linmap_with_program(planes, ops, outputs, const=0):
    signals = list(planes)
    for a, b in ops:
        signals.append(signals[a] ^ signals[b])
    out = []
    for k in range(8):
        idx = outputs[k]
        acc = signals[idx] if idx >= 0 else planes[0] ^ planes[0]
        if (const >> k) & 1:
            acc = ~acc  # XOR with the all-ones plane
        out.append(acc)
    return out


_PROGRAM_CACHE: dict = {}


def _linmap(planes, mat, const=0):
    """out_k = XOR_i mat[k,i]*planes[i]  (^ all-ones where const bit set),
    via a CSE-factored XOR program (≈half the XORs of the dense form)."""
    key = mat.tobytes()
    prog = _PROGRAM_CACHE.get(key)
    if prog is None:
        prog = _xor_program(mat)
        _PROGRAM_CACHE[key] = prog
    return _linmap_with_program(planes, prog[0], prog[1], const)


def _g4_mul(a, b):
    ah, al = a
    bh, bl = b
    t = ah & bh
    return ((ah & bl) ^ (al & bh) ^ t, (al & bl) ^ t)


def _g4_sq(a):
    ah, al = a
    return (ah, al ^ ah)


def _g4_mul_w(a):  # multiply by W=(1,0): (a1+a0)w + a1
    ah, al = a
    return (ah ^ al, ah)


def _g16_mul(a, b):
    a1, a0 = a
    b1, b0 = b
    p11 = _g4_mul(a1, b1)
    p00 = _g4_mul(a0, b0)
    ps = _g4_mul((a1[0] ^ a0[0], a1[1] ^ a0[1]), (b1[0] ^ b0[0], b1[1] ^ b0[1]))
    # hi = a1b0 + a0b1 + a1b1 = (ps + p11 + p00) + p11 = ps + p00
    hi = (ps[0] ^ p00[0], ps[1] ^ p00[1])
    wl = _g4_mul_w(p11)
    lo = (p00[0] ^ wl[0], p00[1] ^ wl[1])
    return (hi, lo)


def _g16_sq(a):
    a1, a0 = a
    s1 = _g4_sq(a1)
    s0 = _g4_sq(a0)
    wl = _g4_mul_w(s1)
    return (s1, (s0[0] ^ wl[0], s0[1] ^ wl[1]))


def _g16_mul_const(a, c):
    """Multiply GF16 planes by a constant (linear over GF2, trace-time)."""
    mat = np.zeros((4, 4), dtype=np.uint8)
    for i in range(4):
        v = _gf16_mul(1 << i, c)
        for k in range(4):
            mat[k, i] = (v >> k) & 1
    bits = [a[1][1], a[1][0], a[0][1], a[0][0]]  # b0,b1,b2,b3
    out = []
    for k in range(4):
        acc = None
        for i in range(4):
            if mat[k, i]:
                acc = bits[i] if acc is None else acc ^ bits[i]
        out.append(acc if acc is not None else bits[0] ^ bits[0])
    return ((out[3], out[2]), (out[1], out[0]))


def _g16_inv(a):
    """GF16 inverse via the GF4 sub-tower: for y^2+y+W,
    (c1 y + c0)^-1 = c1*d^-1 y + (c0+c1)*d^-1, d = c0^2 + c0 c1 + W c1^2;
    GF4 inverse is squaring."""
    c1, c0 = a
    d = _g4_mul(c0, c1)
    s0 = _g4_sq(c0)
    s1w = _g4_mul_w(_g4_sq(c1))
    d = (d[0] ^ s0[0] ^ s1w[0], d[1] ^ s0[1] ^ s1w[1])
    dinv = _g4_sq(d)
    e1 = _g4_mul(c1, dinv)
    e0 = _g4_mul((c0[0] ^ c1[0], c0[1] ^ c1[1]), dinv)
    return (e1, e0)


def _tower_inv(planes):
    """GF256 tower inversion on 8 planes [b0..b7]."""
    d0 = ((planes[3], planes[2]), (planes[1], planes[0]))
    d1 = ((planes[7], planes[6]), (planes[5], planes[4]))

    def xor16(x, y):
        return ((x[0][0] ^ y[0][0], x[0][1] ^ y[0][1]),
                (x[1][0] ^ y[1][0], x[1][1] ^ y[1][1]))

    delta = xor16(_g16_mul(d0, d1), _g16_sq(d0))
    delta = xor16(delta, _g16_mul_const(_g16_sq(d1), _NU))
    dinv = _g16_inv(delta)
    e1 = _g16_mul(d1, dinv)
    e0 = _g16_mul(xor16(d0, d1), dinv)
    return [e0[1][1], e0[1][0], e0[0][1], e0[0][0],
            e1[1][1], e1[1][0], e1[0][1], e1[0][0]]


def sbox_planes(planes, forward: bool = True):
    """Apply (inverse) SubBytes to a list of 8 bit-planes."""
    if forward:
        t = _linmap(planes, MAT_IN_F)
        inv = _tower_inv(t)
        return _linmap(inv, MAT_OUT_F, CONST_OUT_F)
    t = _linmap(planes, MAT_IN_B, CONST_IN_B)
    inv = _tower_inv(t)
    return _linmap(inv, MAT_OUT_B, CONST_OUT_B)


def _xtime_planes(p):
    """Bitsliced GF(2^8) doubling: y = x<<1 ^ 0x1b*(x>>7)."""
    return [p[7], p[0] ^ p[7], p[1], p[2] ^ p[7], p[3] ^ p[7],
            p[4], p[5], p[6]]


# ---------------------------------------------------------------------------
# Self-check of the derived circuit against the table S-box (once, import)
# ---------------------------------------------------------------------------

def _selfcheck():
    x = np.arange(256, dtype=np.uint8)
    planes = [((x >> b) & 1).astype(np.uint8) for b in range(8)]
    # emulate ~ on 0/1 numpy planes: operate in uint8, mask to bit 0 at end
    out = sbox_planes([p.astype(np.int32) for p in planes], True)
    got = np.zeros(256, dtype=np.int32)
    for b in range(8):
        got |= (out[b] & 1) << b
    assert np.array_equal(got.astype(np.uint8), SBOX), "tower S-box mismatch"
    out = sbox_planes([p.astype(np.int32) for p in planes], False)
    got = np.zeros(256, dtype=np.int32)
    for b in range(8):
        got |= (out[b] & 1) << b
    assert np.array_equal(got.astype(np.uint8), INV_SBOX), "tower inv-S mismatch"


_selfcheck()


# ---------------------------------------------------------------------------
# Pack / unpack and the full bitsliced cipher (jnp)
# ---------------------------------------------------------------------------

_SHIFTS8 = np.arange(8, dtype=np.uint8)


def pack_planes(blocks: jax.Array) -> jax.Array:
    """uint8[N,16] -> uint32[8,16,W] planes; N must be a multiple of 32.
    Plane [b,p,w] bit j = bit b of byte p of block 32w+j.

    Two-level pack (8 bits in uint8, then 4 bytes into uint32) keeps the
    intermediates at ~1x the data size instead of the naive 32x int32
    blowup — this path is HBM-bound, so traffic is everything."""
    n = blocks.shape[0]
    w = n // 32
    planes = []
    for b in range(8):
        bit = ((blocks >> b) & 1).reshape(w, 4, 8, 16)  # uint8
        by = jnp.sum(bit << _SHIFTS8[None, None, :, None], axis=2,
                     dtype=jnp.uint8)  # [w,4,16]: 8 blocks per byte
        word = (by[:, 0].astype(jnp.uint32)
                | (by[:, 1].astype(jnp.uint32) << 8)
                | (by[:, 2].astype(jnp.uint32) << 16)
                | (by[:, 3].astype(jnp.uint32) << 24))  # [w,16]
        planes.append(word.T)
    return jnp.stack(planes)  # [8,16,W]


def unpack_planes(planes: jax.Array, n: int) -> jax.Array:
    """uint32[8,16,W] -> uint8[N,16] (inverse two-level unpack)."""
    w = planes.shape[-1]
    p = planes.transpose(2, 0, 1)  # [W,8,16] u32
    by = jnp.stack([(p >> (8 * k)).astype(jnp.uint8) for k in range(4)],
                   axis=1)  # [W,4,8,16] u8: byte k holds blocks 8k..8k+7
    bits = (by[:, :, None, :, :] >> _SHIFTS8[None, None, :, None, None]) & 1
    # bits: [W, 4, 8(block-in-byte), 8(bitplane), 16]
    out = jnp.sum(bits << jax.lax.broadcasted_iota(jnp.uint8, (1, 1, 1, 8, 1), 3),
                  axis=3, dtype=jnp.uint8)  # [W,4,8,16]
    return out.reshape(w * 32, 16)[:n]


def _transpose32(rows: list) -> list:
    """32x32 bit-matrix transpose on 32 uint32 vectors (Hacker's-Delight
    butterfly, 5 stages of masked swaps) — vectorized over the trailing
    word axis.  out[i] bit j == in[j] bit i."""
    a = list(rows)
    j = 16
    m = np.uint32(0x0000FFFF)
    while j:
        k = 0
        while k < 32:
            # LSB-first variant: row k's HIGH bits pair with row k+j's LOW
            t = ((a[k] >> j) ^ a[k + j]) & m
            a[k] = a[k] ^ (t << j)
            a[k + j] = a[k + j] ^ t
            k = (k + j + 1) & ~j
        j >>= 1
        m = m ^ (m << np.uint32(j)) if j else m
    return a


def planes_to_words(planes: jax.Array) -> jax.Array:
    """uint32[8,16,W] planes -> uint32[4,N] little-endian block words
    (word k of block n = bytes 4k..4k+3), N minor — via 4 butterfly
    transposes instead of the 32x int expansion."""
    w = planes.shape[-1]
    out_rows = []
    for k in range(4):
        # bit r of word k of a block = byte (4k + r//8), bit (r%8)
        rows = [planes[r % 8, 4 * k + r // 8] for r in range(32)]
        tr = _transpose32(rows)  # tr[j] = word k of blocks (32w+j)
        out_rows.append(jnp.stack(tr, axis=1).reshape(32 * w))
    return jnp.stack(out_rows)  # [4, N]


def words_to_planes(words: jax.Array) -> jax.Array:
    """uint32[4,N] block words -> uint32[8,16,W] planes (inverse)."""
    n = words.shape[-1]
    w = n // 32
    planes = [[None] * 16 for _ in range(8)]
    for k in range(4):
        rows = [words[k].reshape(w, 32)[:, j] for j in range(32)]
        tr = _transpose32(rows)  # tr[r] = plane of bit r of word k
        for r in range(32):
            planes[r % 8][4 * k + r // 8] = tr[r]
    return jnp.stack([jnp.stack(p) for p in planes])


def blocks_to_words(blocks: jax.Array) -> jax.Array:
    """uint8[N,16] -> uint32[4,N] little-endian words (one transpose)."""
    x = blocks.T.astype(jnp.uint32)  # [16, N]
    return jnp.stack([
        x[4 * k] | (x[4 * k + 1] << 8) | (x[4 * k + 2] << 16)
        | (x[4 * k + 3] << 24)
        for k in range(4)
    ])


def words_to_blocks(words: jax.Array) -> jax.Array:
    """uint32[4,N] -> uint8[N,16]."""
    rows = []
    for k in range(4):
        for j in range(4):
            rows.append((words[k] >> (8 * j)).astype(jnp.uint8))
    return jnp.stack(rows).T  # [N, 16]


def key_planes(round_keys: np.ndarray) -> np.ndarray:
    """uint8[R+1,16] -> uint32[R+1,8,16] of 0/0xFFFFFFFF broadcast planes."""
    rk = np.asarray(round_keys, np.uint8)
    bits = (rk[:, :, None] >> np.arange(8)) & 1  # [R+1,16,8]
    return (bits.transpose(0, 2, 1).astype(np.uint32) * 0xFFFFFFFF)


def _roll_rows(planes, k):
    """Rotate byte positions within each column: p=4c+r -> 4c+(r+k)%4.
    planes: [..., 16, W] indexed by byte position on axis -2."""
    perm = np.array([4 * (j // 4) + (j % 4 + k) % 4 for j in range(16)])
    return planes[..., perm, :]


def _mix_columns_planes(p):
    a1 = [_roll_rows(x, 1) for x in p]
    a2 = [_roll_rows(x, 2) for x in p]
    a3 = [_roll_rows(x, 3) for x in p]
    xt = _xtime_planes(p)
    xt1 = _xtime_planes(a1)
    return [xt[b] ^ xt1[b] ^ a1[b] ^ a2[b] ^ a3[b] for b in range(8)]


def _inv_mix_columns_planes(p):
    x2 = _xtime_planes(p)
    x4 = _xtime_planes(x2)
    x8 = _xtime_planes(x4)
    m9 = [x8[b] ^ p[b] for b in range(8)]
    mb = [x8[b] ^ x2[b] ^ p[b] for b in range(8)]
    md = [x8[b] ^ x4[b] ^ p[b] for b in range(8)]
    me = [x8[b] ^ x4[b] ^ x2[b] for b in range(8)]
    return [me[b]
            ^ _roll_rows(mb[b], 1)
            ^ _roll_rows(md[b], 2)
            ^ _roll_rows(m9[b], 3) for b in range(8)]


def encrypt_planes(kp: jax.Array, planes: jax.Array) -> jax.Array:
    """Bitsliced encryption: kp uint32[R+1,8,16], planes uint32[8,16,W]."""
    rounds = kp.shape[0] - 1
    p = [planes[b] ^ kp[0, b][:, None] for b in range(8)]
    for r in range(1, rounds + 1):
        p = sbox_planes(p, True)
        p = [x[SHIFT_PERM, :] for x in p]
        if r != rounds:
            p = _mix_columns_planes(p)
        p = [p[b] ^ kp[r, b][:, None] for b in range(8)]
    return jnp.stack(p)


def decrypt_planes(kp: jax.Array, planes: jax.Array) -> jax.Array:
    rounds = kp.shape[0] - 1
    p = [planes[b] ^ kp[rounds, b][:, None] for b in range(8)]
    for r in range(rounds - 1, -1, -1):
        p = [x[INV_SHIFT_PERM, :] for x in p]
        p = sbox_planes(p, False)
        p = [x ^ kp[r, b][:, None] for b, x in enumerate(p)]
        if r != 0:
            p = _inv_mix_columns_planes(p)
    return jnp.stack(p)


def encrypt_blocks_bitsliced(kp: jax.Array, blocks: jax.Array) -> jax.Array:
    """Drop-in fast path for core.cipher.encrypt_blocks (N % 32 == 0)."""
    n = blocks.shape[0]
    return unpack_planes(encrypt_planes(kp, pack_planes(blocks)), n)


def decrypt_blocks_bitsliced(kp: jax.Array, blocks: jax.Array) -> jax.Array:
    n = blocks.shape[0]
    return unpack_planes(decrypt_planes(kp, pack_planes(blocks)), n)
