"""Multi-key fused GCM: B messages under B different keys, ONE dispatch.

The serving workload the single-key seal cannot cover: per-connection /
per-tenant keys.  The v1 batch engine (modes/bulk.py, kept as the
general/ragged fallback) pays the gather-cipher and a scan GHASH; this
engine is TPU-first end to end:

  * cipher: ops/pallas_multikey.ctrw_fused_multikey — the grid maps
    steps per MESSAGE and the key-plane block follows the message index;
  * per-message window layout (Wm words each, all in one stream):
    position 0 encrypts the all-zero block -> H = E_K(0) rides along;
    position 1 encrypts J0 -> E_K(J0) rides along; AAD then data sit
    RIGHT-ALIGNED at the window end, so the GHASH fold needs no
    adjust/compensation matrices at all (leading zeros are free);
    counters are an input stream, so the two regions simply use
    different affine maps of the position;
  * GHASH: per-key M_H probed ON DEVICE from the in-stream H (batched
    bit-serial oracle), per-key two-level power tables built by batched
    GF(2) matmul scans, folds as batched int8 MXU contractions, tag
    finalize batched.  No per-key host probing, no lru pressure
    (VERDICT r1 weak #6);
  * message lengths are runtime data (the `front` vector): one compiled
    program serves any length mix with the same (B, Wm).

Parity: AES_GCM_encrypt/decrypt semantics per message
(micro_aes.c:1164-1211), verify-before-release on open.  Fast-path
constraints (12-byte nonces, whole-block messages, uniform key size);
anything else falls back to modes/bulk.py.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.gf128 import _bits_np, bits_to_blocks, blocks_to_bits, mul_gf128
from ..ops.ghash_bulk import _combine_logdepth
from ..ops.pallas_multikey import ctrw_fused_multikey_auto
from ..utils.bytesio import BLOCK, verify_tag

# unit bit-vectors as blocks (host constant, embedded at lowering)
_UNIT_BLOCKS = np.packbits(
    np.eye(128, dtype=np.uint8).reshape(128, 16, 8),
    axis=-1, bitorder="big").reshape(128, 16)


def _unit_blocks():
    return jnp.asarray(_UNIT_BLOCKS)


def _bswap32(x):
    return ((x << 24) | ((x & 0xFF00) << 8) | ((x >> 8) & 0xFF00)
            | (x >> 24))


def _mm_gf2_batch(a, c):
    """Batched GF(2) matmul: int8 [B,128,128] x [B,128,128]."""
    acc = jax.lax.dot_general(
        a, c, dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.int32)
    return (acc & 1).astype(jnp.int8)


def _mh_batch(h_blocks):
    """Per-key M_H int8[B,128,128] probed from H on device: column j is
    mulGF128(H, e_j) through the vmapped bit-serial oracle."""
    unit = _unit_blocks()
    cols = jax.vmap(lambda hb: mul_gf128(hb, unit))(h_blocks)  # [B,128,16]
    return jnp.transpose(blocks_to_bits(cols), (0, 2, 1)).astype(jnp.int8)


def _tables_batch(m):
    """Per-key two-level GHASH tables on device:
    w1 [B, 4096, 128] (row block j = (M^(32-j))^T),
    w2 [B, 4096, 128] (row block j = (M^(32*(31-j)))^T),
    m_outer [B,128,128] = M^1024."""
    def step(cur, _):
        nxt = _mm_gf2_batch(m, cur)
        return nxt, cur

    _, pows = jax.lax.scan(step, m, None, length=32)  # pows[k] = M^(k+1)
    w1 = jnp.transpose(jnp.flip(pows, 0), (1, 0, 3, 2)).reshape(
        m.shape[0], 32 * 128, 128)
    m32 = pows[31]

    eye = jnp.broadcast_to(
        jnp.eye(128, dtype=jnp.int8), m.shape)

    def step2(cur, _):
        nxt = _mm_gf2_batch(m32, cur)
        return nxt, cur

    _, pows2 = jax.lax.scan(step2, eye, None, length=32)  # M32^k, k=0..31
    w2 = jnp.transpose(jnp.flip(pows2, 0), (1, 0, 3, 2)).reshape(
        m.shape[0], 32 * 128, 128)
    m_outer = _mm_gf2_batch(m32, pows2[31])
    return w1, w2, m_outer


def _stream_bits(words):
    """u32[N,128] stream -> int8[N*32, 128] per-block bit rows."""
    blocks = jax.lax.bitcast_convert_type(
        words.reshape(-1, 4), jnp.uint8).reshape(-1, BLOCK)
    return blocks_to_bits(blocks).astype(jnp.int8)


def _seal_body(kp_stack, j0w, front, mask, sel, len_bits, ptw,
               b: int, wm: int, tables=None):
    """Multi-key GCM core body — the MATRIX-GHASH engine.  Correct and
    fully tested, but its per-key bit-matrix contraction is MXU
    weight-load-bound: tag-live it seals at ~0.5-1 GB/s on the serving
    shapes (BASELINE.md round-5 correction).  The public batch API
    routes through the segmented value-chain engine below on TPU; this
    body remains as the dp-sharded engine family exercised by
    parallel/batch.py + dryrun_multichip and as the gate-off fallback.

    j0w u32[B,4] (J0 LE words),
    front i32[B] (data start position in each window), mask/sel
    int8[B*32*Wm] (fold-validity / input-vs-output bit source per
    position), len_bits int8[B,128], ptw u32[B*Wm,128].
    tables=None derives the per-key GHASH tables in-dispatch (cold
    tenants); a (m, w1, w2, m_outer) tuple skips the 64-step batched
    GF(2) matmul scans entirely (warm tenants — VERDICT r4 item 3: at
    16 KB/tenant the table build was ~3x of the marginal cost).
    Returns (out stream, tags u8[B,16])."""
    rows = b * wm
    lanes = jax.lax.broadcasted_iota(jnp.uint32, (rows, 128), 1)
    jj, k = lanes // 4, lanes % 4
    p = ((jax.lax.broadcasted_iota(jnp.uint32, (rows, 128), 0)
          % jnp.uint32(wm)) * 32 + jj)
    # per-message J0 words / fronts broadcast without gathers (XLA TPU
    # gathers at [rows,128] cost more than the cipher itself)
    j0full = jnp.tile(
        jnp.broadcast_to(j0w[:, None, :], (b, wm, 4)).reshape(rows, 4),
        (1, 32))                                     # lane l -> word l%4
    frontv = jnp.broadcast_to(
        front.astype(jnp.uint32)[:, None], (b, wm)).reshape(rows, 1)
    ctr = p - frontv + 2                             # data-region counter
    w3 = _bswap32(jnp.where(p < 2, p, ctr))
    w012 = jnp.where(p < 1, jnp.uint32(0), j0full)
    ctrw = jnp.where(k == 3, w3, w012)

    outw = ctrw_fused_multikey_auto(kp_stack, ctrw, ptw, b)

    win = outw.reshape(b, wm, 128)
    h_blocks = jax.lax.bitcast_convert_type(
        win[:, 0, 0:4].reshape(b, 4), jnp.uint8).reshape(b, BLOCK)
    ej0_bits = blocks_to_bits(jax.lax.bitcast_convert_type(
        win[:, 0, 4:8].reshape(b, 4), jnp.uint8).reshape(b, BLOCK))

    if tables is None:
        m = _mh_batch(h_blocks)
        w1, w2, m_outer = _tables_batch(m)
    else:
        m, w1, w2, m_outer = tables

    # word-level select/mask BEFORE the bit expansion: sel/mask are
    # per-block, so selecting u32 stream words (lane l = word l%4 of
    # block 32*row + l//4) needs only a x4 lane repeat — this halves the
    # GHASH-side HBM traffic vs expanding BOTH streams to bit rows and
    # blending the 8x-larger int8 matrices (round-4 rework)
    selr = jnp.repeat(sel.reshape(rows, 32), 4, axis=1)
    maskr = jnp.repeat(mask.reshape(rows, 32), 4, axis=1)
    wsel = jnp.where(selr != 0, ptw, outw)
    wsel = jnp.where(maskr != 0, wsel, jnp.uint32(0))
    bits = _stream_bits(wsel)

    s1 = jax.lax.dot_general(
        bits.reshape(b, wm, 32 * 128), w1,
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.int32) & 1       # [B, Wm, 128]
    pad = (-wm) % 32
    s1 = jnp.pad(s1.astype(jnp.int8), ((0, 0), (pad, 0), (0, 0)))
    t2 = (wm + pad) // 32
    s2 = jax.lax.dot_general(
        s1.reshape(b, t2, 32 * 128), w2,
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.int32) & 1       # [B, T2, 128]
    acc = jax.vmap(_combine_logdepth)(s2.astype(jnp.int8), m_outer)

    x = (acc.astype(jnp.int8) ^ len_bits)
    g = jax.lax.dot_general(
        x, m, dimension_numbers=(((1,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.int32) & 1
    tags = bits_to_blocks((ej0_bits ^ g.astype(jnp.uint8)))
    return outw, tags


@functools.partial(jax.jit, static_argnames=("b", "wm"))
def _seal_batch_core(kp_stack, j0w, front, mask, sel, len_bits, ptw,
                     b: int, wm: int):
    """Cold-tenant dispatch: tables derived in-line (single-use keys)."""
    return _seal_body(kp_stack, j0w, front, mask, sel, len_bits, ptw,
                      b, wm)


@functools.partial(jax.jit, static_argnames=("b", "wm"))
def _seal_batch_core_warm(kp_stack, j0w, front, mask, sel, len_bits, ptw,
                          tables, b: int, wm: int):
    """Warm-tenant dispatch: per-key GHASH tables passed in (memoized by
    _tables_cached across calls with the same key set)."""
    return _seal_body(kp_stack, j0w, front, mask, sel, len_bits, ptw,
                      b, wm, tables=tables)


@jax.jit
def _derive_tables(h_blocks):
    """Per-key GHASH machinery from H = E_K(0): probed M_H + two-level
    power tables, one batched device dispatch."""
    m = _mh_batch(h_blocks)
    w1, w2, m_outer = _tables_batch(m)
    return m, w1, w2, m_outer


from ..utils.keycache import key_cache  # noqa: E402


@key_cache(maxsize=2)
def _tables_cached(keys_blob: bytes, klen: int):
    """Memoized per-KEY-SET GHASH tables (VERDICT r4 item 3): serving
    tenants recur across batches, and the 64-step batched GF(2) matmul
    table build was ~3x the marginal cost at 16 KB/tenant.  Keyed on the
    concatenated key bytes; device-resident (w1/w2 are ~0.5 MB per key,
    so maxsize stays tiny); purged by purge_key_caches()."""
    b = len(keys_blob) // klen
    keys = [keys_blob[i * klen:(i + 1) * klen] for i in range(b)]
    from .bulk import _enc_vmap, stack_round_keys

    rks = jnp.asarray(stack_round_keys(keys))
    h = _enc_vmap(rks, jnp.zeros((b, 1, BLOCK), jnp.uint8))[:, 0]
    return _derive_tables(h)


def _fast_path_ok(keys, nonces, pts) -> bool:
    klens = {len(k) for k in keys}
    return (len(klens) == 1
            and all(len(n) == 12 for n in nonces)
            and all(len(p) % BLOCK == 0 for p in pts))


# ---------------------------------------------------------------------------
# Segmented value-chain engine (round-5 continuation) — the table-free
# multi-key GCM redesign.
#
# The matrix engine below (_seal_body) is structurally wrong for serving
# tenants: its per-key GF(2) bit-matrix tables are ~1 MB/key and the
# batched [wm, 4096] x [4096, 128] MXU contraction is weight-load-bound.
# Measured tag-live truth on the v5e (see BASELINE.md round-5
# correction): 1024 x 16 KB seals at ~0.5 GB/s, 64 x 256 KB at ~1.0 —
# while the earlier committed rows, whose bench steps discarded the tag
# output, measured only the cipher side (XLA dead-code-eliminated the
# whole GHASH fold: 11.8 / 30.6 GB/s).
#
# The chain engine folds GHASH in the VALUE domain fused with the
# counter cipher (ops/pallas_chain.gcm_chain_fused: G <- (G ^ C)*H as
# 128 masked xors against a 2 KB/key halving table).  The kernel's lane
# parallelism wants >= 4096 message lanes, so large messages are SPLIT
# into S segments of L blocks processed as independent virtual lanes,
# each message RIGHT-ALIGNED in its S*L span (leading zeros fold for
# free: zero source into a zero carry), and the per-segment folds are
# recombined with powers of H^L:
#
#     G = H^n * init  ^  sum_s  H^(L*(S-1-s)) * G_s
#
# (init = the AAD fold, n = ct blocks; then the standard length-block
# finalize G = (G ^ len)*H, tag = E(J0) ^ G, micro_aes.c:1176-1178.)
# ---------------------------------------------------------------------------

_CHAIN_LANES = 4096  # target virtual-lane count (= 128 lane columns)


def _chain_gate() -> bool:
    """MICRO_AES_GCM_CHAIN=0/1 overrides the backend gate (CPU
    differential tests drive the segmented engine through the
    interpret-mode kernel)."""
    import os

    v = os.environ.get("MICRO_AES_GCM_CHAIN")
    if v is not None:
        return v == "1"
    return jax.default_backend() == "tpu"


def _chain_shape(b: int, nb: int):
    """(bp, S, L): segments per message and padded batch so the virtual
    lane count bp*S is 32-aligned and >= min(_CHAIN_LANES, b*nb)."""
    s = max(1, min(-(-_CHAIN_LANES // b), nb))
    bp = b
    while (bp * s) % 32:
        bp += 1
    return bp, s, -(-nb // s)


def _ctr56_add(base: np.ndarray, delta: int) -> np.ndarray:
    """base uint8[16] + delta on the 56-bit BE counter window (bytes
    9..15 — the dual-endian incBlock contract, micro_aes.c:421-428,
    exactly what the kernel's _aead_ctr_rows adds over)."""
    out = base.copy()
    v = (int.from_bytes(base[9:16].tobytes(), "big") + delta) % (1 << 56)
    out[9:16] = np.frombuffer(v.to_bytes(7, "big"), np.uint8)
    return out


def _pack_lane_bits(valid: np.ndarray) -> np.ndarray:
    """bool[L, lanes] -> u32[L, lanes//32] per-step lane bitmasks."""
    l, lanes = valid.shape
    return (valid.reshape(l, lanes // 32, 32).astype(np.uint32)
            << np.arange(32, dtype=np.uint32)[None, None, :]).sum(
                axis=-1, dtype=np.uint32)


def _halvings_scan(x):
    """uint8[..., 16] -> uint8[128, ..., 16]: halve_be^i(x) for
    i = 0..127 — the fused-multiply tables of the value-domain GHASH
    (mul(v, x) = XOR_i bit_i(v) * halve^i(x))."""
    from ..ops.gf128 import halve_be

    def step(y, _):
        return halve_be(y), y

    _, tab = jax.lax.scan(step, x, None, length=128)
    return tab


def _mul_tab(x, tab):
    """x * V as ONE fused XLA op (no 128-step serial loop): x
    uint8[..., 16], tab uint8[128, ..., 16] = halvings of V.  The
    serial mul_gf128 fori costs ~0.15 ms per call in dispatch latency
    alone on the remote chip — fatal when a combine needs dozens."""
    from ..ops.gf128 import blocks_to_bits

    bits = jnp.moveaxis(blocks_to_bits(x), -1, 0)      # [128, ...]
    masked = jnp.where(bits[..., None] == 1, tab, jnp.uint8(0))
    return jax.lax.reduce(masked, np.uint8(0),
                          lambda a, b: a ^ b, (0,))


@functools.partial(jax.jit, static_argnames=("s", "l", "decrypt"))
def _chain_core(kpw, htab, c0v, blocks_v, srcm, initm, initv, nblk, init,
                lenb, ej0, ptabs, htab_h, s: int, l: int, decrypt: bool):
    """One fused kernel pass over the virtual lanes + the fully
    parallel segment combine (one table-mul over all segments, one for
    the length finalize).  Returns (out [bp*s, l, 16], tags [bp, 16])."""
    from ..ops.pallas_chain import gcm_chain_fused_raw

    bv = blocks_v.shape[0]
    bp = bv // s
    wv = bv // 32
    ones = jnp.full((l, wv), 0xFFFFFFFF, jnp.uint32)
    zerosm = jnp.zeros((l, wv), jnp.uint32)
    tailv = jnp.full((bv, BLOCK), 0xFF, jnp.uint8)
    out, gseg = gcm_chain_fused_raw(
        kpw, htab, c0v, jnp.zeros((bv, BLOCK), jnp.uint8), blocks_v,
        ones, zerosm, srcm, initm, tailv, initv, decrypt=decrypt)
    gseg = gseg.reshape(bp, s, BLOCK)
    # G = XOR_s  gseg[:, s] * H^(L*(S-1-s)) — all segments at once:
    # bits [s, 128, bp] against ptabs [s, 128, bp, 16]
    from ..ops.gf128 import blocks_to_bits

    bits = jnp.transpose(blocks_to_bits(gseg), (1, 2, 0))  # [s, 128, bp]
    masked = jnp.where(bits[..., None] == 1, ptabs, jnp.uint8(0))
    g = jax.lax.reduce(masked, np.uint8(0), lambda a, b: a ^ b, (0, 1))
    # empty messages never get an in-stream injection; their AAD fold
    # enters algebraically through the length multiply instead
    g = g ^ jnp.where((nblk == 0)[:, None], init, jnp.uint8(0))
    g = _mul_tab(g ^ lenb, htab_h)
    return out, ej0 ^ g


from ..utils.keycache import key_cache as _kc  # noqa: E402


@_kc(maxsize=2)
def _chain_cached(keys_blob: bytes, klen: int, s: int, l: int):
    """Memoized per-key-set chain-engine machinery for warm serving
    tenants (purged by purge_key_caches()): the segment-repeated key
    planes, the kernel halving table (2 KB/key), the combine power
    tables (halvings of H^(L*k)), and the finalize table — ~(2 + 2*s)
    KB per key, where the old matrix-table cache held ~1 MB/key."""
    from ..ops.gf128 import mul_gf128
    from ..ops.mac import _kpw_cached
    from ..ops.pallas_chain import ghash_halving_table
    from .bulk import _enc_vmap, stack_round_keys

    b = len(keys_blob) // klen
    keys = [keys_blob[i * klen:(i + 1) * klen] for i in range(b)]
    rks = stack_round_keys(keys)
    h_j = _enc_vmap(jnp.asarray(rks),
                    jnp.zeros((b, 1, BLOCK), jnp.uint8))[:, 0]
    h = np.asarray(h_j)
    rksv = np.repeat(rks, s, 0)
    kpw = jnp.asarray(_kpw_cached(rksv.tobytes(), rksv.shape[0],
                                  rksv.shape[1]))
    htab = ghash_halving_table(jnp.asarray(np.repeat(h, s, 0)))
    # H^L by square-and-multiply (static exponent), then the s combine
    # powers H^(L*(S-1-k)) — build-time only, cached
    one = jnp.zeros_like(h_j).at[:, 0].set(jnp.uint8(0x80))
    hl = one
    for bit in bin(l)[2:]:
        hl = mul_gf128(hl, hl)
        if bit == "1":
            hl = mul_gf128(hl, h_j)

    def pstep(carry, _):
        return mul_gf128(hl, carry), carry

    _, pows = jax.lax.scan(pstep, one, None, length=s)   # [s, b, 16]
    ptabs = jnp.transpose(_halvings_scan(jnp.flip(pows, 0)),
                          (1, 0, 2, 3))                  # [s, 128, b, 16]
    htab_h = _halvings_scan(h_j)                         # [128, b, 16]
    return kpw, htab, h, rks, ptabs, htab_h


def _chain_run(keys, nonces, aads, datas, tag_len: int, decrypt: bool):
    """Shared seal/open driver for the segmented chain engine: host prep
    (right-aligned virtual streams, 56-bit counter bases, masks, length
    blocks), the fused kernel + combine, and the per-message slicing."""
    from ..ops.mac import ghash_fold_batch
    from .bulk import _enc1_batch

    b = len(keys)
    ns = [len(d) // BLOCK for d in datas]
    nb = max(max(ns), 1)
    bp, s, l = _chain_shape(b, nb)
    span = s * l
    klen = len(keys[0])
    keys_p = keys + [keys[-1]] * (bp - b)
    kpw, htab, h, rks, ptabs, htab_h = _chain_cached(
        b"".join(keys_p), klen, s, l)

    j0 = np.zeros((bp, BLOCK), np.uint8)
    for i, n in enumerate(nonces):
        j0[i, :12] = np.frombuffer(bytes(n), np.uint8)
    j0[:, 15] = 1
    ej0 = _enc1_batch(rks, j0)

    buf = np.zeros((bp, span, BLOCK), np.uint8)
    lenb = np.zeros((bp, BLOCK), np.uint8)
    c0v = np.zeros((bp, s, BLOCK), np.uint8)
    valid = np.zeros((bp * s, l), bool)
    inj = np.zeros((bp * s, l), bool)
    # injection lane of each message; default to the message's own
    # first lane so empty/padding rows scatter harmlessly into a lane
    # whose initm bits are never set (a shared default like 0 would
    # overwrite a real message's injection value)
    lane0 = np.arange(bp, dtype=np.int64) * s
    namax = max((len(a) for a in aads), default=0)
    aadb = np.zeros((bp, max(-(-namax // BLOCK), 1), BLOCK), np.uint8)
    nva = np.zeros(bp, np.int32)
    for i in range(b):
        n = ns[i]
        d = np.frombuffer(bytes(datas[i]), np.uint8)
        if n:
            buf[i, span - n:] = d.reshape(n, BLOCK)
        a = bytes(aads[i])
        if a:
            aadb[i].reshape(-1)[: len(a)] = np.frombuffer(a, np.uint8)
            nva[i] = -(-len(a) // BLOCK)
        lenb[i, :8] = np.frombuffer(
            (len(a) * 8).to_bytes(8, "big"), np.uint8)
        lenb[i, 8:] = np.frombuffer(
            (n * BLOCK * 8).to_bytes(8, "big"), np.uint8)
        base = j0[i].copy()
        base[15] = 2
        for sg in range(s):
            c0v[i, sg] = _ctr56_add(base, sg * l - (span - n))
        valid[i * s:(i + 1) * s] = (
            np.arange(span).reshape(s, l) >= span - n)
        if n:  # inject the AAD fold at the first data position
            p0 = span - n
            lane0[i] = i * s + p0 // l
            inj[lane0[i], p0 % l] = True
    srcm = _pack_lane_bits(valid.T)
    initm = _pack_lane_bits(inj.T)

    h_j = jnp.asarray(h)
    if namax:
        init = ghash_fold_batch(h_j, jnp.zeros((bp, BLOCK), jnp.uint8),
                                jnp.asarray(aadb), jnp.asarray(nva))
    else:
        init = jnp.zeros((bp, BLOCK), jnp.uint8)
    nblk = jnp.asarray(np.array(ns + [0] * (bp - b), np.int32))
    initv = (jnp.zeros((bp * s, BLOCK), jnp.uint8)
             .at[jnp.asarray(lane0)]
             .set(jnp.where((nblk > 0)[:, None], init, jnp.uint8(0))))
    out, tags = _chain_core(
        kpw, htab, jnp.asarray(c0v.reshape(bp * s, BLOCK)),
        jnp.asarray(buf.reshape(bp * s, l, BLOCK)), jnp.asarray(srcm),
        jnp.asarray(initm), initv, nblk, init, jnp.asarray(lenb),
        jnp.asarray(ej0), ptabs, htab_h, s, l, decrypt)
    out_np = np.asarray(out).reshape(bp, span * BLOCK)
    tags_np = np.asarray(tags)
    return out_np, tags_np, ns, span


def gcm_seal_batch_chain(keys, nonces, aads, pts,
                         tag_len: int = 16) -> list[bytes]:
    """Multi-key GCM seal through the segmented value-chain engine."""
    out, tags, ns, span = _chain_run(keys, nonces, aads, pts, tag_len,
                                     decrypt=False)
    return [out[i, BLOCK * (span - n):].tobytes()
            + tags[i][:tag_len].tobytes()
            for i, n in enumerate(ns)]


def gcm_open_batch_chain(keys, nonces, aads, cts, tags_in,
                         tag_len: int = 16) -> list[bytes | None]:
    """Multi-key GCM open through the segmented value-chain engine:
    verify-BEFORE-release per message (micro_aes.c:1204-1209)."""
    out, tags, ns, span = _chain_run(keys, nonces, aads, cts, tag_len,
                                     decrypt=True)
    res: list[bytes | None] = []
    for i, n in enumerate(ns):
        if not verify_tag(tags[i][:tag_len], tags_in[i]):
            res.append(None)
        else:
            res.append(out[i, BLOCK * (span - n):].tobytes())
    return res


def _prep(keys, nonces, aads, datas):
    """Common host prep: window size, streams, masks, fronts, lengths."""
    b = len(keys)
    ns = [len(d) // BLOCK for d in datas]
    nas = [-(-len(a) // BLOCK) for a in aads]
    from ..ops.pallas_multikey import mk_window_words

    need = max(n + na + 2 for n, na in zip(ns, nas))
    wm = mk_window_words(need)  # the kernel's window/tile contract
    span = 32 * wm

    buf = np.zeros((b, span * 4), np.uint32)
    mask = np.zeros((b, span), np.int8)
    sel = np.zeros((b, span), np.int8)
    len_bits = np.zeros((b, 128), np.uint8)
    front = np.zeros(b, np.int32)
    j0w = np.zeros((b, 4), np.uint32)
    for i, (a, d) in enumerate(zip(aads, datas)):
        n, na = ns[i], nas[i]
        f = span - n
        front[i] = f
        ab = np.zeros(na * BLOCK, np.uint8)
        ab[: len(a)] = np.frombuffer(bytes(a), np.uint8)
        buf[i, 4 * (f - na): 4 * f] = ab.view(np.uint32)
        buf[i, 4 * f: 4 * (f + n)] = np.frombuffer(bytes(d), np.uint32)
        mask[i, f - na:] = 1
        sel[i, f - na: f] = 1  # AAD bits always come from the input side
        lb = np.zeros(BLOCK, np.uint8)
        lb[:8] = np.frombuffer((len(a) * 8).to_bytes(8, "big"), np.uint8)
        lb[8:] = np.frombuffer((n * BLOCK * 8).to_bytes(8, "big"), np.uint8)
        len_bits[i] = _bits_np(lb)
        j0 = np.zeros(BLOCK, np.uint8)
        j0[:12] = np.frombuffer(bytes(nonces[i]), np.uint8)
        j0[15] = 1
        j0w[i] = j0.view(np.uint32)
    from ..core.keyschedule import expand_keys_batch

    # one vectorized expansion for the whole key batch (per-key Python
    # here dominated the wall time at serving batch sizes), then the
    # 0/0xFFFFFFFF broadcast planes expand ON DEVICE from the round-key
    # stack — 32x less upload than shipping the planes.  Layout matches
    # mk_key_stack over per-key key_planes.
    rkj = jnp.asarray(expand_keys_batch(
        np.frombuffer(b"".join(keys), np.uint8).reshape(b, len(keys[0]))))
    kbits = (rkj[..., None] >> jnp.arange(8, dtype=jnp.uint8)) & 1
    kp_stack = (kbits.transpose(0, 1, 3, 2).astype(jnp.uint32)
                * jnp.uint32(0xFFFFFFFF)).reshape(-1, 1)
    return (b, wm, span, ns, front, kp_stack, jnp.asarray(j0w),
            jnp.asarray(front), jnp.asarray(mask.reshape(-1)),
            jnp.asarray(sel.reshape(-1)),
            jnp.asarray(len_bits.astype(np.int8)),
            jnp.asarray(buf.reshape(b * wm, 128)))


def gcm_seal_batch(keys, nonces, aads, pts, tag_len: int = 16,
                   reuse_tables: bool = False) -> list[bytes]:
    """AES-GCM over B messages under B independent keys in ONE device
    dispatch (12-byte nonces, whole-block messages; other shapes fall
    back to the general engine).  Returns [ct || tag] per message.

    On TPU this routes through the segmented value-chain engine
    (gcm_seal_batch_chain), whose per-key-set machinery (key planes +
    2 KB/key halving tables) is memoized unconditionally in a tiny
    cache (_chain_cached, maxsize 2, purged by purge_key_caches()) —
    cheap enough that single-use corpora just evict through it.
    reuse_tables applies to the legacy matrix-engine path only: it
    memoizes that engine's ~1 MB/key GHASH tables across calls with the
    SAME key set; leave False there for single-use key batches."""
    keys = [bytes(k) for k in keys]
    if not keys:
        return []
    nonces = [bytes(n) for n in nonces]
    aads = [bytes(a) for a in aads]
    pts = [bytes(p) for p in pts]
    if not _fast_path_ok(keys, nonces, pts):
        from .bulk import gcm_encrypt_batch

        return gcm_encrypt_batch(keys, nonces, aads, pts, tag_len)
    if _chain_gate():
        return gcm_seal_batch_chain(keys, nonces, aads, pts, tag_len)
    (b, wm, _, ns, front_np, kp_stack, j0w, front, mask, sel,
     len_bits, ptw) = _prep(keys, nonces, aads, pts)
    if reuse_tables:
        tables = _tables_cached(b"".join(keys), len(keys[0]))
        outw, tags = _seal_batch_core_warm(kp_stack, j0w, front, mask, sel,
                                           len_bits, ptw, tables, b, wm)
    else:
        outw, tags = _seal_batch_core(kp_stack, j0w, front, mask, sel,
                                      len_bits, ptw, b, wm)
    out = np.asarray(outw).reshape(b, -1)
    tags = np.asarray(tags)
    res = []
    for i, n in enumerate(ns):
        f = int(front_np[i])
        ct = out[i, 4 * f: 4 * (f + n)].tobytes()
        res.append(ct + bytes(tags[i][:tag_len]))
    return res


def gcm_open_batch(keys, nonces, aads, ct_tags, tag_len: int = 16,
                   reuse_tables: bool = False) -> list[bytes | None]:
    """Batched multi-key GCM open, verify-BEFORE-release per message
    (micro_aes.c:1204-1209): failed messages come back as None.
    reuse_tables as in gcm_seal_batch."""
    keys = [bytes(k) for k in keys]
    if not keys:
        return []
    nonces = [bytes(n) for n in nonces]
    aads = [bytes(a) for a in aads]
    data = [bytes(c) for c in ct_tags]
    cts = [d[: len(d) - tag_len] for d in data]
    tags = [d[len(d) - tag_len:] for d in data]
    if not _fast_path_ok(keys, nonces, cts):
        from .bulk import gcm_decrypt_batch

        return gcm_decrypt_batch(keys, nonces, aads, data, tag_len)
    if _chain_gate():
        return gcm_open_batch_chain(keys, nonces, aads, cts, tags, tag_len)
    (b, wm, _, ns, front_np, kp_stack, j0w, front, mask, sel,
     len_bits, ptw) = _prep(keys, nonces, aads, cts)
    # open: the expected-tag fold reads INPUT bits everywhere
    if reuse_tables:
        tables = _tables_cached(b"".join(keys), len(keys[0]))
        outw, expects = _seal_batch_core_warm(kp_stack, j0w, front, mask,
                                              mask, len_bits, ptw, tables,
                                              b, wm)
    else:
        outw, expects = _seal_batch_core(kp_stack, j0w, front, mask, mask,
                                         len_bits, ptw, b, wm)
    out = np.asarray(outw).reshape(b, -1)
    expects = np.asarray(expects)
    res: list[bytes | None] = []
    for i, n in enumerate(ns):
        if not verify_tag(expects[i][:tag_len], tags[i]):
            res.append(None)
            continue
        f = int(front_np[i])
        res.append(out[i, 4 * f: 4 * (f + n)].tobytes())
    return res
