"""Syndrome-gated adaptive BCC decoding: algebraic inverse + Viterbi fallback.

At working SNR most packets arrive with ZERO hard-decision errors in the
coded stream, and when the received hard bits form a valid codeword the
ML (Viterbi) output is exactly that codeword's data — so the decode
reduces to *inverting the encoder*, a GF(2) linear map.  The punctured
802.11 BCC (K=7, g0=133o/g1=171o, all four rates) is non-catastrophic,
so a windowed FIR left inverse exists; here each 240-data-bit block is
recovered from a 3-block window of the (zero-filled) depunctured hard
bits by ONE precomputed GF(2) matrix — an MXU matmul, exact in a single
bf16 pass (0/1 inputs, f32 accumulation).  A re-encode syndrome then
counts hard errors per packet:

* syndrome == 0 everywhere  -> the algebraic inverse IS the Viterbi
  output (codeword case) — no trellis sweep at all;
* 0 < n_fail <= fallback    -> only failing rows are gathered into a
  small lane tile and run through the Pallas Viterbi;
* n_fail > fallback         -> the whole batch falls back to the full
  Pallas Viterbi sweep (exact at any SNR).

The branches are ``lax.cond`` at batch scope — one compiled program
serves every SNR, paying the ~25 ms ACS+traceback cost only when the
channel actually demands it.  The reference decoder
(/root/reference/lib/decode_impl.cc, 93-250 ticks per LLR item) runs the
full Viterbi unconditionally; this adaptive gate is where the TPU build
spends an order of magnitude less on the benchmark's operating point.

Matrix derivation (host, cached per code rate): Gaussian elimination
over GF(2) on a 5-block encoding window — the solution's support is
restricted to the 3 center coded blocks, so the same stencil is exact
for every block position including the first (zero left padding = zero
preceding data = zero encoder state).  The trellis END is handled by a
dedicated per-(rate, T) end-window matrix: the last bits of a stream
need *later* coded bits than exist, so they are re-solved from the
exact finite tail system (prototype-validated against gold
bcc_encode_punct for all rates and lengths).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..spec import tables as T
from . import viterbi as VXLA
from .viterbi_pallas import viterbi_decode_pallas

#: data bits per interior block — divisible by every puncture period's
#: data count (1, 2, 3, 5) so one stencil matrix serves all block offsets
KB = 240

#: default fallback lane-tile capacity (rows re-decoded by the Pallas
#: Viterbi when their syndrome is nonzero); a 128-lane tile is the
#: smallest the kernel supports and covers sync outliers at working SNR
FALLBACK_B = 128


def _enc_matrix(nd: int) -> np.ndarray:
    """(2*nd, nd) GF(2) encoding matrix (zero initial state)."""
    E = np.zeros((2 * nd, nd), np.uint8)
    for t in range(nd):
        for k in range(7):
            if t - k >= 0:
                E[2 * t, t - k] ^= T.G0_TAPS[k]
                E[2 * t + 1, t - k] ^= T.G1_TAPS[k]
    return E


def _keep_mask(cr: str, ncoded: int) -> np.ndarray:
    pat = T.PUNCTURE[cr]
    return np.tile(pat, -(-ncoded // len(pat)))[:ncoded].astype(bool)


def _gf2_solve(M: np.ndarray, Rhs: np.ndarray) -> np.ndarray | None:
    """Solve M X = Rhs over GF(2); returns X ((cols, k)) or None."""
    M = M.copy().astype(np.uint8)
    R = Rhs.copy().astype(np.uint8)
    r, c = M.shape
    piv_of_col = {}
    row = 0
    for col in range(c):
        sel = np.nonzero(M[row:, col])[0]
        if len(sel) == 0:
            continue
        p = row + sel[0]
        if p != row:
            M[[row, p]] = M[[p, row]]
            R[[row, p]] = R[[p, row]]
        hit = np.nonzero(M[:, col])[0]
        hit = hit[hit != row]
        M[hit] ^= M[row]
        R[hit] ^= R[row]
        piv_of_col[col] = row
        row += 1
        if row == r:
            break
    if R[~M.any(axis=1)].any():
        return None
    X = np.zeros((c, R.shape[1]), np.uint8)
    for col, pr in piv_of_col.items():
        X[col] = R[pr]
    return X


@functools.lru_cache(maxsize=None)
def _interior_matrix(cr: str) -> np.ndarray:
    """(3*2KB, KB) f32 stencil: data block i from depunctured coded
    blocks [i-1, i, i+1] (2KB pre-puncture bits each; punctured rows 0).

    Solved on a 5-block window with support restricted to the center 3
    coded blocks and zero required on every other data column, so the
    stencil is position-independent."""
    nd = 5 * KB
    Ep = _enc_matrix(nd)
    keep = _keep_mask(cr, 2 * nd)
    S2 = 2 * KB
    rows = np.arange(S2, 4 * S2)
    sub_keep = keep[rows]
    A = Ep[rows][sub_keep]                         # (kept, 5KB)
    tgt = np.zeros((5 * KB, KB), np.uint8)
    tgt[np.arange(2 * KB, 3 * KB), np.arange(KB)] = 1
    X = _gf2_solve(A.T, tgt)
    if X is None:                                  # pragma: no cover
        raise ValueError(f"no windowed inverse for rate {cr}")
    Xd = np.zeros((3 * S2, KB), np.float32)
    Xd[np.nonzero(sub_keep)[0]] = X
    return Xd


@functools.lru_cache(maxsize=None)
def _tail_matrix(cr: str, n_trellis: int):
    """((2*nd,) window width, (2*nd, KB2) f32): the LAST KB2 data bits
    from the last 2*nd depunctured coded bits of an n_trellis stream."""
    KB2 = min(2 * KB, n_trellis)
    nd = min(4 * KB, n_trellis)
    extra = min(6, n_trellis - nd)
    ndw = nd + extra
    E = _enc_matrix(n_trellis)[:, n_trellis - ndw:]
    keep = _keep_mask(cr, 2 * n_trellis)
    rows = np.arange(2 * (n_trellis - nd), 2 * n_trellis)
    sub_keep = keep[rows]
    A = E[rows][sub_keep]
    tgt = np.zeros((ndw, KB2), np.uint8)
    tgt[np.arange(ndw - KB2, ndw), np.arange(KB2)] = 1
    X = _gf2_solve(A.T, tgt)
    if X is None:                                  # pragma: no cover
        raise ValueError(f"no tail inverse for rate {cr} T={n_trellis}")
    Xd = np.zeros((2 * nd, KB2), np.float32)
    Xd[np.nonzero(sub_keep)[0]] = X
    return 2 * nd, Xd


def _hard_inverse(hard_flat: jax.Array, cr: str, n_trellis: int) -> jax.Array:
    """(B, 2T) depunctured hard bits (f32 0/1) -> (B, T) data bits f32."""
    B = hard_flat.shape[0]
    S2 = 2 * KB
    nblk = -(-n_trellis // KB)
    total = nblk * S2
    x = jnp.pad(hard_flat, ((0, 0), (S2, total + S2 - 2 * n_trellis)))

    def view(off):
        return jax.lax.slice_in_dim(x, off, off + total, axis=1).reshape(
            B, nblk, S2)

    w = jnp.concatenate([view(0), view(S2), view(2 * S2)], axis=-1)
    Xi = jnp.asarray(_interior_matrix(cr))
    d = jnp.einsum("bnw,wk->bnk", w, Xi,
                   preferred_element_type=jnp.float32) % 2
    d = d.reshape(B, -1)[:, :n_trellis]
    wt, Xt = _tail_matrix(cr, n_trellis)
    tail_win = hard_flat[:, 2 * n_trellis - wt:]
    dt = (tail_win @ jnp.asarray(Xt)) % 2
    return jnp.concatenate([d[:, : n_trellis - dt.shape[1]], dt], axis=1)


def _syndrome(d: jax.Array, hard_flat: jax.Array, cr: str,
              n_trellis: int) -> jax.Array:
    """Per-row count of kept coded positions where re-encode(d) != hard."""
    B = d.shape[0]
    h = jnp.pad(d, ((0, 0), (6, 0)))

    def tap(k):
        return jax.lax.slice_in_dim(h, 6 - k, 6 - k + n_trellis, axis=1)

    a = (tap(0) + tap(2) + tap(3) + tap(5) + tap(6)) % 2
    c = (tap(0) + tap(1) + tap(2) + tap(3) + tap(6)) % 2
    re = jnp.stack([a, c], axis=-1).reshape(B, 2 * n_trellis)
    keep = jnp.asarray(_keep_mask(cr, 2 * n_trellis).astype(np.float32))
    mism = jnp.abs(re - hard_flat) * keep[None, :]
    return jnp.sum(mism, axis=1).astype(jnp.int32)


def adaptive_decode(coded_llr: jax.Array, cr: str, n_trellis: int,
                    fallback: int = FALLBACK_B) -> jax.Array:
    """Depuncture + decode with the syndrome-gated fast path.

    coded_llr: (B, >=n_kept) punctured LLRs (positive = coded bit 1).
    Returns (B, n_trellis) uint8 — identical to the pure Viterbi path on
    every row whose decode matters: zero-syndrome rows are codewords
    (fast path IS the ML output); other rows run the real Viterbi.
    """
    B = coded_llr.shape[0]
    pairs = VXLA.depuncture(coded_llr, cr, n_trellis)      # (B, T, 2)
    flat = pairs.reshape(B, 2 * n_trellis)
    hard = (flat > 0).astype(jnp.float32)
    d = _hard_inverse(hard, cr, n_trellis)
    syn = _syndrome(d, hard, cr, n_trellis)
    need = syn > 0
    n_fail = jnp.sum(need.astype(jnp.int32))
    d8 = d.astype(jnp.uint8)

    def fast(_):
        return d8

    def tile(_):
        idx = jnp.nonzero(need, size=fallback, fill_value=B)[0]
        rows = jnp.minimum(idx, B - 1)
        bits = viterbi_decode_pallas(pairs[rows])          # (fb, T) uint8
        return d8.at[idx].set(bits, mode="drop")

    def full(_):
        return viterbi_decode_pallas(pairs)

    return jax.lax.cond(
        n_fail == 0, fast,
        lambda _: jax.lax.cond(n_fail <= fallback, tile, full, None), None)
