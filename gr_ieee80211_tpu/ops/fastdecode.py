"""Syndrome-gated adaptive BCC decoding: algebraic inverse + Viterbi fallback.

At working SNR most packets arrive with ZERO hard-decision errors in the
coded stream, and when the received hard bits form a valid codeword the
ML (Viterbi) output is exactly that codeword's data — so the decode
reduces to *inverting the encoder*, a GF(2) linear map.  The punctured
802.11 BCC (K=7, g0=133o/g1=171o, all four rates) is non-catastrophic
and keeps >= 1 coded bit per trellis step at every rate, so a CAUSAL
windowed FIR left inverse exists: each 240-data-bit block is recovered
from a 3-block window of the (zero-filled) depunctured hard bits by ONE
precomputed GF(2) matrix — an MXU matmul, exact in a single bf16 pass
(0/1 inputs, f32 accumulation).  Causality (asserted at matrix build:
data bit t uses depunctured coded positions <= 2t+1 only) means the
stencil is exact up to and including the LAST bit of any stream — no
separate tail system — and, crucially, that a per-row real length
``n_real`` inside a longer canonicalized trellis leaves every real bit
exact: positions >= 2*n_real never feed bits t < n_real.

A re-encode syndrome then counts hard errors per packet (restricted to
kept, within-``n_real`` positions):

* syndrome == 0 everywhere   -> the algebraic inverse IS the Viterbi
  output on the real region (codeword-prefix case) — no trellis sweep;
* 0 < n_fail <= tier         -> only failing rows are gathered into the
  smallest sufficient lane tile (fallback, 4x, 16x fallback) and run
  through the Pallas Viterbi;
* n_fail > largest tier      -> the whole batch falls back to the full
  Pallas Viterbi sweep (exact at any SNR).

The branches are ``lax.cond`` at batch scope — one compiled program
serves every SNR, paying the ~25 ms ACS+traceback cost only when the
channel actually demands it.  The reference decoder
(/root/reference/lib/decode_impl.cc, 93-250 ticks per LLR item) runs the
full Viterbi unconditionally; this adaptive gate is where the TPU build
spends an order of magnitude less on the benchmark's operating point.

Matrix derivation (host, cached per code rate): Gaussian elimination
over GF(2) on a 5-block encoding window — the solution's support is
restricted to the 3 center coded blocks, so the same stencil is
position-independent and exact for every block including the first
(zero left padding = zero preceding data = zero encoder state) and the
last (causal support).
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

#: first fallback lane-tile capacity (rows re-decoded by the Pallas
#: Viterbi when their syndrome is nonzero); a 128-lane tile is the
#: smallest the kernel supports and covers sync outliers at working SNR.
#: A second 4x tier softens the mid-SNR cliff before the full sweep.
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
    """Puncture keep mask over a depunctured stream, shared with the
    depuncture scatter (single source of truth: viterbi.depuncture_indices)."""
    idx, _ = VXLA.depuncture_indices(cr, -(-ncoded // 2))
    m = np.zeros(2 * (-(-ncoded // 2)), bool)
    m[idx] = True
    return m[:ncoded]


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
    stencil is position-independent.  The returned solution is CAUSAL
    (asserted): column k's support ends at window position 2*(KB+k)+1,
    which makes the stencil exact at stream ends and under per-row
    ``n_real`` masking (see module docstring)."""
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
    for k in range(KB):                            # causality certificate
        nz = np.nonzero(Xd[:, k])[0]
        assert nz.max() <= 2 * (KB + k) + 1, (cr, k, nz.max())
    return Xd


def _hard_inverse(hard_flat: jax.Array, cr: str, n_trellis: int) -> jax.Array:
    """(B, 2T) depunctured hard bits (f32 0/1) -> (B, T) data bits f32.

    Exact on every bit of an error-free stream (causal stencil); if the
    stream is only a codeword PREFIX of length n_real < T (canonicalized
    buckets, positions >= 2*n_real zeroed), bits [0, n_real) are exact."""
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
    return d.reshape(B, -1)[:, :n_trellis]


def _syndrome(d: jax.Array, hard_flat: jax.Array, cr: str, n_trellis: int,
              live: jax.Array | None = None) -> jax.Array:
    """Per-row count of kept (and live) coded positions where
    re-encode(d) != hard."""
    B = d.shape[0]
    h = jnp.pad(d, ((0, 0), (6, 0)))

    def tap(k):
        return jax.lax.slice_in_dim(h, 6 - k, 6 - k + n_trellis, axis=1)

    a = (tap(0) + tap(2) + tap(3) + tap(5) + tap(6)) % 2
    c = (tap(0) + tap(1) + tap(2) + tap(3) + tap(6)) % 2
    re = jnp.stack([a, c], axis=-1).reshape(B, 2 * n_trellis)
    keep = jnp.asarray(_keep_mask(cr, 2 * n_trellis).astype(np.float32))
    mism = jnp.abs(re - hard_flat) * keep[None, :]
    if live is not None:
        mism = mism * live
    return jnp.sum(mism, axis=1).astype(jnp.int32)


def inverse_and_syndrome(coded_llr: jax.Array, cr: str, n_trellis: int,
                         n_real: jax.Array | None = None):
    """Algebraic-invert and re-encode-check a batch of punctured LLRs.

    Builds the depunctured HARD-bit stream directly (no f32 LLR-pair
    tensor: the (B, T, 2) depuncture is only needed by the Viterbi
    fallback branches, and materializing it as a lax.cond operand costs
    ~145 MB of traffic the fast path never uses).  Returns (d8 (B, T)
    uint8 candidate, syn (B,) int32 per-row hard-error count over kept
    positions in [0, n_real))."""
    B = coded_llr.shape[0]
    idx, nk = VXLA.depuncture_indices(cr, n_trellis)
    hard = jnp.zeros((B, 2 * n_trellis), jnp.float32)
    hard = hard.at[:, idx].set((coded_llr[:, :nk] > 0).astype(jnp.float32))
    live = None
    if n_real is not None:
        live = (jnp.arange(2 * n_trellis, dtype=jnp.int32)[None, :]
                < 2 * n_real.astype(jnp.int32)[:, None]).astype(jnp.float32)
        hard = hard * live
    d = _hard_inverse(hard, cr, n_trellis)
    syn = _syndrome(d, hard, cr, n_trellis, live)
    return d.astype(jnp.uint8), syn


def adaptive_decode(coded_llr: jax.Array, cr: str, n_trellis: int,
                    fallback: int = FALLBACK_B,
                    n_real: jax.Array | None = None) -> jax.Array:
    """Depuncture + decode with the syndrome-gated fast path.

    coded_llr: (B, >=n_kept) punctured LLRs (positive = coded bit 1).
    n_real: optional (B,) int32 true trellis length per row for
    canonicalized (rounded-up) buckets — the syndrome and fast path then
    cover only each row's real region (pad-region bits are discarded by
    the caller; for the Viterbi fallback the >= 96-step survivor-merge
    margin the canon ladder guarantees keeps the real bits identical at
    working SNR — a heuristic bound, same as SEG_OVERLAP, not a
    worst-case guarantee over pathological pad-region LLRs).
    Returns (B, n_trellis) uint8 — identical to the pure Viterbi path on
    every row whose decode matters: zero-syndrome rows are codeword
    prefixes (fast path IS the ML output); other rows run the real
    Viterbi via a tiered lane-tile ladder (fallback, 4x, 16x fallback,
    full batch) so mid-SNR batches with few bad rows avoid the full
    sweep.
    """
    B = coded_llr.shape[0]
    d8, syn = inverse_and_syndrome(coded_llr, cr, n_trellis, n_real)
    need = syn > 0
    n_fail = jnp.sum(need.astype(jnp.int32))

    def fast(_):
        return d8

    def tile_fn(k):
        def tile(_):
            idx = jnp.nonzero(need, size=k, fill_value=B)[0]
            rows = jnp.minimum(idx, B - 1)
            # depuncture only the k gathered rows (the fast path never
            # materializes the (B, T, 2) pairs tensor at all);
            # "auto": small tiles on long trellises decode segmented —
            # the monolithic sweep's sequential span costs the same at
            # 128 lanes as at 1024, so spreading segments across the
            # idle lanes cuts the tile path ~4x
            pairs_k = VXLA.depuncture(coded_llr[rows], cr, n_trellis)
            bits = viterbi_decode_pallas(pairs_k,
                                         segmented="auto")  # (k, T) uint8
            # merge via one-hot MXU matmul: the (k, T) dynamic row scatter
            # d8.at[idx].set(bits) costs ~6.5 ms at (4096, 4420) on this
            # chip (measured round 4, results/profile_fallback.json — the
            # scatter twin of the gather pathology); the matmul + select
            # is ~0.2 ms and exact (0/1 values in one bf16 pass)
            onehot = (idx[None, :]
                      == jnp.arange(B, dtype=jnp.int32)[:, None])
            merged = jnp.dot(onehot.astype(jnp.float32),
                             bits.astype(jnp.float32),
                             preferred_element_type=jnp.float32)
            return jnp.where(need[:, None], merged.astype(jnp.uint8), d8)
        return tile

    def full(_):
        return viterbi_decode_pallas(
            VXLA.depuncture(coded_llr, cr, n_trellis))

    body = full
    for k in [t for t in (16 * fallback, 4 * fallback, fallback) if t < B]:
        def tier(_, k=k, nxt=body):
            return jax.lax.cond(n_fail <= k, tile_fn(k), nxt, None)
        body = tier
    return jax.lax.cond(n_fail == 0, fast, body, None)
