"""Batched OFDM demodulation ops (jit-able, packet-batch leading axis).

All functions operate on (B, ...) arrays so the whole RX pipeline for a
bucket of same-config packets is one fused XLA program: FFT over
(B*nsym, 64), equalization, pilot phase tracking, LLR demap and the
deinterleave/stream-deparse gathers.  Numerics mirror the gold receiver
(``gold/rx.py``), which mirrors the reference demod blocks.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..spec import tables as T
from ..spec.params import Fmt, PhyConfig


def fft_syms(wins: jax.Array) -> jax.Array:
    """(..., 64) time windows -> fftshifted grids."""
    return jnp.fft.fftshift(jnp.fft.fft(wins, axis=-1), axes=-1)


def extract_sym_windows(xs: jax.Array, start: int, nsym: int) -> jax.Array:
    """xs (B, n) CFO-corrected samples -> (B, nsym, 64) FFT windows, for
    symbols whose GIs begin at start + 80*k."""
    B = xs.shape[0]
    idx = start + T.N_GI + 80 * np.arange(nsym)[:, None] + np.arange(64)[None, :]
    wins = xs[:, idx.reshape(-1)].reshape(B, nsym, 64)
    return wins


def legacy_chanest(xs: jax.Array, ltf_start: int = 0) -> jax.Array:
    """(B, n) -> (B, 64) legacy channel estimate from the two L-LTF repeats."""
    l1 = fft_syms(xs[:, ltf_start: ltf_start + 64])
    l2 = fft_syms(xs[:, ltf_start + 64: ltf_start + 128])
    ref = T.LTF_L_GRID
    nz = ref != 0
    h = (l1 + l2) * np.where(nz, 1.0 / np.where(nz, ref, 1), 0.0) * 0.5
    return jnp.where(nz, h, 1.0)


def nl_chanest(xs: jax.Array, ltf_start: int, nltf: int, nss: int,
               nrx_axis: bool = False) -> tuple[jax.Array, jax.Array]:
    """Non-legacy P-matrix channel estimate.

    xs: (B, n) or (B, nrx, n).  Returns (h, pilot_h):
    h (B, [nrx,] nss, 64), pilot_h (B, [nrx,] 4) summed-stream R-combined.
    """
    if not nrx_axis:
        xs = xs[:, None, :]
    B, nrx, _ = xs.shape
    grids = []
    for j in range(nltf):
        w = xs[:, :, ltf_start + 80 * j + 16: ltf_start + 80 * j + 80]
        grids.append(fft_syms(w))
    G = jnp.stack(grids, axis=0)  # (nltf, B, nrx, 64)
    ref = T.LTF_NL_GRID
    nz = ref != 0
    inv_ref = np.where(nz, 1.0 / np.where(nz, ref, 1), 0.0)
    hs = []
    for s in range(nss):
        comb = sum(G[j] * float(T.P_LTF[s, j]) for j in range(nltf))
        h = comb * inv_ref / nltf
        hs.append(jnp.where(nz, h, 1.0))
    h = jnp.stack(hs, axis=2)  # (B, nrx, nss, 64)
    pref = T.LTF_NL_GRID[T.PILOT_IDX]
    pcomb = sum(G[j][:, :, T.PILOT_IDX] * float(T.R_LTF[j]) for j in range(nltf))
    pilot_h = pcomb / pref / nltf  # (B, nrx, 4)
    if not nrx_axis:
        return h[:, 0], pilot_h[:, 0]
    return h, pilot_h


@functools.lru_cache(maxsize=None)
def _pilot_matrix(fmt: Fmt, nss: int, nsym: int) -> np.ndarray:
    from ..gold.tx import data_pilots
    return data_pilots(fmt, nss, nsym)  # (nsym, nss, 4)


def equalize_and_demap(grids: jax.Array, h: jax.Array, pilot_h: jax.Array,
                       cfg: PhyConfig, nrx_axis: bool = False) -> jax.Array:
    """Per-symbol pilot phase correction + (ZF) equalization + LLR demap.

    grids: (B, [nrx,] nsym, 64); h: (B, [nrx,] nss, 64); pilot_h (B, [nrx,] 4).
    Returns interleaved LLRs (B, nss, nsym*ncbpss) float32.
    """
    legacy = cfg.fmt == Fmt.L
    didx = T.DATA_IDX_L if legacy else T.DATA_IDX_NL
    pilots = _pilot_matrix(cfg.fmt, cfg.nss, cfg.nsym)      # (nsym, nss, 4)
    if not nrx_axis:
        grids = grids[:, None]
        h = h[:, None]
        pilot_h = pilot_h[:, None]
    B, nrx, nsym, _ = grids.shape

    # expected pilot per (sym, rx): HT 2SS uses per-stream pilot channel
    if cfg.fmt == Fmt.HT and cfg.nss == 2:
        hp = h[:, :, :, T.PILOT_IDX]                         # (B,nrx,nss,4)
        exp_p = jnp.einsum("brsk,nsk->brnk", hp, pilots.astype(np.complex64))
    else:
        exp_p = pilot_h[:, :, None, :] * pilots[:, 0][None, None, :, :]
    rx_p = grids[:, :, :, T.PILOT_IDX]                       # (B,nrx,nsym,4)
    corr = jnp.sum(rx_p * jnp.conj(exp_p), axis=(1, 3))      # (B, nsym)
    ph = corr / jnp.maximum(jnp.abs(corr), 1e-12)
    grids = grids * jnp.conj(ph)[:, None, :, None]

    y = grids[:, :, :, didx]                                 # (B,nrx,nsym,nsd)
    hd = h[:, :, :, didx]                                    # (B,nrx,nss,nsd)
    if cfg.nss == 1 and nrx == 1:
        eq = (y / hd[:, :, 0][:, :, None, :])[:, 0][:, None]  # (B,1,nsym,nsd)
        eq = eq.transpose(0, 1, 2, 3)
    else:
        # ZF via normal equations, closed-form for nss<=2
        g = jnp.einsum("brsk,brtk->bstk", jnp.conj(hd), hd)  # (B,nss,nss,nsd)
        r = jnp.einsum("brsk,brnk->bsnk", jnp.conj(hd), y)   # (B,nss,nsym,nsd)
        if cfg.nss == 1:
            eq = r / g[:, 0, 0][:, None, None, :]
        else:
            det = g[:, 0, 0] * g[:, 1, 1] - g[:, 0, 1] * g[:, 1, 0]
            inv_det = 1.0 / jnp.where(jnp.abs(det) > 1e-20, det, 1e-20)
            e0 = (g[:, 1, 1][:, None] * r[:, 0] - g[:, 0, 1][:, None] * r[:, 1])
            e1 = (g[:, 0, 0][:, None] * r[:, 1] - g[:, 1, 0][:, None] * r[:, 0])
            eq = jnp.stack([e0, e1], axis=1) * inv_det[:, None, None, :]
    # eq: (B, nss, nsym, nsd)
    llr = llr_demap(eq, cfg.nbpscs)                          # (B,nss,nsym,ncbpss)
    return llr.reshape(B, cfg.nss, -1)


def llr_demap(eq: jax.Array, nbpscs: int) -> jax.Array:
    """(..., nsd) equalized QAM -> (..., nsd*nbpscs) piecewise-linear LLRs."""
    z = eq * T.KMOD[nbpscs]
    if nbpscs == 1:
        return z.real.astype(jnp.float32)
    half = nbpscs // 2
    outs = []
    for v in (z.real, z.imag):
        cur = v
        axis_llrs = [cur]
        for b in range(1, half):
            cur = (1 << (half - b)) - jnp.abs(cur)
            axis_llrs.append(cur)
        outs.append(jnp.stack(axis_llrs, axis=-1))
    out = jnp.concatenate(outs, axis=-1)   # (..., nsd, nbpscs)
    return out.reshape(*eq.shape[:-1], -1).astype(jnp.float32)


@functools.lru_cache(maxsize=None)
def _deint_deparse_perm(fmt: Fmt, nbpscs: int, nss: int, nsym: int) -> np.ndarray:
    """Combined gather: interleaved per-stream LLR array (nss, nsym*ncbpss)
    flattened -> coded-stream order (nsym*ncbps,).

    out[i] = flat_index into (nss * nsym * ncbpss) of coded bit i.
    """
    legacy = fmt == Fmt.L
    nsd = 48 if legacy else 52
    ncbpss = nsd * nbpscs
    ncbps = ncbpss * nss
    # deinterleave: per stream, per symbol: coded_pos k <- interleaved perm[k]
    perms = [T.interleave_perm_legacy(nbpscs) if legacy
             else T.interleave_perm_nl(nbpscs, iss, nss) for iss in range(nss)]
    # stream deparse: coded bit i of a symbol -> (iss, k)
    out = np.empty(nsym * ncbps, dtype=np.int64)
    sp = T.stream_parser_perm(nbpscs, nss, 1, ncbpss)  # (nss, ncbpss)
    for sym in range(nsym):
        base = sym * ncbps
        for iss in range(nss):
            # stream iss's bit k comes from coded position sp[iss, k];
            # within the interleaved array it sits at perms[iss][k]
            coded_pos = base + sp[iss]                     # (ncbpss,)
            flat = iss * (nsym * ncbpss) + sym * ncbpss + perms[iss]
            out[coded_pos] = flat
    return out


def deinterleave_deparse(llr: jax.Array, cfg: PhyConfig) -> jax.Array:
    """(B, nss, nsym*ncbpss) interleaved LLRs -> (B, nsym*ncbps) coded order."""
    perm = _deint_deparse_perm(cfg.fmt, cfg.nbpscs, cfg.nss, cfg.nsym)
    B = llr.shape[0]
    return llr.reshape(B, -1)[:, perm]


@functools.lru_cache(maxsize=None)
def _descramble_tables():
    seq127 = T.scramble_seq(0x7F, 127)
    # offset table: 7-bit word (b0..b6 little-endian) -> cyclic offset
    off = np.zeros(128, dtype=np.int32)
    ext = np.concatenate([seq127, seq127[:7]])
    for o in range(127):
        w = 0
        for i in range(7):
            w |= int(ext[o + i]) << i
        off[w] = o
    return seq127, off


def descramble_bits(bits: jax.Array) -> jax.Array:
    """(B, n) scrambled bits -> descrambled (first 7 bits zeroed)."""
    seq127, off_tab = _descramble_tables()
    B, n = bits.shape
    w = jnp.sum(bits[:, :7].astype(jnp.int32) * (1 << np.arange(7)), axis=1)
    off = jnp.asarray(off_tab)[w]                           # (B,)
    idx = (off[:, None] + np.arange(n)[None, :]) % 127
    seq = jnp.asarray(seq127)[idx]
    out = bits ^ seq
    return out.at[:, :7].set(0)


def bits_to_bytes_batch(bits: jax.Array) -> jax.Array:
    """(B, 8*n) bits -> (B, n) uint8, LSB-first per byte."""
    B, nb = bits.shape
    return jnp.sum(bits.reshape(B, nb // 8, 8).astype(jnp.int32)
                   * (1 << np.arange(8)), axis=-1).astype(jnp.uint8)
