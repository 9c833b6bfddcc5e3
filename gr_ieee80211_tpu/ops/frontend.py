"""Batched RX front end: STF/LTF correlators, trigger metrics, CFO.

The streaming detectors are expressed as cumulative-sum moving windows over
the whole sample stream (one fused pass on device); per-packet sync/CFO
refinement operates on gathered (B, n) windows.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

FS = 20e6


def _movsum(x: jax.Array, w: int) -> jax.Array:
    c = jnp.cumsum(x, axis=-1)
    zero = jnp.zeros_like(c[..., :1])
    c = jnp.concatenate([zero, c], axis=-1)
    return c[..., w:] - c[..., :-w]


@jax.jit
def stf_metrics(x: jax.Array):
    """x (n,) complex -> (metric m, lag-16 autocorr c), aligned to x[0]."""
    prod = x[:-16] * jnp.conj(x[16:])
    c = _movsum(prod, 48)
    p = _movsum(jnp.abs(x) ** 2, 64)
    n = min(c.shape[-1], p.shape[-1])
    m = jnp.abs(c[..., :n]) / jnp.maximum(p[..., :n], 1e-12)
    return m, c[..., :n]


@jax.jit
def ltf_corr_metric(x: jax.Array) -> jax.Array:
    """Normalized lag-64 autocorrelation over a 64-window (LTF detector)."""
    prod = x[:-64] * jnp.conj(x[64:])
    a = _movsum(prod, 64)
    pw = _movsum(jnp.abs(x) ** 2, 64)
    n = a.shape[-1]
    den = jnp.sqrt(jnp.maximum(pw[..., :n] * pw[..., 64: 64 + n], 1e-24))
    return jnp.abs(a) / den


def find_triggers_host(m: np.ndarray, thresh: float = 0.3, run: int = 20) -> list[int]:
    """Plateau starts (host-side, on the downloaded metric)."""
    from ..gold.rx import find_triggers
    return find_triggers(m, thresh, run)


@functools.partial(jax.jit, static_argnames=("max_out", "run"))
def detect_plateaus(m: jax.Array, thresh: float = 0.3, run: int = 20,
                    max_out: int = 4096) -> jax.Array:
    """Device-side plateau-start detection; returns (max_out,) candidate
    indices padded with -1.  Only these indices cross to the host — the full
    metric array never leaves the device."""
    above = (m > thresh).astype(jnp.float32)
    run_ok = _movsum(above, run) >= run            # all `run` above from n
    nr = run_ok.shape[-1]
    prev = jnp.concatenate([jnp.zeros(1), above[:-1]])
    start = run_ok & (prev[:nr] == 0) & (above[:nr] > 0)
    idx = jnp.nonzero(start, size=max_out, fill_value=-1)[0]
    return idx.astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=("n",))
def gather_windows(x: jax.Array, starts: jax.Array, n: int) -> jax.Array:
    """x (N,) + starts (B,) -> (B, n) windows via batched dynamic slicing."""
    def one(s):
        return jax.lax.dynamic_slice(x, (s,), (n,))
    return jax.vmap(one)(starts)


@jax.jit
def ltf_fine_sync(wins: jax.Array):
    """Per-packet L-LTF timing on (B, 368) windows starting at trigger+80.

    Returns (offsets (B,), peak (B,)): offset of the chosen ltf_idx within
    the window (mid of the 80% shoulders of the lag-64 autocorr peak, +10).
    """
    B, n = wins.shape
    npts = n - 128
    # sliding correlation via cumsum
    prod = wins[:, :-64] * jnp.conj(wins[:, 64:])
    a = _movsum(prod, 64)[:, :npts]
    pw = _movsum(jnp.abs(wins) ** 2, 64)
    den = jnp.sqrt(jnp.maximum(pw[:, :npts] * pw[:, 64: 64 + npts], 1e-24))
    ac = jnp.abs(a) / den
    k = jnp.argmax(ac, axis=1)
    peak = jnp.take_along_axis(ac, k[:, None], axis=1)[:, 0]
    # 80% shoulders within +-32
    idx = np.arange(npts)
    tgt = 0.8 * peak[:, None]
    d = jnp.abs(ac - tgt)
    in_l = (idx[None, :] <= k[:, None]) & (idx[None, :] >= k[:, None] - 32)
    in_r = (idx[None, :] >= k[:, None]) & (idx[None, :] <= k[:, None] + 32)
    big = jnp.full_like(d, 1e9)
    lo = jnp.argmin(jnp.where(in_l, d, big), axis=1)
    hi = jnp.argmin(jnp.where(in_r, d, big), axis=1)
    mid = (lo + hi) // 2 + 10
    return mid.astype(jnp.int32), peak


@jax.jit
def coarse_cfo_batch(stf_wins: jax.Array) -> jax.Array:
    """(B, >=80) windows at the trigger -> CFO Hz from lag-16 autocorr."""
    prod = jnp.mean(stf_wins[:, :64] * jnp.conj(stf_wins[:, 16:80]), axis=1)
    return -jnp.angle(prod) / 16 / (2 * np.pi) * FS


@jax.jit
def fine_cfo_batch(ltf_wins: jax.Array, cfo0: jax.Array) -> jax.Array:
    """(B, 128) LTF windows + coarse CFO -> refined CFO Hz."""
    n = np.arange(128)
    rot = jnp.exp(-1j * 2 * np.pi * cfo0[:, None] / FS * n[None, :])
    w = ltf_wins * rot
    prod = jnp.mean(w[:, :64] * jnp.conj(w[:, 64:128]), axis=1)
    return cfo0 - jnp.angle(prod) / 64 / (2 * np.pi) * FS


@functools.partial(jax.jit, static_argnames=("n",))
def derotate_batch(x: jax.Array, starts: jax.Array, cfo: jax.Array, n: int):
    """Gather (B, n) windows at ``starts`` and derotate each by its CFO."""
    wins = gather_windows(x, starts, n)
    t = np.arange(n)
    return wins * jnp.exp(-1j * 2 * np.pi * cfo[:, None] / FS * t[None, :])
