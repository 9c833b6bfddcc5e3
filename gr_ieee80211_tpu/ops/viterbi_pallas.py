"""Pallas TPU kernels for the Viterbi forward ACS sweep and traceback.

Layout: path metrics live in VMEM as (64 states, b_tile packets) — states in
sublanes, up to a 1024-packet tile in lanes.  The de Bruijn predecessor
structure (pred(s') = {2s', 2s'+1}) makes the per-step gather a
contiguous-pair split:

    ev = pm.reshape(32, 2, B)[:, 0]   # even predecessors
    od = pm.reshape(32, 2, B)[:, 1]   # odd predecessors
    lo half (in-bit 0) = max(ev + bm, od + q)
    hi half (in-bit 1) = max(ev + q,  od + bm)

where bm = a00*l0 + a10*l1 and q = (l0+l1) - bm — the branch-metric
complement symmetry (flipping predecessor parity or the input bit flips
both coded output bits) cuts one trellis step to ~12 VPU ops with no lane
shuffles or gathers.  The grid walks (batch tiles, T chunks) with T
innermost; metrics persist in scratch across T chunks.  Decisions stream
out as two (T, 32, B) int8 planes for the traceback kernel, which walks the
grid's T axis in REVERSE carrying the survivor one-hot mask in scratch
(gather-free: fold the two masked decision halves to the predecessor
one-hot, ~8 VPU ops per step).

The lane tile adapts to the batch: a 512-packet long-trellis bucket runs
with b_tile=512 instead of padding to 1024 lanes (the HBM budget caps
long-trellis batches below a full tile, models/rx.RxEngine._decode_bucket).

Round-5 packed-planes verdict (acs_sweep_packed / traceback_sweep_packed,
kept in-tree as bit-exact reference kernels but NOT wired into the decode
path): packing 4 steps per int8 cuts the decision-plane HBM traffic 4x on
both sides, yet measures AT PARITY on the ACS (18.8 vs 18.3 ms at
(4480, 4096); 22.2 vs 21.9 at (5312, 4096); 4.2 vs 4.2 at (512, 8192))
and LOSES on the traceback (full decode 31.5 vs 28.8 / 37.2 vs 34.2 /
7.5 vs 6.6 ms): the 2 extra shift-accumulate VPU ops per half per step
(ACS) and the MSB-peel unpack (traceback) cost more than the bandwidth
they save — these kernels are VPU-op-bound, not HBM-bound, which also
explains the flat ~8.5 ms 'store cost' (it is loop-body op time, not
store bandwidth).  This closes the round-4 'bit-packed planes' lever
with the same verdict as every prior packing attempt below.

Measured dead ends on the v5e (radix-4 et al., kept OUT of the tree):
two-steps-per-iteration ACS variants — radix-4 over state quartets
(53 ms vs 24 ms at B=4096 x T=5312: the stride-4 sublane extracts lose),
cascaded radix-2 emitting a packed 2-bit digit plane (29.6 ms: in-loop
selects/concats cost more than the stores they save), one-packed-int8-
store-per-2-steps (23.7 ms: parity with baseline), f32 shift-accumulated
16-steps-per-word decisions (26.3 ms), bf16 decision planes (28.1 ms),
f32 decision planes (22.9 ms, −1.4 ms but 4x the HBM), and wider lane
tiles (b_tile=2048/4096: the store-free body is already VPU-bound at
0.54 us/step, 15.5 ms floor).  A store-free sweep runs 15.5 ms, so the
decision stores cost ~8.5 ms regardless of count, dtype, or packing —
the plain two-int8-plane radix-2 kernel below is the measured optimum.

The pure-XLA implementation in ``ops.viterbi`` remains the oracle and the
path used for the short SIG-field trellises; these kernels run in interpret
mode on CPU.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG = -1e9
#: max lane-tile width: 1024 packets/tile minimizes the count of sequential
#: trellis-loop iterations; T_CHUNK=64 keeps the double-buffered decision
#: blocks (2 x 2 MB x 2) plus LLR/metrics inside the 16 MB VMEM budget.
B_TILE = 1024
T_CHUNK = 64


def _lane_tile(B: int) -> int:
    """Adaptive lane tile: whole batch if it fits one tile, else B_TILE."""
    return B if B <= B_TILE else B_TILE


def _pad_batch(B: int) -> int:
    """Smallest supported padded batch: one 128-multiple tile, or a
    B_TILE multiple beyond one tile."""
    if B <= B_TILE:
        return -(-B // 128) * 128
    return -(-B // B_TILE) * B_TILE


def _branch_masks_in_kernel():
    """0/1 masks (float32, (32, 1)) for the four half-transitions, computed
    from iota (pallas kernels cannot capture host constants).

    For predecessor p = 2j + parity with input bit b:
      out0 = b ^ p4 ^ p3 ^ p1 ^ p0,   out1 = b ^ p5 ^ p4 ^ p3 ^ p0
    (state bit k of p = b_{t-1-(5-k)}; generators 133o/171o).
    """
    j = jax.lax.broadcasted_iota(jnp.int32, (32, 1), 0)

    def outs(parity, b):
        p = 2 * j + parity
        bit = lambda k: (p >> k) & 1
        o0 = (b ^ bit(4) ^ bit(3) ^ bit(1) ^ bit(0)) & 1
        o1 = (b ^ bit(5) ^ bit(4) ^ bit(3) ^ bit(0)) & 1
        return o0.astype(jnp.float32), o1.astype(jnp.float32)

    return {(half, parity): outs(parity, b_in)
            for half, b_in in ((0, 0), (1, 1)) for parity in (0, 1)}


def _make_acs_kernel(bt: int):
    def _acs_kernel(llr0_ref, llr1_ref, pm0_ref, dec_lo_ref, dec_hi_ref,
                    pm_out_ref, pm):
        tc = pl.program_id(1)

        @pl.when(tc == 0)
        def _():
            pm[:] = pm0_ref[:]

        masks = _branch_masks_in_kernel()
        (a00, a10) = masks[(0, 0)]

        # Branch-metric symmetry: flipping the predecessor parity (p0) or
        # the input bit flips BOTH output bits, so with bm = a00*l0 + a10*l1
        # and q = (l0+l1) - bm the four candidates are
        #   cand_a_lo = ev + bm   cand_b_lo = od + q
        #   cand_a_hi = ev + q    cand_b_hi = od + bm
        # — 12 VPU ops per trellis step instead of 16.
        def step(t, carry):
            p = carry
            l0 = llr0_ref[t, :][None, :]        # (1, bt)
            l1 = llr1_ref[t, :][None, :]
            pr = p.reshape(32, 2, bt)
            ev = pr[:, 0, :]                    # (32, bt) even predecessors
            od = pr[:, 1, :]
            bm = a00 * l0 + a10 * l1
            q = (l0 + l1) - bm
            cand_a_lo = ev + bm
            cand_b_lo = od + q
            cand_a_hi = ev + q
            cand_b_hi = od + bm
            dec_lo_ref[t, :, :] = (cand_b_lo > cand_a_lo).astype(jnp.int8)
            dec_hi_ref[t, :, :] = (cand_b_hi > cand_a_hi).astype(jnp.int8)
            new_lo = jnp.maximum(cand_a_lo, cand_b_lo)
            new_hi = jnp.maximum(cand_a_hi, cand_b_hi)
            return jnp.concatenate([new_lo, new_hi], axis=0)

        p = jax.lax.fori_loop(0, T_CHUNK, step, pm[:])
        # renormalize once per chunk to keep f32 exact over 32k trellises
        pm[:] = p - jnp.max(p, axis=0, keepdims=True)
        pm_out_ref[:] = pm[:]

    return _acs_kernel


def _make_acs_kernel_packed(bt: int):
    """ACS variant storing FOUR steps' decisions per int8 (value 0..15):
    the decision planes shrink 4x (HBM store AND traceback read traffic)
    at the cost of 2 extra VPU ops per half per step (shift-accumulate
    into an f32 carry) and a 4-step unrolled loop body."""
    def _kernel(llr0_ref, llr1_ref, pm0_ref, dec_lo_ref, dec_hi_ref,
                pm_out_ref, pm):
        tc = pl.program_id(1)

        @pl.when(tc == 0)
        def _():
            pm[:] = pm0_ref[:]

        masks = _branch_masks_in_kernel()
        (a00, a10) = masks[(0, 0)]

        def quad(q, carry):
            p = carry
            acc_lo = jnp.zeros((32, bt), jnp.float32)
            acc_hi = jnp.zeros((32, bt), jnp.float32)
            for i in range(4):
                t = q * 4 + i
                l0 = llr0_ref[t, :][None, :]
                l1 = llr1_ref[t, :][None, :]
                pr = p.reshape(32, 2, bt)
                ev = pr[:, 0, :]
                od = pr[:, 1, :]
                bm = a00 * l0 + a10 * l1
                qq = (l0 + l1) - bm
                cand_a_lo = ev + bm
                cand_b_lo = od + qq
                cand_a_hi = ev + qq
                cand_b_hi = od + bm
                w = float(1 << i)
                acc_lo = acc_lo + w * (cand_b_lo > cand_a_lo
                                       ).astype(jnp.float32)
                acc_hi = acc_hi + w * (cand_b_hi > cand_a_hi
                                       ).astype(jnp.float32)
                new_lo = jnp.maximum(cand_a_lo, cand_b_lo)
                new_hi = jnp.maximum(cand_a_hi, cand_b_hi)
                p = jnp.concatenate([new_lo, new_hi], axis=0)
            dec_lo_ref[q, :, :] = acc_lo.astype(jnp.int8)
            dec_hi_ref[q, :, :] = acc_hi.astype(jnp.int8)
            return p

        p = jax.lax.fori_loop(0, T_CHUNK // 4, quad, pm[:])
        pm[:] = p - jnp.max(p, axis=0, keepdims=True)
        pm_out_ref[:] = pm[:]

    return _kernel


@functools.partial(jax.jit, static_argnames=("interpret",))
def acs_sweep_packed(llr0: jax.Array, llr1: jax.Array,
                     pm0: jax.Array | None = None,
                     interpret: bool = False):
    """acs_sweep with 4-steps-per-int8 packed decision planes:
    returns (dec_lo, dec_hi) of shape (T//4, 32, B) int8 (values 0..15,
    bit i = step 4q+i's decision) and the final path metrics."""
    n_steps, B = llr0.shape
    bt = _lane_tile(B)
    assert n_steps % T_CHUNK == 0 and B % bt == 0 and B % 128 == 0
    if pm0 is None:
        pm0 = state0_metrics(B)
    grid = (B // bt, n_steps // T_CHUNK)
    spec32 = pl.BlockSpec((T_CHUNK // 4, 32, bt), lambda b, t: (t, 0, b),
                          memory_space=pltpu.VMEM)
    spec_pm = pl.BlockSpec((64, bt), lambda b, t: (0, b),
                           memory_space=pltpu.VMEM)
    return pl.pallas_call(
        _make_acs_kernel_packed(bt),
        grid=grid,
        in_specs=[
            pl.BlockSpec((T_CHUNK, bt), lambda b, t: (t, b),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((T_CHUNK, bt), lambda b, t: (t, b),
                         memory_space=pltpu.VMEM),
            spec_pm,
        ],
        out_specs=(spec32, spec32, spec_pm),
        out_shape=(jax.ShapeDtypeStruct((n_steps // 4, 32, B), jnp.int8),
                   jax.ShapeDtypeStruct((n_steps // 4, 32, B), jnp.int8),
                   jax.ShapeDtypeStruct((64, B), jnp.float32)),
        scratch_shapes=[pltpu.VMEM((64, bt), jnp.float32)],
        interpret=interpret,
    )(llr0, llr1, pm0)


def _make_traceback_kernel_packed(bt: int, n_tc: int):
    def _kernel(dec_lo_ref, dec_hi_ref, mask0_ref, bits_ref, mask):
        tc = pl.program_id(1)

        @pl.when(tc == 0)
        def _():
            mask[:] = mask0_ref[:]

        def quad(qi, m):
            q = T_CHUNK // 4 - 1 - qi
            plo = dec_lo_ref[q, :, :].astype(jnp.float32)   # 0..15
            phi = dec_hi_ref[q, :, :].astype(jnp.float32)
            for i in (3, 2, 1, 0):                          # peel MSB first
                w = float(1 << i)
                d_lo = jnp.floor(plo / w)
                d_hi = jnp.floor(phi / w)
                plo = plo - d_lo * w
                phi = phi - d_hi * w
                t = q * 4 + i
                m_lo, m_hi = m[:32], m[32:]
                bits_ref[t, :] = jnp.sum(m_hi, axis=0).astype(jnp.float32)
                f0 = m_lo * (1.0 - d_lo) + m_hi * (1.0 - d_hi)
                f1 = m_lo * d_lo + m_hi * d_hi
                m = jnp.stack([f0, f1], axis=1).reshape(64, bt)
            return m

        mask[:] = jax.lax.fori_loop(0, T_CHUNK // 4, quad, mask[:])

    return _kernel


@functools.partial(jax.jit, static_argnames=("interpret",))
def traceback_sweep_packed(dec_lo: jax.Array, dec_hi: jax.Array,
                           mask0: jax.Array | None = None,
                           interpret: bool = False):
    """traceback_sweep over 4-steps-per-int8 packed planes."""
    n_q, _, B = dec_lo.shape
    n_steps = n_q * 4
    bt = _lane_tile(B)
    assert n_steps % T_CHUNK == 0 and B % bt == 0 and B % 128 == 0
    if mask0 is None:
        mask0 = state0_mask(B)
    n_tc = n_steps // T_CHUNK
    grid = (B // bt, n_tc)
    spec32 = pl.BlockSpec((T_CHUNK // 4, 32, bt),
                          lambda b, t: (n_tc - 1 - t, 0, b),
                          memory_space=pltpu.VMEM)
    return pl.pallas_call(
        _make_traceback_kernel_packed(bt, n_tc),
        grid=grid,
        in_specs=[spec32, spec32,
                  pl.BlockSpec((64, bt), lambda b, t: (0, b),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((T_CHUNK, bt),
                               lambda b, t: (n_tc - 1 - t, b),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_steps, B), jnp.float32),
        scratch_shapes=[pltpu.VMEM((64, bt), jnp.float32)],
        interpret=interpret,
    )(dec_lo, dec_hi, mask0)


def state0_metrics(B: int) -> jnp.ndarray:
    """(64, B) initial path metrics pinned to state 0 (packet start)."""
    row = jax.lax.broadcasted_iota(jnp.int32, (64, B), 0)
    return jnp.where(row == 0, 0.0, NEG).astype(jnp.float32)


@functools.partial(jax.jit, static_argnames=("interpret",))
def acs_sweep(llr0: jax.Array, llr1: jax.Array, pm0: jax.Array | None = None,
              interpret: bool = False):
    """Forward ACS over the whole trellis.

    llr0, llr1: (T, B) float32 with T % T_CHUNK == 0 and B either a
    <=B_TILE multiple of 128 or a B_TILE multiple; pm0: (64, B) initial
    path metrics (default: pinned to state 0).
    Returns (dec_lo, dec_hi) (T, 32, B) int8 (1 = odd predecessor won) and
    the final path metrics (64, B).
    """
    n_steps, B = llr0.shape
    bt = _lane_tile(B)
    assert n_steps % T_CHUNK == 0 and B % bt == 0 and B % 128 == 0, \
        (n_steps, B, bt)
    if pm0 is None:
        pm0 = state0_metrics(B)
    grid = (B // bt, n_steps // T_CHUNK)
    spec32 = pl.BlockSpec((T_CHUNK, 32, bt), lambda b, t: (t, 0, b),
                          memory_space=pltpu.VMEM)
    spec_pm = pl.BlockSpec((64, bt), lambda b, t: (0, b),
                           memory_space=pltpu.VMEM)
    return pl.pallas_call(
        _make_acs_kernel(bt),
        grid=grid,
        in_specs=[
            pl.BlockSpec((T_CHUNK, bt), lambda b, t: (t, b),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((T_CHUNK, bt), lambda b, t: (t, b),
                         memory_space=pltpu.VMEM),
            spec_pm,
        ],
        out_specs=(spec32, spec32, spec_pm),
        out_shape=(jax.ShapeDtypeStruct((n_steps, 32, B), jnp.int8),
                   jax.ShapeDtypeStruct((n_steps, 32, B), jnp.int8),
                   jax.ShapeDtypeStruct((64, B), jnp.float32)),
        scratch_shapes=[pltpu.VMEM((64, bt), jnp.float32)],
        interpret=interpret,
    )(llr0, llr1, pm0)


def _on_tpu() -> bool:
    return jax.default_backend() in ("tpu", "axon")


def _make_traceback_kernel(bt: int, n_tc: int):
    def _traceback_kernel(dec_lo_ref, dec_hi_ref, mask0_ref, bits_ref, mask):
        """Backward survivor walk, one T_CHUNK block per grid step.

        The grid's T axis is index-mapped in REVERSE (last chunk first); the
        survivor one-hot mask (64, bt) persists in scratch across chunks,
        seeded from ``mask0`` (state 0 for tail-terminated packets, argmax
        of the final path metrics for mid-stream segments).  Gather-free:
        fold the two masked decision halves to the predecessor one-hot
        (pred = 2s mod 64, +1 where the odd predecessor won).
        """
        tc = pl.program_id(1)

        @pl.when(tc == 0)
        def _():
            mask[:] = mask0_ref[:]

        def step(i, m):
            t = T_CHUNK - 1 - i
            d_lo = dec_lo_ref[t, :, :].astype(jnp.float32)   # states 0..31
            d_hi = dec_hi_ref[t, :, :].astype(jnp.float32)   # states 32..63
            m_lo, m_hi = m[:32], m[32:]
            bits_ref[t, :] = jnp.sum(m_hi, axis=0).astype(jnp.float32)
            f0 = m_lo * (1.0 - d_lo) + m_hi * (1.0 - d_hi)
            f1 = m_lo * d_lo + m_hi * d_hi
            return jnp.stack([f0, f1], axis=1).reshape(64, bt)

        mask[:] = jax.lax.fori_loop(0, T_CHUNK, step, mask[:])

    return _traceback_kernel


def state0_mask(B: int) -> jnp.ndarray:
    row = jax.lax.broadcasted_iota(jnp.int32, (64, B), 0)
    return (row == 0).astype(jnp.float32)


@functools.partial(jax.jit, static_argnames=("interpret",))
def traceback_sweep(dec_lo: jax.Array, dec_hi: jax.Array,
                    mask0: jax.Array | None = None,
                    interpret: bool = False):
    """(T, 32, B) int8 decision halves -> (T, B) float32 bits (pre-trim).

    mask0: (64, B) one-hot survivor start (default: state 0)."""
    n_steps, _, B = dec_lo.shape
    bt = _lane_tile(B)
    assert n_steps % T_CHUNK == 0 and B % bt == 0 and B % 128 == 0
    if mask0 is None:
        mask0 = state0_mask(B)
    n_tc = n_steps // T_CHUNK
    grid = (B // bt, n_tc)
    spec32 = pl.BlockSpec((T_CHUNK, 32, bt),
                          lambda b, t: (n_tc - 1 - t, 0, b),
                          memory_space=pltpu.VMEM)
    return pl.pallas_call(
        _make_traceback_kernel(bt, n_tc),
        grid=grid,
        in_specs=[spec32, spec32,
                  pl.BlockSpec((64, bt), lambda b, t: (0, b),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((T_CHUNK, bt),
                               lambda b, t: (n_tc - 1 - t, b),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_steps, B), jnp.float32),
        scratch_shapes=[pltpu.VMEM((64, bt), jnp.float32)],
        interpret=interpret,
    )(dec_lo, dec_hi, mask0)


def _seg_geometry(B: int, T: int):
    """(S, K) segment count and kept steps per segment for (B, T).

    K is a multiple of SEG_W * 2 = 256 steps so every segment window is
    whole 512-float rows of the flat depunctured view (the layout-clean
    blocked take; see _viterbi_decode_segmented)."""
    S = max(2, -(-T // SEG_TARGET_K))
    K = 2 * SEG_W * -(-T // (2 * SEG_W * S))
    S = -(-T // K)
    return S, K


def segmented_pays(B: int, T: int) -> bool:
    """True when the segmented decode beats the monolithic sweep.

    MEASURED policy (round 5, layout-clean expansion, honest N-dispatch
    timing): the adaptive lane tile makes narrow-lane monolithic sweeps
    proportionally cheap, so segmentation only wins at ultra-narrow x
    ultra-long shapes — (128, 32318): seg 10.2 vs mono 12.5 ms; every
    other probed shape prefers mono ((128, 4420): 2.1 vs 1.9;
    (512, 4420): 7.6 vs 3.6; (1024, 4420): tie; (256, 32318): 20.6 vs
    16.8).  A tile-step count model (round 2-4) over-predicted segmented
    wins because it ignored the lane-width-proportional step cost.
    ``segmented=True`` remains the opt-in for LATENCY (the sequential
    span drops T/K-fold)."""
    return _pad_batch(B) <= 128 and T >= 16384


def viterbi_decode_pallas(llr_pairs: jax.Array,
                          segmented: bool | str = False) -> jax.Array:
    """Drop-in for ops.viterbi.viterbi_decode (traceback from state 0).

    llr_pairs: (B, T, 2) float32 -> (B, T) uint8.  Pads T to a T_CHUNK
    multiple; B pads to a 128 multiple and runs at an adaptive lane tile
    (no forced 1024-lane padding for sub-tile batches).

    segmented=True splits each trellis into overlapped ~1k-step segments
    decoded as extra batch rows (see _viterbi_decode_segmented): bit-
    identical at working SNR, ~4x lower per-packet latency and ~T/1k-fold
    smaller sequential span for multi-core scaling, but ~20% MORE total
    work at FULL lane tiles — the monolithic sweep stays the default for
    big batches.  segmented="auto" picks by the tile-step cost model
    (:func:`segmented_pays`): small-batch fallback tiles on long
    trellises go segmented, full batches stay monolithic.
    """
    B, n_steps, _ = llr_pairs.shape
    interp = not _on_tpu()
    if segmented == "auto":
        segmented = segmented_pays(B, n_steps)
    if segmented:
        return _viterbi_decode_segmented(llr_pairs, interpret=interp)
    Tp = -(-n_steps // T_CHUNK) * T_CHUNK
    Bp = _pad_batch(B)
    x = jnp.pad(llr_pairs, ((0, Bp - B), (0, Tp - n_steps), (0, 0)))
    llr0 = x[:, :, 0].transpose(1, 0)
    llr1 = x[:, :, 1].transpose(1, 0)
    dec_lo, dec_hi, _ = acs_sweep(llr0, llr1, interpret=interp)
    bits = traceback_sweep(dec_lo, dec_hi, interpret=interp)
    return bits.transpose(1, 0)[:B, :n_steps].astype(jnp.uint8)


#: segmented decoding: overlap-save over the TRELLIS.  Each packet's trellis
#: splits into S segments decoded as extra batch rows — the sequential loop
#: shrinks from T to K + 2*SEG_W steps.  A 128-step (>= the ~96-step
#: survivor-merge depth, 64-block-aligned) warmup from uniform metrics
#: converges the survivor tree, so segment interiors decode identically to
#: the monolithic sweep; traceback seeds from the argmax state at the
#: segment tail.  This is the "standard windowed" decoding the reference's
#: own measurement report recommends over its full-packet traceback
#: (Measurement_Report.pdf section 1).
SEG_OVERLAP = 96          # survivor-merge depth bound (docs/canon ladder)
SEG_W = 128               # actual window overlap (block-aligned >= bound)
SEG_TARGET_K = 1024
#: front-pad LLR strongly favoring coded bit 0: segment 0 decodes its
#: SEG_W-step pre-history as forced zero bits, reproducing the state-0
#: start pin under the shared uniform initial metrics
PIN_LLR = -1e5


def _viterbi_decode_segmented(llr_pairs: jax.Array,
                              interpret: bool = False) -> jax.Array:
    """Layout-clean segment expansion: the trellis is depunctured-flat
    (B, 2T), front-padded with SEG_W steps of PIN_LLR (state-0 pin for
    segment 0 under uniform pm0) and viewed as 512-float rows; every
    segment window is a whole-row take — never a (…, 2)-minor gather,
    which materializes in the 2->128 tile-padded layout on this backend
    (measured: the old fancy-index expansion cost 15.2 ms at
    (128, 32318) where this one runs ~5)."""
    B, n_steps, _ = llr_pairs.shape
    W = SEG_W
    S, K = _seg_geometry(B, n_steps)
    seg_t = K + 2 * W
    P = W + S * K + W                     # 2P = 512 * (S*K/256 + 1)
    # flat (B, 2T) view built by strided interleave of the two planes
    flat = jnp.zeros((B, 2 * n_steps), llr_pairs.dtype)
    flat = flat.at[:, 0::2].set(llr_pairs[:, :, 0])
    flat = flat.at[:, 1::2].set(llr_pairs[:, :, 1])
    flat = jnp.pad(flat, ((0, 0), (2 * W, 2 * (P - W - n_steps))))
    pin = (jnp.arange(2 * P, dtype=jnp.int32) < 2 * W)[None, :]
    flat = jnp.where(pin, PIN_LLR, flat)
    rows_per_b = 2 * P // 512
    v = flat.reshape(B * rows_per_b, 512)
    # window (b, s) = rows [b*rows_per_b + s*(2K/512), +2*seg_t/512)
    b = jnp.arange(B * S, dtype=jnp.int32) // S
    s = jnp.arange(B * S, dtype=jnp.int32) % S
    base = b * rows_per_b + s * (2 * K // 512)
    span = 2 * seg_t // 512
    bidx = base[:, None] + jnp.arange(span, dtype=jnp.int32)[None, :]
    N = B * S
    Np = _pad_batch(N)
    win = jnp.take(v, bidx, axis=0).reshape(N, 2 * seg_t)
    win = jnp.pad(win, ((0, Np - N), (0, 0)))
    llr0e = win[:, 0::2].transpose(1, 0)              # (seg_t, Np)
    llr1e = win[:, 1::2].transpose(1, 0)
    pm0 = jnp.zeros((64, Np), jnp.float32)            # uniform (pin via pad)
    dec_lo, dec_hi, pm_f = acs_sweep(llr0e, llr1e, pm0, interpret=interpret)
    # traceback from the ML end state of each window (for the last, tail
    # segment this is state 0 via the zero tail bits at working SNR)
    best = jnp.argmax(pm_f, axis=0)                   # (Np,)
    row = jax.lax.broadcasted_iota(jnp.int32, (64, Np), 0)
    mask0 = (row == best[None, :]).astype(jnp.float32)
    bits = traceback_sweep(dec_lo, dec_hi, mask0,
                           interpret=interpret)       # (seg_t, Np)
    kept = bits[W: W + K, :N]                         # (K, B*S)
    out = kept.transpose(1, 0).reshape(B, S * K)
    return out[:, :n_steps].astype(jnp.uint8)
