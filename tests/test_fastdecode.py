"""Syndrome-gated adaptive decoder (ops.fastdecode) vs gold/Viterbi.

The claim under test: when the received hard bits form a codeword the
algebraic inverse equals the data exactly; otherwise the fallback
Viterbi tiers reproduce the pure Pallas path on every row (psdu region —
traceback garbage past the tail may differ, as documented)."""
import numpy as np
import jax.numpy as jnp
import pytest

from gr_ieee80211_tpu.gold import bits as GB
from gr_ieee80211_tpu.ops import fastdecode as FD
from gr_ieee80211_tpu.ops.viterbi_pallas import viterbi_decode_pallas
from gr_ieee80211_tpu.ops import viterbi as VXLA

RATES = ("1/2", "2/3", "3/4", "5/6")


def _llr_batch(rng, cr, T, B, flips_per_row=None):
    """Encode B random data rows; return (coded LLRs (B, Ns), data)."""
    data = rng.integers(0, 2, (B, T)).astype(np.uint8)
    data[:, -6:] = 0                      # tail-terminated
    llrs, Ns = [], None
    for b in range(B):
        cs = GB.bcc_encode_punct(data[b], cr)
        Ns = len(cs)
        llr = (cs.astype(np.float32) * 2 - 1) * 4.0
        if flips_per_row:
            pos = rng.choice(Ns, flips_per_row[b], replace=False)
            llr[pos] = -llr[pos]
        llrs.append(llr)
    return np.stack(llrs), data, Ns


@pytest.mark.parametrize("cr", RATES)
def test_error_free_equals_data(cr):
    rng = np.random.default_rng(3)
    T = 733
    llr, data, _ = _llr_batch(rng, cr, T, 4)
    out = np.asarray(FD.adaptive_decode(jnp.asarray(llr), cr, T))
    assert np.array_equal(out, data)


def test_interior_and_tail_matrices_all_lengths():
    rng = np.random.default_rng(4)
    for cr in RATES:
        for T in (4420, 1021, 241, 30):
            llr, data, _ = _llr_batch(rng, cr, T, 2)
            out = np.asarray(FD.adaptive_decode(jnp.asarray(llr), cr, T))
            assert np.array_equal(out, data), (cr, T)


def test_tile_fallback_matches_pure_viterbi():
    """A few corrupted rows route through the fallback tile and match the
    pure Pallas decode bit-for-bit on the non-tail region."""
    rng = np.random.default_rng(5)
    cr, T, B = "3/4", 600, 8
    flips = [0, 3, 0, 0, 7, 0, 0, 1]
    llr, data, _ = _llr_batch(rng, cr, T, B, flips_per_row=flips)
    out = np.asarray(FD.adaptive_decode(jnp.asarray(llr), cr, T, fallback=4))
    pure = np.asarray(viterbi_decode_pallas(
        VXLA.depuncture(jnp.asarray(llr), cr, T)))
    assert np.array_equal(out[:, : T - 96], pure[:, : T - 96])
    # clean rows kept the algebraic answer
    for b in (0, 2, 3, 5, 6):
        assert np.array_equal(out[b], data[b])


def test_full_fallback_when_over_capacity():
    """More failing rows than the tile -> whole batch = pure Viterbi."""
    rng = np.random.default_rng(6)
    cr, T, B = "1/2", 480, 6
    flips = [2, 2, 2, 2, 2, 0]
    llr, data, _ = _llr_batch(rng, cr, T, B, flips_per_row=flips)
    out = np.asarray(FD.adaptive_decode(jnp.asarray(llr), cr, T, fallback=2))
    pure = np.asarray(viterbi_decode_pallas(
        VXLA.depuncture(jnp.asarray(llr), cr, T)))
    assert np.array_equal(out, pure)
    # light corruption at strong |LLR|: Viterbi corrects it back to the data
    assert np.array_equal(out[:, : T - 96], data[:, : T - 96])


def test_syndrome_counts_flips():
    rng = np.random.default_rng(7)
    cr, T = "5/6", 500
    llr, data, Ns = _llr_batch(rng, cr, T, 3, flips_per_row=[0, 4, 1])
    pairs = VXLA.depuncture(jnp.asarray(llr), cr, T)
    flat = pairs.reshape(3, 2 * T)
    hard = (flat > 0).astype(jnp.float32)
    d = FD._hard_inverse(hard, cr, T)
    syn = np.asarray(FD._syndrome(d, hard, cr, T))
    assert syn[0] == 0
    assert syn[1] >= 4 and syn[2] >= 1
