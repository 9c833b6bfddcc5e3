"""Profile the syndrome-gated decode's fallback branches in isolation.

Round-4 outcome: this profile identified the dynamic-row SCATTER as the
+6-9 ms mid-SNR tile overhead (fixed with a one-hot MXU merge in
ops/fastdecode).  Times, at the bench shape (B=4096, VHT MCS7 500 B):

  syn      inverse_and_syndrome alone
  fast     adaptive_decode, 0 failing rows (fast path)
  tile8    adaptive_decode, 8 failing rows (128-tile branch)
  tile300  adaptive_decode, 300 failing rows (512-tile branch)
  full     monolithic full-batch Pallas Viterbi
  gather   coded_llr[rows] 128-row dynamic gather alone
  seg128   depuncture(128 rows) + segmented Pallas Viterbi alone
  scatter  d8.at[idx].set(bits) 128-row scatter alone

Timing: N jitted-scalar dispatches + ONE pull minus one measured relay
RTT (pulls serialize at ~26 ms on this backend; see bench.py).
"""
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    import jax
    if os.environ.get("RUN_ON_CPU"):
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
    import jax.numpy as jnp
    from gr_ieee80211_tpu.spec.params import PhyConfig, Fmt
    from gr_ieee80211_tpu.gold import bits as GB
    from gr_ieee80211_tpu.ops import fastdecode as FD
    from gr_ieee80211_tpu.ops import viterbi as VXLA
    from gr_ieee80211_tpu.ops.viterbi_pallas import viterbi_decode_pallas

    B = int(os.environ.get("PROF_B", 4096))
    cfg = PhyConfig(Fmt.VHT, 7, 1, 520, ampdu=True)
    T_, cr = cfg.n_trellis, cfg.cr
    rng = np.random.default_rng(0)
    msg = rng.integers(0, 2, (8, T_)).astype(np.uint8)
    msg[:, -6:] = 0
    coded_rows = []
    for i in range(8):
        c = GB.bcc_encode_punct(msg[i], cr).astype(np.float32)
        coded_rows.append(2 * c - 1)
    base = np.stack(coded_rows)
    n_kept = base.shape[1]
    clean = np.tile(base, (B // 8, 1)) + 0.05 * rng.normal(
        size=(B, n_kept)).astype(np.float32)

    def with_bad(n_bad):
        n_bad = min(n_bad, B // 2)
        x = clean.copy()
        # flip ~40 hard bits in each bad row: syndrome fires, decode falls
        # back through the tile ladder
        for r in range(n_bad):
            pos = rng.integers(0, n_kept, 40)
            x[r, pos] = -x[r, pos]
        return jnp.asarray(x)

    def timeit(name, fn, *args, reps=15):
        # N dispatches + ONE pull minus one RTT: result pulls serialize at
        # the ~26 ms relay round trip, so per-pull timings measure the
        # relay, not the chip (round-4 methodology, see bench.py)
        f = jax.jit(lambda *a: jnp.sum(fn(*a).astype(jnp.float32)))
        float(f(*args))
        t0 = time.perf_counter()
        float(f(*args))
        rtt = time.perf_counter() - t0
        t0 = time.perf_counter()
        outs = [f(*args) for _ in range(reps)]
        float(outs[-1])
        ms = max(time.perf_counter() - t0 - rtt, 1e-9) / reps * 1e3
        print(f"{name:10s} {ms:8.2f} ms", file=sys.stderr, flush=True)
        return round(ms, 2)

    x0 = jnp.asarray(clean)
    x8 = with_bad(8)
    x300 = with_bad(300)
    out = {"B": B, "T": T_, "cr": cr}

    out["syn"] = timeit("syn", lambda x: FD.inverse_and_syndrome(
        x, cr, T_)[1], x0)
    out["fast"] = timeit("fast", lambda x: FD.adaptive_decode(x, cr, T_), x0)
    out["tile8"] = timeit("tile8", lambda x: FD.adaptive_decode(x, cr, T_),
                          x8)
    out["tile300"] = timeit("tile300",
                            lambda x: FD.adaptive_decode(x, cr, T_), x300)
    out["full"] = timeit("full", lambda x: viterbi_decode_pallas(
        VXLA.depuncture(x, cr, T_)), x0)

    rows_idx = jnp.arange(128, dtype=jnp.int32)

    out["gather"] = timeit("gather", lambda x: x[rows_idx], x8)
    out["seg128"] = timeit("seg128", lambda x: viterbi_decode_pallas(
        VXLA.depuncture(x[:128], cr, T_), segmented="auto"), x8)
    out["seg128mono"] = timeit("seg128mono", lambda x: viterbi_decode_pallas(
        VXLA.depuncture(x[:128], cr, T_)), x8)

    d8 = FD.inverse_and_syndrome(x0, cr, T_)[0]
    bits128 = jnp.zeros((128, T_), jnp.uint8)

    out["scatter"] = timeit(
        "scatter", lambda d, b: d.at[rows_idx].set(b, mode="drop"),
        d8, bits128)

    with open("results/profile_fallback.json", "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
