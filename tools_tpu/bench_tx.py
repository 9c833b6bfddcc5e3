"""TX throughput: batched device waveform synthesis, VHT MCS7 500 B.

The reference TX chain (pktgen -> encode -> modulation -> IFFT/CP -> pad)
runs one packet at a time through GR blocks; here a whole batch synthesizes
as one XLA program (scramble/BCC/interleave as XOR-matmuls and gathers,
QAM map, pilots, MXU IDFT, GI/preamble assembly).

Prints one JSON line (packets/s and samples/s) to stdout.
"""
import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)
    import jax.numpy as jnp
    from gr_ieee80211_tpu.spec.params import PhyConfig, Fmt
    from gr_ieee80211_tpu.gold import mac
    from gr_ieee80211_tpu.models.tx import tx_batch

    args = [a for a in sys.argv[1:] if a != "--mu"]
    mu_mode = "--mu" in sys.argv[1:]
    B = int(args[0]) if args else 4096
    rng = np.random.default_rng(3)
    payload = bytes(rng.integers(0, 256, 500, dtype=np.uint8))
    mpdu = mac.qos_data_frame(payload, "f4:69:d5:80:0f:a0",
                              "00:c0:ca:b1:5b:e1", "f4:69:d5:80:0f:a0", 7)
    am = mac.ampdu_aggregate_vht([mpdu])
    seeds = jnp.asarray((np.arange(B) % 127 + 1).astype(np.int32))

    if mu_mode:
        # device-batched 2-user MU beamformed TX (tx_batch_mu)
        from gr_ieee80211_tpu.spec.params import MuConfig
        from gr_ieee80211_tpu.models.tx import tx_batch_mu
        from gr_ieee80211_tpu.ops.cplx import from_host
        mpdu1 = mac.qos_data_frame(payload[:300], "02:00:00:00:00:11",
                                   "00:c0:ca:b1:5b:e1",
                                   "02:00:00:00:00:11", 8)
        am1 = mac.ampdu_aggregate_vht([mpdu1])
        mu = MuConfig((PhyConfig(Fmt.VHT, 7, 1, len(am), ampdu=True),
                       PhyConfig(Fmt.VHT, 7, 1, len(am1), ampdu=True)),
                      group_id=2)
        q = from_host((rng.normal(size=(64, 2, 2))
                       + 1j * rng.normal(size=(64, 2, 2))) / np.sqrt(2))
        pays = (jnp.asarray(np.tile(np.frombuffer(am, np.uint8), (B, 1))),
                jnp.asarray(np.tile(np.frombuffer(am1, np.uint8), (B, 1))))
        f = jax.jit(lambda p, s: jnp.sum(
            tx_batch_mu(mu, p, s, q).re[..., :1]))
        one = tx_batch_mu(mu, (pays[0][:1], pays[1][:1]), seeds[:1], q)
        n_samp = one.re.shape[-1]
        metric = "tx_mu_2user_ppdus_per_s_per_chip_vht_mcs7"
        call = lambda: f(pays, seeds)
    else:
        cfg = PhyConfig(Fmt.VHT, 7, 1, len(am), ampdu=True)
        arr = jnp.asarray(np.tile(np.frombuffer(am, np.uint8), (B, 1)))
        f = jax.jit(lambda a, s: jnp.sum(
            tx_batch(cfg, a, s, 0, 0).re[..., :1]))
        one = tx_batch(cfg, arr[:1], seeds[:1], 0, 0)
        n_samp = one.re.shape[-1]
        metric = "tx_synthesis_packets_per_s_per_chip_vht_mcs7_500B"
        call = lambda: f(arr, seeds)

    # N-dispatch single-pull windows: every result PULL costs a full ~26 ms
    # relay round trip (readbacks serialize at that cadence), so pulling
    # per batch measures the relay, not the chip.  Dispatches queue freely
    # and execute in order, so wall(N dispatches + one pull) - RTT ~= N x
    # device time; three windows give a median + spread.
    float(call())
    t0 = time.perf_counter()
    float(call())
    rtt = time.perf_counter() - t0
    N = 50
    dts = []
    for _ in range(3):
        t0 = time.perf_counter()
        outs = [call() for _ in range(N)]
        float(outs[-1])
        dts.append(max(time.perf_counter() - t0 - rtt, 1e-9) / N)
    dt = float(np.median(dts))
    spread = float(max(dts) / min(dts) - 1)
    print(f"{dt*1e3:.2f} ms/batch of {B}; wave {n_samp} samples/pkt; "
          f"window spread {spread:.0%}; rtt {rtt*1e3:.1f} ms",
          file=sys.stderr)
    blob = {"metric": metric,
            "value": round(B / dt, 1), "unit": "packets/s",
            "samples_per_s": round(B * n_samp / dt),
            "window_spread": round(spread, 3)}
    print(json.dumps(blob))
    import os
    if os.path.isdir("results"):
        path = "results/bench_tx.json"
        try:
            cur = json.load(open(path))
        except Exception:
            cur = {}
        cur[metric] = blob
        json.dump(cur, open(path, "w"), indent=1)


if __name__ == "__main__":
    main()
