"""Headline benchmark: full-chain RX throughput, VHT MCS7, on one TPU chip.

Protocol mirrors the reference PER harness packet shape
(tools/performance/perf_siso.py: ~500 B payloads, VHT) but measures the
batched TPU engine: device-side detection -> sync/CFO -> batched demod ->
Pallas Viterbi -> descramble -> MXU CRC32.  Only candidate indices and the
final ok-count cross the host boundary.

Baseline: the reference decode block alone costs 93-250 CPU ticks per LLR
item (Gr_WiFi_Time_Complexity_Report, Table 1).  Taking its most favorable
point (93 ticks at the i7-11700's 4.9 GHz boost) for a VHT MCS7 500 B packet
(19 symbols x 312 coded bits = 5928 LLR items) gives 4.9e9/(5928*93) ~= 8888
packets/s as the reference ceiling for its bottleneck stage on one core --
the denominator for vs_baseline (the reference's full chain is slower).

Prints ONE json line to stdout; diagnostics go to stderr.
"""
import json
import sys
import time

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)
    import jax.numpy as jnp
    from gr_ieee80211_tpu.spec.params import PhyConfig, Fmt
    from gr_ieee80211_tpu.gold import tx, mac, channel
    from gr_ieee80211_tpu.models import rx as RXM

    rng = np.random.default_rng(1)
    payload = bytes(rng.integers(0, 256, 500, dtype=np.uint8))
    mpdu = mac.qos_data_frame(payload, "f4:69:d5:80:0f:a0",
                              "00:c0:ca:b1:5b:e1", "f4:69:d5:80:0f:a0", 7)
    am = mac.ampdu_aggregate_vht([mpdu])
    cfg = PhyConfig(Fmt.VHT, 7, 1, len(am), ampdu=True)
    wave = tx.tx_waveform(cfg, am, group_id=0, partial_aid=0)[0]
    log(f"cfg: VHT mcs7 1ss, mpdu {len(mpdu)} B, psdu {cfg.psdu_len} B, "
        f"nsym {cfg.nsym}, wave {len(wave)} samples")

    B = 4096
    gap = 240
    spacing = len(wave) + gap
    stream = np.zeros(B * spacing + 2048, np.complex64)
    w = channel.apply_cfo(wave, 900.0).astype(np.complex64)
    for i in range(B):
        stream[1024 + i * spacing: 1024 + i * spacing + len(wave)] = w
    rms = float(np.sqrt(np.mean(np.abs(wave) ** 2)))
    stream += (rng.normal(size=len(stream)) + 1j * rng.normal(size=len(stream))
               ).astype(np.complex64) * (rms / 10 ** (32 / 20) / np.sqrt(2))
    n_iq = len(stream)
    log(f"stream: {n_iq/1e6:.1f} M samples ({B} packets)")

    from gr_ieee80211_tpu.ops.cplx import from_host
    dev = from_host(stream[None])

    # ONE device program per batch: detect -> dedup -> sync -> decode -> count
    # (each extra dispatch+readback costs a ~26 ms relay round trip).
    def full_chain(dev):
        return RXM.rx_chain_count(cfg, dev, nrx=1, mpdu_len=len(mpdu),
                                  max_pkts=B)

    n_ok, n_det = (int(x) for x in full_chain(dev))
    log(f"warmup: detected {n_det}, {n_ok}/{B} packets passed FCS")
    if n_ok < 0.99 * B:
        log("WARNING: decode success below 99%, numbers may be invalid")

    # steady-state throughput: N dispatches + ONE scalar pull.  Every pull
    # costs a full ~26 ms relay round trip (readbacks serialize at that
    # cadence), so the single-pull window minus one RTT isolates device
    # time; dispatches queue freely and execute in order.
    t0 = time.perf_counter()
    int(full_chain(dev)[0])
    rtt = time.perf_counter() - t0
    n_rep = 40
    t0 = time.perf_counter()
    outs = [full_chain(dev) for _ in range(n_rep)]
    n_ok = int(outs[-1][0])
    dt = max(time.perf_counter() - t0 - rtt, 1e-9) / n_rep
    pkts_s = B / dt
    samples_s = n_iq / dt
    ref_pkts_s = 4.9e9 / (cfg.nsym * 312 * 93)
    log(f"{dt*1e3:.1f} ms/batch; {pkts_s:,.0f} pkt/s; {samples_s/1e6:.0f} Msamp/s; "
        f"ok {n_ok}/{B}; ref ceiling {ref_pkts_s:,.0f} pkt/s")
    log(f"(full chain at {samples_s/20e6:.1f}x realtime vs 20 Msps; the "
        f"reference decode stage ALONE caps at {ref_pkts_s:,.0f} pkt/s on "
        f"its benchmark CPU, and its full chain is slower still)")

    # --- low-SNR floor: the syndrome gate fails on every row, so the full
    # Pallas Viterbi sweep runs each batch (the reference pays this path at
    # EVERY SNR); same compiled program, only the noise level differs.
    stream_low = np.zeros_like(stream)
    for i in range(B):
        stream_low[1024 + i * spacing: 1024 + i * spacing + len(wave)] = w
    stream_low += (rng.normal(size=len(stream))
                   + 1j * rng.normal(size=len(stream))
                   ).astype(np.complex64) * (rms / 10 ** (18 / 20)
                                             / np.sqrt(2))
    dev_low = from_host(stream_low[None])
    n_ok_low, n_det_low = (int(x) for x in full_chain(dev_low))
    t0 = time.perf_counter()
    outs = [full_chain(dev_low) for _ in range(n_rep)]
    int(outs[-1][0])
    dt_low = max(time.perf_counter() - t0 - rtt, 1e-9) / n_rep
    pkts_s_low = B / dt_low
    log(f"low-SNR floor (18 dB, full-Viterbi fallback every batch): "
        f"{dt_low*1e3:.1f} ms/batch; {pkts_s_low:,.0f} pkt/s processed; "
        f"fcs ok {n_ok_low}/{B} (channel-limited at this SNR for 64-QAM 3/4); "
        f"{pkts_s_low/ref_pkts_s:.2f}x ref ceiling")

    import os
    os.makedirs("results", exist_ok=True)
    with open("results/bench_envelope.json", "w") as f:
        json.dump({
            "config": "VHT mcs7 1ss 500B, B=4096, one chip",
            "high_snr_32dB": {"ms_per_batch": round(dt * 1e3, 1),
                              "pkt_per_s": round(pkts_s, 1),
                              "n_ok": n_ok,
                              "vs_ref_ceiling": round(pkts_s / ref_pkts_s, 2)},
            "low_snr_floor_18dB": {"ms_per_batch": round(dt_low * 1e3, 1),
                                   "pkt_per_s_processed": round(pkts_s_low, 1),
                                   "n_ok": n_ok_low, "n_det": n_det_low,
                                   "vs_ref_ceiling": round(
                                       pkts_s_low / ref_pkts_s, 2)},
        }, f, indent=1)

    print(json.dumps({
        "metric": "rx_full_chain_packets_per_s_per_chip_vht_mcs7_500B",
        "value": round(pkts_s, 1),
        "unit": "packets/s",
        "vs_baseline": round(pkts_s / ref_pkts_s, 2),
    }))


if __name__ == "__main__":
    sys.path.insert(0, ".")
    main()
