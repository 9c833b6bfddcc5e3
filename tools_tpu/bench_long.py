"""Long-trellis throughput: VHT MCS0 4095 B at full batch via chunk=.

The MCS0 4095 B trellis is ~33k steps; its Viterbi decision planes are
(T, B, 64) int8 x 2, so an unchunked 4096-packet program would reserve
~17 GB in the fallback branch (HBM is 16 GB).  ``rx_chain_count(chunk=)``
scans the synced batch in fixed-size chunks INSIDE the single fused
program: decision planes are per-chunk temporaries while the dispatch
still amortizes over the whole batch (VERDICT round-2 ask #7; the
reference streams any length through its per-sample decoder,
/root/reference/lib/decode_impl.h:35-36 — ours must too, fast).

Writes results/bench_long.json; run on the TPU (one job at a time).
"""
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)
    from gr_ieee80211_tpu.spec.params import PhyConfig, Fmt
    from gr_ieee80211_tpu.gold import tx, mac, channel
    from gr_ieee80211_tpu.models import rx as RXM
    from gr_ieee80211_tpu.ops.cplx import from_host

    B = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    chunk = int(sys.argv[2]) if len(sys.argv) > 2 else 128
    rng = np.random.default_rng(1)
    payload = bytes(rng.integers(0, 256, 4000, dtype=np.uint8))
    mpdu = mac.qos_data_frame(payload, "f4:69:d5:80:0f:a0",
                              "00:c0:ca:b1:5b:e1", "f4:69:d5:80:0f:a0", 7)
    am = mac.ampdu_aggregate_vht([mpdu])
    cfg = PhyConfig(Fmt.VHT, 0, 1, len(am), ampdu=True)
    wave = tx.tx_waveform(cfg, am, group_id=0, partial_aid=0)[0]
    print(f"cfg: VHT mcs0 1ss, psdu {cfg.psdu_len} B, nsym {cfg.nsym}, "
          f"trellis {cfg.n_trellis}, wave {len(wave)}; B={B} chunk={chunk}",
          file=sys.stderr, flush=True)
    spacing = len(wave) + 240
    stream = np.zeros(B * spacing + 2048, np.complex64)
    w = channel.apply_cfo(wave, 900.0).astype(np.complex64)
    for i in range(B):
        stream[1024 + i * spacing: 1024 + i * spacing + len(wave)] = w
    rms = float(np.sqrt(np.mean(np.abs(wave) ** 2)))
    stream += (rng.normal(size=len(stream)) + 1j * rng.normal(size=len(stream))
               ).astype(np.complex64) * (rms / 10 ** (32 / 20) / np.sqrt(2))
    dev = from_host(stream[None])
    print(f"stream: {len(stream)/1e6:.1f} M samples", file=sys.stderr,
          flush=True)

    def chain(d):
        return RXM.rx_chain_count(cfg, d, nrx=1, mpdu_len=len(mpdu),
                                  max_pkts=B, chunk=chunk)

    n_ok, n_det = (int(x) for x in chain(dev))
    print(f"warmup: detected {n_det}, ok {n_ok}/{B}", file=sys.stderr,
          flush=True)
    t0 = time.perf_counter()
    int(chain(dev)[0])
    rtt = time.perf_counter() - t0
    n_rep = 8
    t0 = time.perf_counter()
    outs = [chain(dev) for _ in range(n_rep)]
    int(outs[-1][0])
    dt = max(time.perf_counter() - t0 - rtt, 1e-9) / n_rep
    # reference ceiling at its best-case 93 ticks/LLR item for this shape
    ref_pkts_s = 4.9e9 / (cfg.nsym * 52 * 93)
    print(f"{dt*1e3:.1f} ms/batch; {B/dt:,.0f} pkt/s; "
          f"{len(stream)/dt/1e6:.0f} Msamp/s; ok {n_ok}/{B}; "
          f"ref ceiling {ref_pkts_s:,.0f} pkt/s "
          f"({B/dt/ref_pkts_s:.1f}x)", file=sys.stderr, flush=True)
    os.makedirs("results", exist_ok=True)
    with open("results/bench_long.json", "w") as f:
        json.dump({"config": f"VHT mcs0 1ss 4000B (trellis {cfg.n_trellis}), "
                             f"B={B} chunk={chunk}, one chip",
                   "ms_per_batch": round(dt * 1e3, 1),
                   "pkt_per_s": round(B / dt, 1),
                   "msamp_per_s": round(len(stream) / dt / 1e6, 1),
                   "n_ok": n_ok, "n_det": n_det,
                   "vs_ref_ceiling": round(B / dt / ref_pkts_s, 2)},
                  f, indent=1)
    print("wrote results/bench_long.json")


if __name__ == "__main__":
    main()
