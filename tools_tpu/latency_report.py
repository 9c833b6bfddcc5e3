"""Per-packet latency / RTT measurement through the streaming daemons.

Counterpart of the reference's latency study
(/root/reference/tools/performance/Measurement_Report.pdf):
  Fig 1-4  per-packet block latency, VHT MCS0-8, 30 B / 300 B payloads
  Fig 6-9  TX -> channel -> RX round-trip time (no USRP, channel model only)

Here the measured loop is the full daemon path with the reference wire
protocol at both ends:

  MAC UDP :9528 request -> PhyTxServer (waveform synth) -> TxStreamer
  -> cf32 UDP -> native UdpIngest -> IqRing -> RxStreamer (overlap-save
  blocks, batched RxEngine on the accelerator) -> PhyRxReporter -> MAC UDP

RTT = (MAC report received) - (MAC request sent), one packet in flight at a
time, the packet's block flushed with trailing silence (the no-USRP protocol:
samples flow as fast as the pipe moves them, like the reference's
channel-model loop).  Each MPDU carries a sequence tag so reports match
requests exactly.

Also reports the single-dispatch fused-chain device latency
(models.rx.rx_chain_count): the engine's known-config path crosses the host
boundary once, so its latency is one relay round trip + device compute —
at B packets per block the same number amortizes B-fold per packet.

Writes results/latency.json and results/LATENCY.md.

NOTE (methodology): on this tunneled TPU backend every device->host readback
costs ~26 ms of relay round trip; the general engine path (detect / sync+SIG
/ per-bucket decode) crosses 3-4 times per block, so daemon RTT here is
dominated by transport, not compute.  The fused-chain line shows the
single-crossing floor; on a host-attached TPU the relay term vanishes.
"""
import json
import os
import socket
import statistics
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def pctl(xs, q):
    xs = sorted(xs)
    i = min(len(xs) - 1, int(round(q / 100 * (len(xs) - 1))))
    return xs[i]


def run_daemon_rtt(mcs_list, payload_lens, n_pkts, block_len=1 << 16,
                   halo=16384):
    from gr_ieee80211_tpu.runtime import native as NAT
    from gr_ieee80211_tpu.runtime.udp_phy import (
        PhyTxServer, PhyRxReporter, parse_phy_to_mac)
    from gr_ieee80211_tpu.runtime.streaming import RxStreamer, TxStreamer
    from gr_ieee80211_tpu.models.rx import RxEngine
    from gr_ieee80211_tpu.gold import mac

    mac_rx = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
    mac_rx.bind(("127.0.0.1", 0))
    mac_rx.settimeout(0.05)
    ring = NAT.IqRing(1 << 22)
    ing = NAT.UdpIngest(ring, port=0)
    streamer = RxStreamer(ring, RxEngine(nrx=1), block_len=block_len,
                          halo=halo, poll_s=0.002,
                          reporter=PhyRxReporter(
                              port=mac_rx.getsockname()[1]))
    streamer.start()
    tx_sink = TxStreamer(udp_addr=("127.0.0.1", ing.port), gap=1200, amp=0.2)
    phy_tx = PhyTxServer(sink=tx_sink, port=0)
    phy_tx.start()
    mac_tx = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
    silence = np.zeros(4096, np.complex64).tobytes()
    sil_sock = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)

    def flush_block():
        # trailing silence so the burst's overlap-save block leaves the ring
        # (the no-more-samples condition of the reference's file-input runs)
        for _ in range(0, block_len + halo + 8192, 4096):
            sil_sock.sendto(silence, ("127.0.0.1", ing.port))

    results = {}
    try:
        for mcs in mcs_list:
            for plen in payload_lens:
                rtts = []
                lost = 0
                for it in range(n_pkts + 2):   # first 2 = jit warmup, dropped
                    seq = (mcs << 20) | (plen << 8) | (it & 0xFF)
                    body = seq.to_bytes(4, "big") + bytes(plen - 4)
                    mpdu = mac.qos_data_frame(
                        body, "f4:69:d5:80:0f:a0", "00:c0:ca:b1:5b:e1",
                        "f4:69:d5:80:0f:a0", 1)
                    psdu = mac.ampdu_aggregate_vht([mpdu])
                    hdr = bytes([2, mcs, 1, len(psdu) & 0xFF, len(psdu) >> 8])
                    nb0 = tx_sink.n_bursts
                    t0 = time.perf_counter()
                    mac_tx.sendto(hdr + psdu, ("127.0.0.1", phy_tx.port))
                    while tx_sink.n_bursts == nb0:     # burst fully emitted
                        time.sleep(0.0002)
                    flush_block()
                    deadline = time.time() + (600 if it < 2 else 15)
                    got = None
                    while time.time() < deadline:
                        assert streamer.error is None, streamer.error
                        try:
                            data, _ = mac_rx.recvfrom(65536)
                        except socket.timeout:
                            continue
                        parsed = parse_phy_to_mac(data)
                        if parsed is None:
                            continue
                        _, pl, _ = parsed
                        if len(pl) >= 30 and pl[26:30] == body[:4]:
                            got = time.perf_counter()
                            break
                    if got is None:
                        lost += 1
                    elif it >= 2:
                        rtts.append((got - t0) * 1e3)
                if rtts:
                    results[(mcs, plen)] = {
                        "n": len(rtts), "lost": lost,
                        "p50_ms": round(pctl(rtts, 50), 1),
                        "p95_ms": round(pctl(rtts, 95), 1),
                        "mean_ms": round(statistics.mean(rtts), 1),
                    }
                else:
                    results[(mcs, plen)] = {"n": 0, "lost": lost}
                r = results[(mcs, plen)]
                print(f"daemon RTT vht mcs{mcs} {plen}B: {r}",
                      file=sys.stderr, flush=True)
    finally:
        streamer.stop()
        phy_tx.stop()
        ing.stop()
    return results


def run_fused_latency(mcs_list, payload_lens, batches=(1, 256, 4096)):
    """Single-dispatch rx_chain_count latency per batch size (device path)."""
    import jax
    from gr_ieee80211_tpu.spec.params import PhyConfig, Fmt
    from gr_ieee80211_tpu.gold import tx, mac, channel
    from gr_ieee80211_tpu.models import rx as RXM
    from gr_ieee80211_tpu.ops.cplx import from_host

    rng = np.random.default_rng(7)
    out = {}
    for mcs in mcs_list:
        for plen in payload_lens:
            mpdu = mac.qos_data_frame(bytes(rng.integers(0, 256, plen,
                                                         dtype=np.uint8)),
                                      "f4:69:d5:80:0f:a0",
                                      "00:c0:ca:b1:5b:e1",
                                      "f4:69:d5:80:0f:a0", 1)
            am = mac.ampdu_aggregate_vht([mpdu])
            cfg = PhyConfig(Fmt.VHT, mcs, 1, len(am), ampdu=True)
            wave = channel.apply_cfo(
                tx.tx_waveform(cfg, am, group_id=0, partial_aid=0)[0], 500.0
            ).astype(np.complex64)
            for B in batches:
                spacing = len(wave) + 240
                stream = np.zeros(B * spacing + 2048, np.complex64)
                for i in range(B):
                    stream[1024 + i * spacing: 1024 + i * spacing
                           + len(wave)] = wave
                rms = float(np.sqrt(np.mean(np.abs(wave) ** 2)))
                stream += (rng.normal(size=len(stream))
                           + 1j * rng.normal(size=len(stream))
                           ).astype(np.complex64) * (rms / 10 ** (30 / 20)
                                                     / np.sqrt(2))
                dev = from_host(stream[None])
                f = lambda d: RXM.rx_chain_count(cfg, d, nrx=1,
                                                 mpdu_len=len(mpdu),
                                                 max_pkts=max(B, 16))
                n_ok, _ = (int(x) for x in f(dev))       # warmup/compile
                ts = []
                for _ in range(7):
                    t0 = time.perf_counter()
                    int(f(dev)[0])                        # blocking: latency
                    ts.append((time.perf_counter() - t0) * 1e3)
                ts = ts[2:]
                out[(mcs, plen, B)] = {
                    "ok": n_ok, "of": B,
                    "p50_ms": round(pctl(ts, 50), 1),
                    "per_pkt_us": round(pctl(ts, 50) * 1e3 / B, 1),
                }
                print(f"fused vht mcs{mcs} {plen}B B={B}: "
                      f"{out[(mcs, plen, B)]}", file=sys.stderr, flush=True)
    return out


def main():
    import jax
    if os.environ.get("RUN_ON_CPU"):       # plumbing smoke test (the
        jax.config.update("jax_platforms", "cpu")  # artifact runs on TPU)
    jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)
    mcs_list = [int(x) for x in
                (sys.argv[1].split(",") if len(sys.argv) > 1
                 else range(9))]
    n_pkts = int(sys.argv[2]) if len(sys.argv) > 2 else 25
    batches = tuple(int(x) for x in sys.argv[3].split(",")) \
        if len(sys.argv) > 3 else (1, 256, 4096)
    payload_lens = (30, 300)

    fused = run_fused_latency(mcs_list, payload_lens, batches=batches)
    daemon = run_daemon_rtt(mcs_list, payload_lens, n_pkts)

    os.makedirs("results", exist_ok=True)
    blob = {
        "backend": jax.default_backend(),
        "daemon_rtt": {f"mcs{m}_{p}B": v for (m, p), v in daemon.items()},
        "fused_chain": {f"mcs{m}_{p}B_B{b}": v
                        for (m, p, b), v in fused.items()},
    }
    with open("results/latency.json", "w") as f:
        json.dump(blob, f, indent=1)

    lines = [
        "# Latency / RTT report",
        "",
        "Counterpart of the reference Measurement_Report.pdf latency study",
        "(per-packet block latency Fig 1-4; no-USRP RTT Fig 6-9: ~2-10 ms at",
        "30 B, up to ~20-25 ms at 300 B on an i7-11700).  Methodology: full",
        "daemon loop (MAC UDP request -> PhyTxServer -> cf32 UDP -> native",
        "ingest -> RxStreamer -> MAC UDP report), one packet in flight,",
        "block flushed with silence; plus the fused single-dispatch chain.",
        "",
        "On this tunneled TPU backend one device->host readback costs ~26 ms",
        "of relay round trip.  Round 4 fused the front end into one packed",
        "dispatch (~8-10 crossings down to ~3, p50 79-126 ms); round 5's",
        "speculative one-crossing chain (models/rx._spec_core: fused",
        "front+decode for the steady-state config, host-verified against",
        "the SIG bits, compacted psdu readback) reaches p50 ~49-64 ms =",
        "1 crossing + upload + compute + daemon cadence.  On a host-",
        "attached TPU the relay term vanishes; the amortized per-packet",
        "column is the architecture's real currency.",
        "",
        "## Daemon RTT, VHT, one packet in flight (ms)",
        "",
        "| MCS | 30 B p50 | 30 B p95 | 300 B p50 | 300 B p95 |",
        "|---|---|---|---|---|",
    ]
    for m in mcs_list:
        a = daemon.get((m, 30), {})
        b = daemon.get((m, 300), {})
        lines.append(f"| {m} | {a.get('p50_ms', '-')} | {a.get('p95_ms', '-')}"
                     f" | {b.get('p50_ms', '-')} | {b.get('p95_ms', '-')} |")
    lines += [
        "",
        "## Fused single-dispatch chain (known config, device path)",
        "",
        "| MCS | payload | batch | p50 ms/batch | us/packet |",
        "|---|---|---|---|---|",
    ]
    for (m, p, b), v in fused.items():
        lines.append(f"| {m} | {p} B | {b} | {v['p50_ms']} "
                     f"| {v['per_pkt_us']} |")
    with open("results/LATENCY.md", "w") as f:
        f.write("\n".join(lines) + "\n")
    print("wrote results/LATENCY.md and results/latency.json")


if __name__ == "__main__":
    main()
