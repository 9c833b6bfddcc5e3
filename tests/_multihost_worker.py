"""Worker process for the 2-host scale-out test (see test_multihost.py).

Usage: python tests/_multihost_worker.py <process_id> <num_processes> <port>
Builds the SAME deterministic packet stream as the parent test, ingests only
its own time-slice, joins the global mesh and runs the fused multi-host RX
chain; prints "RESULT ok=<n> det=<n>" on success.
"""
import sys
import os

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
jax.config.update("jax_platforms", "cpu")


def build_stream():
    import numpy as np
    from gr_ieee80211_tpu.spec.params import PhyConfig, Fmt
    from gr_ieee80211_tpu.gold import tx, mac

    mpdu = mac.qos_data_frame(b"x" * 40, "02:00:00:00:00:01",
                              "02:00:00:00:00:02", "02:00:00:00:00:01", 1)
    am = mac.ampdu_aggregate_vht([mpdu])
    cfg = PhyConfig(Fmt.VHT, 2, 1, len(am), ampdu=True)
    wave = tx.tx_waveform(cfg, am, group_id=0, partial_aid=0)[0]
    n_pkt = 16
    spacing = len(wave) + 1400
    n_total = -(-(n_pkt * spacing + 4096) // 8) * 8
    stream = np.zeros(n_total, np.complex64)
    for i in range(n_pkt):
        stream[1000 + i * spacing: 1000 + i * spacing + len(wave)] = wave
    return cfg, mpdu, stream, n_pkt


def main():
    pid, n_proc, port = int(sys.argv[1]), int(sys.argv[2]), int(sys.argv[3])
    from gr_ieee80211_tpu.parallel import distributed as D

    D.bootstrap(f"localhost:{port}", num_processes=n_proc, process_id=pid,
                local_device_count=4)
    cfg, mpdu, stream, n_pkt = build_stream()
    mesh = D.global_mesh(("sp",))
    n_local = len(stream) // n_proc
    local = stream[pid * n_local: (pid + 1) * n_local]   # per-host ingest
    gstream = D.distribute_stream(local, mesh)
    chain, _halo = D.rx_chain_multihost(cfg, mesh, mpdu_len=len(mpdu),
                                        max_pkts_per_shard=max(8, n_pkt))
    with mesh:
        n_ok, n_det = (int(x) for x in chain(gstream))
    print(f"RESULT ok={n_ok} det={n_det}", flush=True)


if __name__ == "__main__":
    main()
