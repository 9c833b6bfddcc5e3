"""Streaming RX daemon — the rx.grc flowgraph equivalent.

IQ in from a cf32 UDP stream (native C++ ingest thread) or a .bin file
replayed at a given rate; decoded MPDUs / NDP channel reports out on the
reference MAC wire (UDP :9527).  The reference's macExampleGrRx.py works
unmodified as the listener.

  python tools_tpu/rx_daemon.py --udp-iq 9000            # live cf32 in
  python tools_tpu/rx_daemon.py --file capture.bin       # replay
      [--nrx 1] [--block 524288] [--halo 16384] [--report-port 9527]
      [--mu-pos N] [--mu-gid G] [--stats-every 5]
"""
import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--udp-iq", type=int, default=None,
                    help="UDP port receiving interleaved-cf32 datagrams")
    ap.add_argument("--file", default=None, help="cf32 .bin file to replay")
    ap.add_argument("--block", type=int, default=1 << 19)
    ap.add_argument("--halo", type=int, default=16384)
    ap.add_argument("--report-port", type=int, default=9527)
    ap.add_argument("--mu-pos", type=int, default=None)
    ap.add_argument("--mu-gid", type=int, default=None)
    ap.add_argument("--stats-every", type=float, default=5.0)
    ap.add_argument("--once", action="store_true",
                    help="with --file: drain and exit")
    args = ap.parse_args()
    if (args.udp_iq is None) == (args.file is None):
        ap.error("exactly one of --udp-iq / --file required")

    from gr_ieee80211_tpu.runtime import native as NAT
    from gr_ieee80211_tpu.runtime.udp_phy import PhyRxReporter
    from gr_ieee80211_tpu.runtime.streaming import RxStreamer
    from gr_ieee80211_tpu.models.rx import RxEngine

    ring = NAT.IqRing(1 << 23)
    ing = None
    if args.udp_iq is not None:
        ing = NAT.UdpIngest(ring, port=args.udp_iq)
        print(f"ingesting cf32 on udp:{ing.port}", file=sys.stderr)
    eng = RxEngine(nrx=1, mu_pos=args.mu_pos, mu_gid=args.mu_gid)
    streamer = RxStreamer(ring, eng, block_len=args.block, halo=args.halo,
                          reporter=PhyRxReporter(port=args.report_port))
    streamer.start()
    print(f"reporting decoded packets to udp:{args.report_port}",
          file=sys.stderr)

    try:
        if args.file is not None:
            data = np.fromfile(args.file, np.complex64)
            print(f"replaying {len(data)/1e6:.1f} M samples", file=sys.stderr)
            o = 0
            while o < len(data):
                o += ring.write(data[o: o + (1 << 16)]) or 0
                time.sleep(0.001)
            streamer.stop(drain=True)
            streamer.join(timeout=600)
            print(f"done: {streamer.n_blocks} blocks, "
                  f"{streamer.n_ok}/{streamer.n_packets} packets ok",
                  file=sys.stderr)
            return
        while True:
            time.sleep(args.stats_every)
            s = ing.stats if ing else {}
            print(f"blocks {streamer.n_blocks}  pkts ok "
                  f"{streamer.n_ok}/{streamer.n_packets}  ingest {s}",
                  file=sys.stderr)
    except KeyboardInterrupt:
        pass
    finally:
        streamer.stop()
        if ing:
            ing.stop()


if __name__ == "__main__":
    main()
