"""PER-vs-SNR sweep — the reference evaluation protocol on the TPU engine.

Mirrors ``/root/reference/tools/performance/perf_siso.py``: per MCS, N
packets of 500 B payload, AWGN calibrated against the signal RMS, SNR swept
0..30 dB; PER = fraction of packets whose MPDU fails FCS.  Instead of
spawning a GNU Radio flowgraph per SNR point and grepping its stdout, every
(mcs, snr) point is one batched device decode.

Usage:
  python tools_tpu/perf_sweep.py [--formats L HT VHT] [--n 100] \
      [--snrs 0 31 1] [--payload 500] [--out per_results.json] [--cpu]
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--formats", nargs="+", default=["L", "HT", "VHT"])
    ap.add_argument("--mcs", nargs="+", type=int, default=None)
    ap.add_argument("--n", type=int, default=100)
    ap.add_argument("--snrs", nargs=3, type=float, default=[0, 31, 1])
    ap.add_argument("--payload", type=int, default=500)
    ap.add_argument("--out", default="per_results.json")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()
    if args.cpu:
        os.environ["JAX_PLATFORMS"] = "cpu"
        os.environ["JAX_PLATFORM_NAME"] = "cpu"

    import numpy as np
    import jax.numpy as jnp
    from gr_ieee80211_tpu.spec.params import PhyConfig, Fmt
    from gr_ieee80211_tpu.gold import tx as gtx, mac, channel
    from gr_ieee80211_tpu.models import rx as RXM
    from gr_ieee80211_tpu.ops.cplx import from_host

    rng = np.random.default_rng(2026)
    snrs = np.arange(*args.snrs)
    mcs_by_fmt = {"L": range(8), "HT": range(8), "VHT": range(9)}
    results = {}

    for fname in args.formats:
        fmt = Fmt[fname]
        for mcs in (args.mcs or mcs_by_fmt[fname]):
            payload = bytes(rng.integers(0, 256, args.payload, dtype=np.uint8))
            mpdu = mac.qos_data_frame(payload, "f4:69:d5:80:0f:a0",
                                      "00:c0:ca:b1:5b:e1",
                                      "f4:69:d5:80:0f:a0", 7)
            if fmt == Fmt.VHT:
                psdu = mac.ampdu_aggregate_vht([mpdu])
                cfg = PhyConfig(fmt, mcs, 1, len(psdu), ampdu=True)
            else:
                psdu = mpdu
                cfg = PhyConfig(fmt, mcs, 1, len(psdu))
            kw = dict(group_id=0, partial_aid=0) if fmt == Fmt.VHT else {}
            wave = gtx.tx_waveform(cfg, psdu, **kw)[0]
            rms = float(np.sqrt(np.mean(np.abs(wave) ** 2)))
            # perfectly-synced batch at known positions + AWGN per SNR
            spacing = len(wave) + 400
            base = np.zeros(args.n * spacing + 1024, np.complex64)
            for i in range(args.n):
                base[512 + i * spacing: 512 + i * spacing + len(wave)] = \
                    channel.apply_cfo(wave, 800.0)
            ltf_idx = (512 + np.arange(args.n) * spacing + 186).astype(np.int32)
            pers = []
            t0 = time.time()
            for snr in snrs:
                namp = rms / 10 ** (snr / 20)
                noisy = base + (rng.normal(size=len(base))
                                + 1j * rng.normal(size=len(base))
                                ).astype(np.complex64) * (namp / np.sqrt(2))
                dev = from_host(noisy[None])
                stf = RXM.FE.gather_windows(dev[0], jnp.asarray(ltf_idx - 106), 80)
                cfo0 = RXM.FE.coarse_cfo_batch(stf)
                ltfw = RXM.FE.gather_windows(dev[0], jnp.asarray(ltf_idx), 128)
                cfo = RXM.FE.fine_cfo_batch(ltfw, cfo0)
                out = RXM._payload_core(cfg, dev, jnp.asarray(ltf_idx), cfo,
                                        nrx=1, mpdu_len=len(mpdu)
                                        if fmt == Fmt.VHT else 0)
                key = "mpdu_fcs_ok" if fmt == Fmt.VHT else "fcs_ok"
                ok = int(jnp.sum(out[key]))
                pers.append(1.0 - ok / args.n)
            results[f"{fname}_mcs{mcs}"] = {
                "snr_db": snrs.tolist(), "per": pers,
                "payload": args.payload, "n": args.n,
            }
            print(f"{fname} mcs{mcs}: {time.time()-t0:.1f}s  "
                  + " ".join(f"{p:.2f}" for p in pers), file=sys.stderr)

    with open(args.out, "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps({"points": sum(len(v["per"]) for v in results.values()),
                      "out": args.out}))


if __name__ == "__main__":
    main()
