"""Per-stage timing of the RX chain on the current backend.

Times each jitted stage of the bench configuration (VHT MCS7, 500 B,
B packets) in isolation: device detection, native host detection, sync/CFO,
payload demod (FFT+equalize+LLR+deinterleave), Viterbi ACS, traceback,
descramble+CRC.  Used to aim kernel optimization; mirrors the reference's
per-block clock-tick tables (tools/performance/Gr_WiFi_Time_Complexity_Report).

NOTE on methodology (round 4): on the tunneled TPU backend a device->host
readback costs ~26 ms of relay round trip regardless of work, result pulls
SERIALIZE at that cadence, and ``block_until_ready`` does NOT wait.  Every
stage is timed as N jitted-scalar dispatches + ONE pull, minus one
measured round trip — the printed numbers are pure device time.
"""
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
    from gr_ieee80211_tpu.gold import tx, mac, channel
    from gr_ieee80211_tpu.models import rx as RXM
    from gr_ieee80211_tpu.ops import frontend as FE, ofdm as OF
    from gr_ieee80211_tpu.ops import viterbi as VXLA
    from gr_ieee80211_tpu.ops import crc as CRC
    from gr_ieee80211_tpu.ops.cplx import from_host, cstack
    from gr_ieee80211_tpu.ops.viterbi_pallas import (
        acs_sweep, traceback_sweep, B_TILE, T_CHUNK)

    B = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
    rng = np.random.default_rng(1)
    payload = bytes(rng.integers(0, 256, 500, dtype=np.uint8))
    mpdu = mac.qos_data_frame(payload, "f4:69:d5:80:0f:a0",
                              "00:c0:ca:b1:5b:e1", "f4:69:d5:80:0f:a0", 7)
    am = mac.ampdu_aggregate_vht([mpdu])
    cfg = PhyConfig(Fmt.VHT, 7, 1, len(am), ampdu=True)
    wave = tx.tx_waveform(cfg, am, group_id=0, partial_aid=0)[0]
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
    dev = from_host(stream[None])
    print(f"backend={jax.default_backend()} B={B} stream={n_iq/1e6:.1f}M",
          file=sys.stderr)

    def timeit(name, fn, *a, n=12, extra=""):
        s = jax.jit(lambda *a: jnp.sum(
            jax.tree_util.tree_leaves(fn(*a))[0][..., :1].astype(jnp.float32)))
        float(s(*a))
        t0 = time.perf_counter()
        float(s(*a))
        rtt = time.perf_counter() - t0
        t0 = time.perf_counter()
        outs = [s(*a) for _ in range(n)]
        float(outs[-1])
        t = max(time.perf_counter() - t0 - rtt, 1e-9) / n
        print(f"{name:22s} {t*1e3:8.2f} ms   {extra}")
        return t, fn(*a)

    timeit("noop (latency floor)", lambda d: d.re[:1, :1] + 0.0, dev)
    t, cand = timeit("detect (device)",
                     lambda d: FE.detect_plateaus_strided(
                         FE.stf_metric_strided(d[0]), max_out=3 * B), dev)
    from gr_ieee80211_tpu.runtime import native as NAT
    if NAT.available():
        NAT.stf_detect(stream, max_out=3 * B)
        t0 = time.perf_counter()
        for _ in range(5):
            trigs = NAT.stf_detect(stream, max_out=3 * B)
        t = (time.perf_counter() - t0) / 5
        print(f"{'detect (native host)':22s} {t*1e3:8.2f} ms   "
              f"{n_iq/t/1e6:6.0f} Msamp/s")
        trigs = np.asarray(trigs[:B], np.int32)
    else:
        c = np.asarray(cand)
        trigs = RXM.dedup_triggers(c[c >= 0])[:B]
    pad = np.zeros(B, np.int32)
    pad[: len(trigs)] = trigs
    trigs_j = jnp.asarray(pad)

    t, (ltf_idx, peak, cfo, _rssi) = timeit(
        "sync/CFO", lambda d, tr: RXM._sync_core(d, tr), dev[0], trigs_j)

    t, ok = timeit("payload (all)",
                   lambda d, li, cf: RXM._payload_core(
                       cfg, d, li, cf, nrx=1, mpdu_len=len(mpdu))["mpdu_fcs_ok"],
                   dev, ltf_idx, cfo,
                   extra=f"(B={B})")
    print(f"{'':22s}            ok="
          f"{int(np.asarray(ok).sum())}/{B}")

    ds = RXM._data_start(cfg)
    n_need = ds + 80 * cfg.nsym

    def demod(dev, ltf_idx, cfo):
        xs = cstack([FE.derotate_batch(dev[0], ltf_idx, cfo, n_need)], axis=1)
        h, ph = OF.nl_chanest(xs, 208 + 160 + 80, cfg.nltf, cfg.nss,
                              nrx_axis=True)
        grids = cstack([OF.extract_sym_windows(xs[:, 0], ds, cfg.nsym)], axis=1)
        grids = OF.fft_syms(grids)
        llr = OF.equalize_and_demap(grids, h, ph, cfg, nrx_axis=True)
        coded = OF.deinterleave_deparse(llr, cfg)
        return VXLA.depuncture(coded, cfg.cr, cfg.n_trellis)

    t, pairs = timeit("  demod->llr pairs", demod, dev, ltf_idx, cfo)

    Bp = -(-B // B_TILE) * B_TILE
    Tt = pairs.shape[1]
    Tp = -(-Tt // T_CHUNK) * T_CHUNK
    x = jnp.pad(pairs, ((0, Bp - B), (0, Tp - Tt), (0, 0)))
    llr0 = jnp.asarray(x[:, :, 0].transpose(1, 0))
    llr1 = jnp.asarray(x[:, :, 1].transpose(1, 0))
    t, (dlo, dhi, _pm) = timeit("  viterbi ACS", lambda a, b: acs_sweep(a, b),
                                llr0, llr1,
                                extra=f"(trellis {Tt})")
    t, bits = timeit("  traceback",
                     lambda a, b: traceback_sweep(a, b), dlo, dhi)

    def post(bits):
        b = bits.transpose(1, 0)[:B, :Tt].astype(jnp.uint8)
        data = OF.descramble_bits(b)
        psdu_bits = data[:, 16: 16 + 8 * cfg.psdu_len]
        mpdu_bits = psdu_bits[:, 32: 32 + 8 * len(mpdu)]
        return CRC.fcs_ok_batch(mpdu_bits, 8 * len(mpdu))

    t, ok2 = timeit("  descramble+crc", post, bits)
    print(f"{'':22s}            ok={int(np.asarray(ok2).sum())}/{B}")


if __name__ == "__main__":
    main()
