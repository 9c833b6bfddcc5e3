"""Per-stage timing of the RX chain on the current backend.

Times each jitted stage of the bench configuration (VHT MCS7, 500 B,
B packets) in isolation: device detection, native host detection, sync/CFO,
payload demod (FFT+equalize+LLR+deinterleave), Viterbi ACS, traceback,
descramble+CRC.  Used to aim kernel optimization; mirrors the reference's
per-block clock-tick tables (tools/performance/Gr_WiFi_Time_Complexity_Report).
"""
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def timeit(fn, *args, n=5):
    import jax
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
        jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n, out


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
    from gr_ieee80211_tpu.ops.cplx import from_host, cstack
    from gr_ieee80211_tpu.ops.viterbi_pallas import acs_sweep, _traceback

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

    # --- detection ---------------------------------------------------------
    @jax.jit
    def detect(dev):
        m4 = FE.stf_metric_strided(dev[0])
        return FE.detect_plateaus_strided(m4, max_out=3 * B)

    t, cand = timeit(detect, dev)
    print(f"detect (device)        {t*1e3:8.2f} ms   {n_iq/t/1e6:7.0f} Msamp/s")
    from gr_ieee80211_tpu.runtime import native as NAT
    if NAT.available():
        t0 = time.perf_counter()
        for _ in range(5):
            trigs = NAT.stf_detect(stream, max_out=3 * B)
        t = (time.perf_counter() - t0) / 5
        print(f"detect (native host)   {t*1e3:8.2f} ms   {n_iq/t/1e6:7.0f} Msamp/s")
        trigs = np.asarray(trigs[:B], np.int32)
    else:
        c = np.asarray(cand)
        trigs = RXM.dedup_triggers(c[c >= 0])[:B]
    pad = np.zeros(B, np.int32)
    pad[: len(trigs)] = trigs
    trigs_j = jnp.asarray(pad)

    # --- sync --------------------------------------------------------------
    t, (ltf_idx, peak, cfo) = timeit(RXM._sync_core, dev[0], trigs_j)
    print(f"sync/CFO               {t*1e3:8.2f} ms   {B/t:9.0f} pkt/s")

    # --- payload end-to-end --------------------------------------------
    pay = jax.jit(lambda d, li, cf: RXM._payload_core(
        cfg, d, li, cf, nrx=1, mpdu_len=len(mpdu))["mpdu_fcs_ok"])
    t, ok = timeit(pay, dev, ltf_idx, cfo)
    print(f"payload (all)          {t*1e3:8.2f} ms   {B/t:9.0f} pkt/s   "
          f"ok={int(np.asarray(ok).sum())}/{B}")

    # --- payload sub-stages -------------------------------------------------
    ds = RXM._data_start(cfg)
    n_need = ds + 80 * cfg.nsym

    @jax.jit
    def demod(dev, ltf_idx, cfo):
        xs = cstack([FE.derotate_batch(dev[0], ltf_idx, cfo, n_need)], axis=1)
        h, ph = OF.nl_chanest(xs, 208 + 160 + 80, cfg.nltf, cfg.nss,
                              nrx_axis=True)
        grids = cstack([OF.extract_sym_windows(xs[:, 0], ds, cfg.nsym)], axis=1)
        grids = OF.fft_syms(grids)
        llr = OF.equalize_and_demap(grids, h, ph, cfg, nrx_axis=True)
        coded = OF.deinterleave_deparse(llr, cfg)
        return VXLA.depuncture(coded, cfg.cr, cfg.n_trellis)

    t, pairs = timeit(demod, dev, ltf_idx, cfo)
    print(f"  demod->llr pairs     {t*1e3:8.2f} ms   {B/t:9.0f} pkt/s")

    Bp = -(-B // 128) * 128
    Tt = pairs.shape[1]
    Tp = -(-Tt // 128) * 128
    x = jnp.pad(pairs, ((0, Bp - B), (0, Tp - Tt), (0, 0)))
    llr0 = jnp.asarray(x[:, :, 0].transpose(1, 0))
    llr1 = jnp.asarray(x[:, :, 1].transpose(1, 0))
    t, dec = timeit(lambda a, b: acs_sweep(a, b), llr0, llr1)
    steps = Tp * Bp * 64
    print(f"  viterbi ACS          {t*1e3:8.2f} ms   {B/t:9.0f} pkt/s   "
          f"({steps/t/1e9:.0f} Gstate/s, trellis {Tt})")
    t, bits = timeit(lambda d: _traceback(d, Tt), dec)
    print(f"  traceback            {t*1e3:8.2f} ms   {B/t:9.0f} pkt/s")

    @jax.jit
    def post(bits):
        data = OF.descramble_bits(bits[:B])
        psdu_bits = data[:, 16: 16 + 8 * cfg.psdu_len]
        from gr_ieee80211_tpu.ops import crc as CRC
        mpdu_bits = psdu_bits[:, 32: 32 + 8 * len(mpdu)]
        return CRC.fcs_ok_batch(mpdu_bits, 8 * len(mpdu))

    t, ok2 = timeit(post, bits)
    print(f"  descramble+crc       {t*1e3:8.2f} ms   {B/t:9.0f} pkt/s   "
          f"ok={int(np.asarray(ok2).sum())}/{B}")


if __name__ == "__main__":
    main()
