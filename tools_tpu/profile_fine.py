"""Fine-grained sub-stage timing of sync and payload demod (TPU).

profile_quick's 3-way split showed sync ~15 ms and demod+decode ~17 ms at
B=4096 (round 3); this drills into the pieces to aim the next kernel work:
window gathers, fine-sync metric, CFO, derotation, chanest/equalize/demap,
deinterleave, algebraic inverse+syndrome, descramble+CRC.

Methodology per CLAUDE.md: every stage timed by jitting sum(out[...:1]) and
pulling the float (the tunneled backend's block_until_ready does not block);
numbers include one ~26 ms relay round trip — subtract the noop line.
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
    from gr_ieee80211_tpu.ops import fastdecode as FD
    from gr_ieee80211_tpu.ops import crc as CRC
    from gr_ieee80211_tpu.ops.cplx import from_host, cstack, CF

    B = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
    rng = np.random.default_rng(1)
    payload = bytes(rng.integers(0, 256, 500, dtype=np.uint8))
    mpdu = mac.qos_data_frame(payload, "f4:69:d5:80:0f:a0",
                              "00:c0:ca:b1:5b:e1", "f4:69:d5:80:0f:a0", 7)
    am = mac.ampdu_aggregate_vht([mpdu])
    cfg = PhyConfig(Fmt.VHT, 7, 1, len(am), ampdu=True)
    wave = tx.tx_waveform(cfg, am, group_id=0, partial_aid=0)[0]
    spacing = len(wave) + 240
    stream = np.zeros(B * spacing + 2048, np.complex64)
    w = channel.apply_cfo(wave, 900.0).astype(np.complex64)
    for i in range(B):
        stream[1024 + i * spacing: 1024 + i * spacing + len(wave)] = w
    rms = float(np.sqrt(np.mean(np.abs(wave) ** 2)))
    stream += (rng.normal(size=len(stream)) + 1j * rng.normal(size=len(stream))
               ).astype(np.complex64) * (rms / 10 ** (32 / 20) / np.sqrt(2))
    dev = from_host(stream[None])
    trigs_np = np.asarray([1024 + i * spacing for i in range(B)], np.int32)
    trigs = jnp.asarray(trigs_np)
    print(f"backend={jax.default_backend()} B={B}", flush=True)

    def timeit(name, fn, *a, n=12):
        # pipelined: queue n dispatches, ONE readback at the end — the ~26 ms
        # relay round trip amortizes to ~2 ms/call; per-call device time is
        # the drain rate (block_until_ready does not block on this backend)
        s = jax.jit(lambda *a: jnp.sum(
            jax.tree_util.tree_leaves(fn(*a))[0][..., :1].astype(jnp.float32)))
        float(s(*a))
        t0 = time.perf_counter()
        rs = [s(*a) for _ in range(n)]
        float(rs[-1])
        t = (time.perf_counter() - t0) / n
        print(f"{name:28s} {t*1e3:8.2f} ms", flush=True)
        return fn(*a)

    timeit("noop", lambda d: d.re[:1, :1] + 0.0, dev)
    wins = timeit("sync: gather464 bf16",
                  lambda d, tr: FE.gather_windows_bf16(d[0], tr, 464),
                  dev, trigs)
    timeit("sync: ltf_fine_sync",
           lambda w: FE.ltf_fine_sync(w[:, 80:448]), wins)
    timeit("sync: full _sync_core", lambda d, tr: RXM._sync_core(d[0], tr),
           dev, trigs)
    ltf_idx, peak, cfo = RXM._sync_core(dev[0], trigs)

    ds = RXM._data_start(cfg)
    n_need = ds + 80 * cfg.nsym + 16
    timeit("payload: gather bf16",
           lambda d, li: FE.gather_windows_bf16(d[0], li, n_need),
           dev, ltf_idx)
    xs1 = timeit("payload: gather+derotate",
                 lambda d, li, cf: FE.derotate_batch(d[0], li, cf, n_need,
                                                     low_prec=True),
                 dev, ltf_idx, cfo)
    xs = cstack([xs1], axis=1)

    def to_coded(xs):
        h, ph = OF.nl_chanest(xs, 208 + 160 + 80, cfg.nltf, cfg.nss,
                              nrx_axis=True)
        grids = cstack([OF.extract_sym_windows(xs[:, 0], ds, cfg.nsym)],
                       axis=1)
        grids = OF.fft_syms(grids)
        llr = OF.equalize_and_demap(grids, h, ph, cfg, nrx_axis=True)
        return OF.deinterleave_deparse(llr, cfg)

    coded = timeit("payload: chanest..deintlv", to_coded, xs)
    d8, syn = timeit(
        "payload: inverse+syndrome",
        lambda c: FD.inverse_and_syndrome(c, cfg.cr, cfg.n_trellis), coded)
    print(f"{'':28s} n_fail={int(np.asarray(jnp.sum((syn > 0).astype(jnp.int32))))}",
          flush=True)

    def post(bits):
        data = OF.descramble_bits(bits)
        psdu_bits = data[:, 16: 16 + 8 * cfg.psdu_len]
        mpdu_bits = psdu_bits[:, 32: 32 + 8 * len(mpdu)]
        return CRC.fcs_ok_batch(mpdu_bits, 8 * len(mpdu))

    ok = timeit("payload: descramble+crc", post, d8)
    print(f"{'':28s} ok={int(np.asarray(ok).sum())}/{B}", flush=True)


if __name__ == "__main__":
    main()
