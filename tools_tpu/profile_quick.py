"""Coarse RX-chain stage split by program differencing (3 compiles).

The full per-stage profiler (profile_chain.py) compiles ~10 programs,
which the remote-compile relay cannot finish in a sane budget; this one
times three nested prefixes of the fused chain and reports differences:

    detect            = T(detect)
    sync (+dedup)     = T(detect+sync) - T(detect)
    demod+decode      = T(full chain)  - T(detect+sync)

Each prefix returns scalars, so the ~26 ms relay round trip is one
readback per call; subtract the noop line for pure device time.
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
    from gr_ieee80211_tpu.ops import frontend as FE
    from gr_ieee80211_tpu.ops.cplx import from_host

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
    dev = from_host(stream[None])
    print(f"backend={jax.default_backend()} B={B}", flush=True)

    @jax.jit
    def p_detect(stream):
        m4 = FE.stf_metric_strided(stream[0])
        cand = FE.detect_plateaus_strided(m4, max_out=3 * B)
        trigs = FE.dedup_triggers_device(cand, B,
                                         spacing=RXM.TRIG_DEDUP_SPACING)
        return jnp.sum(trigs), jnp.sum((trigs >= 0).astype(jnp.int32))

    @jax.jit
    def p_sync(stream):
        m4 = FE.stf_metric_strided(stream[0])
        cand = FE.detect_plateaus_strided(m4, max_out=3 * B)
        trigs = FE.dedup_triggers_device(cand, B,
                                         spacing=RXM.TRIG_DEDUP_SPACING)
        ltf_idx, peak, cfo = RXM._sync_core(stream[0],
                                            jnp.maximum(trigs, 0))
        return jnp.sum(ltf_idx), jnp.sum(peak), jnp.sum(cfo)

    def p_full(stream):
        return RXM.rx_chain_count(cfg, stream, nrx=1, mpdu_len=len(mpdu),
                                  max_pkts=B)

    def timeit(name, fn, n=8):
        t_c0 = time.perf_counter()
        out = [float(np.asarray(x)) for x in fn(dev)]
        print(f"{name:14s} compile+run {time.perf_counter()-t_c0:6.1f} s  "
              f"out={out}", flush=True)
        t0 = time.perf_counter()
        for _ in range(n):
            r = fn(dev)
        float(np.asarray(r[0]))
        # steady state: all dispatches pipelined, one final readback
        t = (time.perf_counter() - t0) / n
        print(f"{name:14s} {t*1e3:8.2f} ms/call", flush=True)
        return t

    td = timeit("detect", p_detect)
    ts = timeit("detect+sync", p_sync)
    tf = timeit("full chain", p_full)
    print(f"\nsplit:  detect {td*1e3:6.2f}   sync {max(ts-td,0)*1e3:6.2f}   "
          f"demod+decode {max(tf-ts,0)*1e3:6.2f}   total {tf*1e3:6.2f} ms",
          flush=True)


if __name__ == "__main__":
    main()
