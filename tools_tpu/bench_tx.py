"""TX throughput: batched device waveform synthesis, VHT MCS7 500 B.

The reference TX chain (pktgen -> encode -> modulation -> IFFT/CP -> pad)
runs one packet at a time through GR blocks; here a whole batch synthesizes
as one XLA program (scramble/BCC/interleave as XOR-matmuls and gathers,
QAM map, pilots, MXU IDFT, GI/preamble assembly).

Prints one JSON line (packets/s and samples/s) to stdout.
"""
import json
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
    from gr_ieee80211_tpu.gold import mac
    from gr_ieee80211_tpu.models.tx import tx_batch

    B = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
    rng = np.random.default_rng(3)
    payload = bytes(rng.integers(0, 256, 500, dtype=np.uint8))
    mpdu = mac.qos_data_frame(payload, "f4:69:d5:80:0f:a0",
                              "00:c0:ca:b1:5b:e1", "f4:69:d5:80:0f:a0", 7)
    am = mac.ampdu_aggregate_vht([mpdu])
    cfg = PhyConfig(Fmt.VHT, 7, 1, len(am), ampdu=True)
    arr = jnp.asarray(np.tile(np.frombuffer(am, np.uint8), (B, 1)))
    seeds = jnp.asarray((np.arange(B) % 127 + 1).astype(np.int32))

    f = jax.jit(lambda a, s: jnp.sum(
        tx_batch(cfg, a, s, 0, 0).re[..., :1]))
    float(f(arr, seeds))
    n_rep = 10
    t0 = time.perf_counter()
    outs = [f(arr, seeds) for _ in range(n_rep)]
    float(outs[-1])
    dt = (time.perf_counter() - t0) / n_rep
    wave = tx_batch(cfg, arr[:1], seeds[:1], 0, 0)
    n_samp = wave.re.shape[-1]
    print(f"{dt*1e3:.1f} ms/batch of {B}; wave {n_samp} samples/pkt",
          file=sys.stderr)
    print(json.dumps({
        "metric": "tx_synthesis_packets_per_s_per_chip_vht_mcs7_500B",
        "value": round(B / dt, 1), "unit": "packets/s",
        "samples_per_s": round(B * n_samp / dt)}))


if __name__ == "__main__":
    main()
