"""Fused single-dispatch MU-STA chain (models.rx.rx_chain_count_mu) and the
batched NDP channel-estimate dispatch."""
import numpy as np
import jax.numpy as jnp

from gr_ieee80211_tpu.spec.params import PhyConfig, Fmt, MuConfig
from gr_ieee80211_tpu.gold import tx, mac, channel, sounding
from gr_ieee80211_tpu.models import rx as RXM
from gr_ieee80211_tpu.ops.cplx import from_host


def _mu_stream(rng, n_pkts, h_sta):
    mpdu0 = mac.qos_data_frame(b"user zero data " * 8, "02:00:00:00:00:10",
                               "02:00:00:00:00:01", "02:00:00:00:00:10", 5)
    mpdu1 = mac.qos_data_frame(b"USER ONE DATA " * 6, "02:00:00:00:00:11",
                               "02:00:00:00:00:01", "02:00:00:00:00:11", 6)
    a0 = mac.ampdu_aggregate_vht([mpdu0])
    a1 = mac.ampdu_aggregate_vht([mpdu1])
    mu = MuConfig((PhyConfig(Fmt.VHT, 3, 1, len(a0), ampdu=True),
                   PhyConfig(Fmt.VHT, 2, 1, len(a1), ampdu=True)),
                  group_id=2)
    h_rows = np.repeat(np.stack(h_sta)[:, 0][:, :, None], 56, axis=2)
    q56 = sounding.zf_q(h_rows)
    wave = tx.tx_waveform_mu(mu, [a0, a1], sounding.q_to_grid(q56))
    burst = channel.mimo_channel(wave, h_sta[0])
    one = channel.frame_stream(burst, 1.0, 150.0, gap=400)[0]
    stream = np.concatenate([np.zeros(512, np.complex64)]
                            + [one.astype(np.complex64)] * n_pkts)
    stream = channel.awgn(stream, 0.012 / 10 ** (32 / 20), rng)
    return stream, mu, (mpdu0, mpdu1)


def test_rx_chain_count_mu_fused():
    rng = np.random.default_rng(11)
    h_sta = [(rng.normal(size=(1, 2)) + 1j * rng.normal(size=(1, 2)))
             / np.sqrt(2) for _ in range(2)]
    n_pkts = 3
    stream, mu, (mpdu0, _) = _mu_stream(rng, n_pkts, h_sta)
    u0 = mu.users[0]
    cfg = PhyConfig(Fmt.VHT, u0.mcs, 1, u0.psdu_len, ampdu=True,
                    mu_nsym=mu.nsym)
    dev = from_host(stream[None])
    n_ok, n_det = (int(x) for x in RXM.rx_chain_count_mu(
        cfg, dev, n_total=2, own=0, nrx=1, mpdu_len=len(mpdu0),
        max_pkts=16))
    assert n_det == n_pkts
    assert n_ok == n_pkts


def test_rx_chain_count_mu_rejects_wrong_mcs():
    rng = np.random.default_rng(12)
    h_sta = [(rng.normal(size=(1, 2)) + 1j * rng.normal(size=(1, 2)))
             / np.sqrt(2) for _ in range(2)]
    stream, mu, (mpdu0, _) = _mu_stream(rng, 2, h_sta)
    u0 = mu.users[0]
    # claim the wrong MCS: SIG-B mcs check must zero the ok count (the
    # payload shape happens to match only if nsym agrees; mcs 4 vs 3 keeps
    # nsym compatible only through mu_nsym, so the device check is the gate)
    cfg = PhyConfig(Fmt.VHT, u0.mcs + 1, 1, u0.psdu_len, ampdu=True,
                    mu_nsym=mu.nsym)
    dev = from_host(stream[None])
    n_ok, n_det = (int(x) for x in RXM.rx_chain_count_mu(
        cfg, dev, n_total=2, own=0, nrx=1, mpdu_len=len(mpdu0),
        max_pkts=16))
    assert n_det == 2
    assert n_ok == 0


def test_device_mu_tx_to_fused_mu_rx_loopback():
    """Full device loop: tx_batch_mu (device) -> ZF channel -> MU-STA chain."""
    from gr_ieee80211_tpu.models.tx import TxEngine
    rng = np.random.default_rng(14)
    h_sta = [(rng.normal(size=(1, 2)) + 1j * rng.normal(size=(1, 2)))
             / np.sqrt(2) for _ in range(2)]
    mpdu0 = mac.qos_data_frame(b"device mu user0 " * 7, "02:00:00:00:00:10",
                               "02:00:00:00:00:01", "02:00:00:00:00:10", 9)
    mpdu1 = mac.qos_data_frame(b"device mu user1 " * 5, "02:00:00:00:00:11",
                               "02:00:00:00:00:01", "02:00:00:00:00:11", 10)
    a0 = mac.ampdu_aggregate_vht([mpdu0])
    a1 = mac.ampdu_aggregate_vht([mpdu1])
    mu = MuConfig((PhyConfig(Fmt.VHT, 3, 1, len(a0), ampdu=True),
                   PhyConfig(Fmt.VHT, 2, 1, len(a1), ampdu=True)),
                  group_id=2)
    h_rows = np.repeat(np.stack(h_sta)[:, 0][:, :, None], 56, axis=2)
    q = sounding.q_to_grid(sounding.zf_q(h_rows))
    n_pkts = 3
    wave = TxEngine().tx_mu(mu, [[a0] * 1, [a1] * 1], q)[0]
    burst = channel.mimo_channel(wave, h_sta[0])
    one = channel.frame_stream(burst, 1.0, 150.0, gap=400)[0]
    stream = np.concatenate([np.zeros(512, np.complex64)]
                            + [one.astype(np.complex64)] * n_pkts)
    stream = channel.awgn(stream, 0.012 / 10 ** (32 / 20), rng)
    u0 = mu.users[0]
    cfg = PhyConfig(Fmt.VHT, u0.mcs, 1, u0.psdu_len, ampdu=True,
                    mu_nsym=mu.nsym)
    n_ok, n_det = (int(x) for x in RXM.rx_chain_count_mu(
        cfg, from_host(stream[None]), n_total=2, own=0, nrx=1,
        mpdu_len=len(mpdu0), max_pkts=16))
    assert n_det == n_pkts and n_ok == n_pkts


def test_ndp_chan_core_batched_matches_engine():
    rng = np.random.default_rng(13)
    h = (rng.normal(size=(2, 2)) + 1j * rng.normal(size=(2, 2))) / np.sqrt(2)
    ndp = tx.tx_waveform(PhyConfig(Fmt.VHT, 0, 2, 0, ampdu=True), b"",
                         group_id=0, partial_aid=0)
    burst = channel.mimo_channel(ndp, h)
    one = channel.frame_stream(burst, 1.0, 120.0, gap=400)
    stream = np.concatenate([np.zeros((2, 256), np.complex64)]
                            + [one.astype(np.complex64)] * 3, axis=1)
    stream = channel.awgn(stream, 0.01 / 10 ** (35 / 20), rng)
    eng = RXM.RxEngine(nrx=2)
    res = eng.process(stream)
    ndps = [r for r in res if r.is_ndp]
    assert len(ndps) == 3
    # all three NDP estimates must agree (same channel), shape (nrx, 2, 64)
    for r in ndps:
        assert r.ndp_chan.shape == (2, 2, 64)
    d01 = np.abs(ndps[0].ndp_chan - ndps[1].ndp_chan)
    assert d01.max() < 0.05
