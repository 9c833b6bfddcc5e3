"""MAC layer parity with reference mac80211 golden vectors."""
import numpy as np

from gr_ieee80211_tpu.gold import mac as M
from gr_ieee80211_tpu.gold.bits import fcs_ok


def test_qos_data_frame(golden):
    wire = golden["mac_wire"].tobytes()
    ref = golden["mac_mpdu"].tobytes()
    mine = M.qos_data_frame(wire, "f4:69:d5:80:0f:a0", "00:c0:ca:b1:5b:e1",
                            "f4:69:d5:80:0f:a0", 2704)
    assert mine == ref
    assert fcs_ok(mine)


def test_llc_ip_udp(golden):
    inner = golden["mac_inner"].tobytes()
    ref = golden["mac_wire"].tobytes()
    mine = M.llc_ip_udp(inner, "192.168.13.1", "192.168.13.2", 52001, 52002,
                        ip_id=0x01AB, ttl=64)
    assert mine == ref


def test_ampdu_vht_single(golden):
    mpdu = golden["mac_mpdu"].tobytes()
    ref = golden["mac_ampdu_vht1"].tobytes()
    assert M.ampdu_aggregate_vht([mpdu]) == ref
    out = M.ampdu_deaggregate(ref)
    assert out == [mpdu]


def test_ampdu_vht_two(golden):
    mpdu = golden["mac_mpdu"].tobytes()
    ref = golden["mac_ampdu_vht2"].tobytes()
    assert M.ampdu_aggregate_vht([mpdu, mpdu[:60]]) == ref
    out = M.ampdu_deaggregate(ref)
    # second sub-mpdu is a truncated frame: FCS fails, only first survives
    assert out == [mpdu]


def test_ampdu_ht_two(golden):
    mpdu = golden["mac_mpdu"].tobytes()
    ref = golden["mac_ampdu_ht2"].tobytes()
    assert M.ampdu_aggregate_ht([mpdu, mpdu[:60]]) == ref


def test_ndp_announcement(golden):
    ref = golden["mac_ndpa"].tobytes()
    mine = M.ndp_announcement("6e:1b:72:2a:1c:b8", "00:27:e3:9d:e8:9c", 23, [100], [0])
    assert mine == ref


def test_deaggregate_with_eof_padding():
    from gr_ieee80211_tpu.spec import tables as T
    mpdu = M.qos_data_frame(b"payload-bytes" * 5, "02:00:00:00:00:01",
                            "02:00:00:00:00:02", "02:00:00:00:00:01", 7)
    psdu = M.ampdu_aggregate_vht([mpdu])
    psdu += T.bits_to_bytes(T.VHT_EOF_BITS) * 3  # PHY EOF pad subframes
    assert M.ampdu_deaggregate(psdu) == [mpdu]
