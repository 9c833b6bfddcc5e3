"""Streaming executors: the rx.grc / tx.grc flowgraph equivalents.

The reference runs its PHY as GNU Radio flowgraphs — a scheduler moving an
unbounded sample stream through per-block state machines.  Here the same
roles are a handful of explicit pieces:

* ingest: the native C++ :class:`~.native.UdpIngest` thread (or a file
  replayer) fills an SPSC :class:`~.native.IqRing`;
* :class:`RxStreamer` pulls fixed-size overlap-save blocks from the ring
  (halo >= packet span so boundary-straddling packets decode), runs the
  batched :class:`~..models.rx.RxEngine` per block on the accelerator, and
  publishes decoded MPDUs / NDP channel reports over the reference UDP wire
  (:9527) via :class:`~.udp_phy.PhyRxReporter`;
* :class:`TxStreamer` is the :class:`~.udp_phy.PhyTxServer` sink that frames
  synthesized bursts into a continuous sample stream (file or UDP cf32),
  the pad/pad2 + USRP-sink role.

Ownership rule across blocks: a packet belongs to the block where its
trigger fell; triggers inside the halo are left for the next block (the
ring's read pointer only advances by the block length).
"""
from __future__ import annotations

import socket
import threading
import time

import numpy as np

from . import native as NAT
from .udp_phy import PhyRxReporter


class RxStreamer(threading.Thread):
    """Continuously decode an IqRing in overlap-save blocks.

    halo must cover the longest expected packet plus sync lookahead
    (MCS0 500 B VHT ~= 14k samples; default 16384).
    """

    def __init__(self, ring: NAT.IqRing, engine, block_len: int = 1 << 19,
                 halo: int = 16384, reporter: PhyRxReporter | None = None,
                 on_result=None, poll_s: float = 0.01):
        super().__init__(daemon=True)
        self.ring = ring
        self.engine = engine
        self.block_len = block_len
        self.halo = halo
        self.reporter = reporter
        self.on_result = on_result
        self.poll_s = poll_s
        self.n_blocks = 0
        self.n_packets = 0
        self.n_ok = 0
        #: per-(fmt, mcs) [ok, total] counters — the reference decode
        #: block's printed per-MCS tallies are its measurement API
        #: (lib/decode_impl.cc:393-411); here they are a queryable dict
        self.counters: dict[tuple, list[int]] = {}
        self._stop_evt = threading.Event()

    def stop(self, drain: bool = False, timeout: float = 60.0):
        if drain:
            # keep topping the ring up with silence until every real sample
            # has been inside some block's private (non-halo) span
            deadline = time.time() + timeout
            while time.time() < deadline:
                fill = self.ring.fill
                if fill <= self.halo + 16:
                    break                      # only padding remains
                need = self.block_len + self.halo + 16 - fill
                if need > 0:
                    self.ring.write(np.zeros(need, np.complex64))
                time.sleep(self.poll_s)
        self._stop_evt.set()

    #: left-context samples prepended to every block so a plateau straddling
    #: the previous boundary is not re-detected as a fresh edge start (same
    #: fix as parallel.mesh.rx_chain_sp's LH halo); must exceed the STF span
    LCTX = 256

    def _process_block(self, block: np.ndarray, t0: int):
        view = np.concatenate([self._lctx, block])
        first = not self._saw_block
        self._saw_block = True
        self._lctx = block[self.block_len - self.LCTX: self.block_len]
        res = self.engine.process(view)
        lo = 0 if first else self.LCTX   # block 0 owns its zero left pad too
        for r in res:
            # ownership by the TRIGGER index: packets triggering in the left
            # context belong to the previous block, packets triggering in
            # the right halo to the next
            if not (lo <= r.trig < self.LCTX + self.block_len):
                continue
            r.trig -= self.LCTX
            r.start -= self.LCTX
            self.n_packets += 1
            c = self.counters.setdefault((r.fmt, r.mcs), [0, 0])
            c[1] += 1
            if r.ok:
                self.n_ok += 1
                c[0] += 1
            r.start += t0         # absolute sample index in the stream
            r.trig += t0
            if self.reporter is not None and r.ok:
                self.reporter.report(r)
            if self.on_result is not None:
                self.on_result(r)

    def run(self):
        t0 = 0
        self.error = None
        self._lctx = np.zeros(self.LCTX, np.complex64)
        self._saw_block = False
        try:
            while not self._stop_evt.is_set():
                block = self.ring.read_block(self.block_len, self.halo)
                if block is None:
                    time.sleep(self.poll_s)
                    continue
                self._process_block(block, t0)
                t0 += self.block_len
                self.n_blocks += 1
        except Exception as e:          # surface thread death to the owner
            self.error = e
            raise


class TxStreamer:
    """PhyTxServer sink: frame bursts into a continuous cf32 stream.

    Mirrors pad/pad2's burst framing (preamble already inside the waveform;
    this adds inter-burst gaps) and the flowgraph's sample sink — either a
    file or interleaved-cf32 UDP datagrams (pairs with UdpIngest on the RX
    side for loopback).
    """

    def __init__(self, path: str | None = None,
                 udp_addr: tuple[str, int] | None = None, gap: int = 1200,
                 amp: float = 1.0):
        self.gap = gap
        self.amp = amp
        self._f = open(path, "ab") if path else None
        self._sock = socket.socket(socket.AF_INET, socket.SOCK_DGRAM) \
            if udp_addr else None
        self._addr = udp_addr
        self.n_bursts = 0

    def __call__(self, waveform: np.ndarray, req=None):
        w = np.atleast_2d(np.asarray(waveform, np.complex64))[0] * self.amp
        burst = np.concatenate(
            [w, np.zeros(self.gap, np.complex64)]).astype(np.complex64)
        if self._f is not None:
            burst.tofile(self._f)
            self._f.flush()
        if self._sock is not None:
            raw = burst.tobytes()
            # keep datagrams under typical 64 KiB limits: 4096 samples each
            step = 4096 * 8
            for o in range(0, len(raw), step):
                self._sock.sendto(raw[o: o + step], self._addr)
        self.n_bursts += 1

    def close(self):
        if self._f:
            self._f.close()
        if self._sock:
            self._sock.close()
