"""Sample-file I/O in GNU Radio interleaved complex-float32 format.

Byte-compatible with the reference's ``genSigBinFile`` /
``procLoadComplexBin`` (``/root/reference/tools/phy80211.py:1037-1061``,
``phy80211header.py:1380-1391``) so waveforms interchange with GR flowgraphs
(file_source / file_sink at 20 Msps).
"""
from __future__ import annotations

import numpy as np


def write_cf32(path: str, samples: np.ndarray) -> None:
    """Write a 1-D complex stream as interleaved float32 (re, im)."""
    np.asarray(samples, dtype=np.complex64).tofile(path)


def read_cf32(path: str) -> np.ndarray:
    return np.fromfile(path, dtype=np.complex64)


def write_streams(prefix: str, ss_sig: np.ndarray) -> list[str]:
    """Write one file per stream using the reference's naming convention:
    ``{prefix}_{nss}x{nss}_{i}.bin``."""
    ss_sig = np.atleast_2d(ss_sig)
    nss = ss_sig.shape[0]
    paths = []
    for i in range(nss):
        p = f"{prefix}_{nss}x{nss}_{i}.bin"
        write_cf32(p, ss_sig[i])
        paths.append(p)
    return paths
