"""Gorilla-style segment codec: delta-of-delta timestamps + XOR floats.

From the published Gorilla paper (Pelkonen et al., VLDB 2015, "Gorilla:
A Fast, Scalable, In-Memory Time Series Database") — engine addition
per the north rule; the reference has no storage layer.

Layout per segment (one (conv_id, series, bucket) group):
  header:  n (uint32) | t0 (int64, µs) | v0 (float64 raw bits)
  then for i>=1 interleaved: timestamp token, value token.

Timestamp delta-of-delta tokens (µs-resolution variant — wider windows
than the paper's seconds-resolution table, same prefix scheme):
  '0'                      dod == 0
  '10'  + 14-bit zigzag    |dod| < 2^13
  '110' + 24-bit zigzag    |dod| < 2^23
  '1110'+ 36-bit zigzag    |dod| < 2^35
  '1111'+ 64-bit zigzag    otherwise

Value XOR tokens (paper scheme):
  '0'                      xor == 0
  '10' + bits              meaningful bits fit previous leading/length
                           window: reuse window, emit that many bits
  '11' + 5-bit lead + 6-bit len + bits   new window

Pure Python/numpy bit packing — runs inside Arrow workers per segment
(segments are bucket-sized: hundreds to thousands of points), so the
per-point Python cost is amortized per batch, not per row.
"""

from __future__ import annotations

import numpy as np


class _BitWriter:
    __slots__ = ("buf", "cur", "nbits")

    def __init__(self) -> None:
        self.buf = bytearray()
        self.cur = 0
        self.nbits = 0

    def write(self, value: int, bits: int) -> None:
        self.cur = (self.cur << bits) | (value & ((1 << bits) - 1))
        self.nbits += bits
        while self.nbits >= 8:
            self.nbits -= 8
            self.buf.append((self.cur >> self.nbits) & 0xFF)
        self.cur &= (1 << self.nbits) - 1

    def finish(self) -> bytes:
        if self.nbits:
            self.buf.append((self.cur << (8 - self.nbits)) & 0xFF)
            self.cur, self.nbits = 0, 0
        return bytes(self.buf)


class _BitReader:
    __slots__ = ("data", "pos")

    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0

    def read(self, bits: int) -> int:
        out = 0
        for _ in range(bits):
            byte = self.data[self.pos >> 3]
            out = (out << 1) | ((byte >> (7 - (self.pos & 7))) & 1)
            self.pos += 1
        return out


def _zigzag(v: int) -> int:
    return (v << 1) ^ (v >> 63)


def _unzigzag(v: int) -> int:
    return (v >> 1) ^ -(v & 1)


_DOD_PLAN = ((14, 0b10, 2), (24, 0b110, 3), (36, 0b1110, 4))


def encode_segment(ts_us: np.ndarray, values: np.ndarray) -> bytes:
    """Encode aligned int64-µs timestamps + float64 values."""
    t = np.asarray(ts_us, dtype=np.int64)
    v = np.asarray(values, dtype=np.float64)
    assert t.size == v.size
    n = t.size
    w = _BitWriter()
    w.write(n, 32)
    if n == 0:
        return w.finish()
    w.write(int(t[0]) & ((1 << 64) - 1), 64)
    vbits = v.view(np.uint64)
    w.write(int(vbits[0]), 64)

    prev_delta = 0
    prev_lead, prev_len = -1, 0
    for i in range(1, n):
        # --- timestamp: delta of delta
        delta = int(t[i]) - int(t[i - 1])
        dod = delta - prev_delta
        prev_delta = delta
        if dod == 0:
            w.write(0, 1)
        else:
            z = _zigzag(dod)
            for bits, prefix, plen in _DOD_PLAN:
                if z < (1 << bits):
                    w.write(prefix, plen)
                    w.write(z, bits)
                    break
            else:
                w.write(0b1111, 4)
                w.write(z, 64)
        # --- value: XOR
        x = int(vbits[i]) ^ int(vbits[i - 1])
        if x == 0:
            w.write(0, 1)
            continue
        lead = 64 - x.bit_length()
        trail = (x & -x).bit_length() - 1
        lead = min(lead, 31)
        if prev_lead >= 0 and lead >= prev_lead and trail >= 64 - prev_lead - prev_len:
            w.write(0b10, 2)
            w.write(x >> (64 - prev_lead - prev_len), prev_len)
        else:
            siglen = 64 - lead - trail
            w.write(0b11, 2)
            w.write(lead, 5)
            w.write(siglen & 0x3F, 6)  # 64 encodes as 0 (paper quirk)
            w.write(x >> trail, siglen)
            prev_lead, prev_len = lead, siglen
    return w.finish()


def decode_segment(data: bytes) -> tuple[np.ndarray, np.ndarray]:
    """Inverse of encode_segment -> (ts_us int64, values float64)."""
    r = _BitReader(data)
    n = r.read(32)
    ts = np.empty(n, dtype=np.int64)
    vb = np.empty(n, dtype=np.uint64)
    if n == 0:
        return ts, vb.view(np.float64)
    t0 = r.read(64)
    ts[0] = t0 - (1 << 64) if t0 >= (1 << 63) else t0
    vb[0] = r.read(64)
    prev_delta = 0
    prev_lead, prev_len = -1, 0
    for i in range(1, n):
        # timestamp
        if r.read(1) == 0:
            dod = 0
        else:
            if r.read(1) == 0:
                dod = _unzigzag(r.read(14))
            elif r.read(1) == 0:
                dod = _unzigzag(r.read(24))
            elif r.read(1) == 0:
                dod = _unzigzag(r.read(36))
            else:
                dod = _unzigzag(r.read(64))
        prev_delta += dod
        ts[i] = ts[i - 1] + prev_delta
        # value
        if r.read(1) == 0:
            vb[i] = vb[i - 1]
            continue
        if r.read(1) == 0:  # '10': reuse window
            bits = r.read(prev_len)
            x = bits << (64 - prev_lead - prev_len)
        else:  # '11': new window
            lead = r.read(5)
            siglen = r.read(6) or 64
            bits = r.read(siglen)
            trail = 64 - lead - siglen
            x = bits << trail
            prev_lead, prev_len = lead, siglen
        vb[i] = vb[i - 1] ^ np.uint64(x)
    return ts, vb.view(np.float64)
