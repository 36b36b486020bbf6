"""Minimal FLAC *encoder* for test fixtures (no flac/ffmpeg in env).

Emits spec-conformant fixed-blocksize FLAC streams so the first-party
native decoder (native/flac_decode.cc) can be round-trip-tested against
known samples. Supports exactly the feature matrix the decoder must
handle for LibriSpeech-shaped corpora:

- 16-bit samples, mono or stereo;
- subframe strategies per frame: constant / verbatim / fixed(0-2) with
  Rice residuals (incl. the escape/raw-partition code path) / a small
  LPC whose quantized coefficients mirror the fixed-2 predictor;
- stereo channel modes: independent or mid/side (side at bps+1);
- optional wasted-bits encoding;
- real CRC-8 (poly 0x07) and CRC-16 (poly 0x8005) so fixtures are
  valid for any conformant decoder, not just ours.

This is TEST-ONLY code: the framework itself never encodes FLAC.
"""

from __future__ import annotations

import numpy as np


class BitWriter:
    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, nbits: int):
        if nbits == 0:
            return
        value &= (1 << nbits) - 1
        self.acc = (self.acc << nbits) | value
        self.nbits += nbits
        while self.nbits >= 8:
            self.nbits -= 8
            self.buf.append((self.acc >> self.nbits) & 0xFF)
        self.acc &= (1 << self.nbits) - 1

    def write_signed(self, value: int, nbits: int):
        self.write(value & ((1 << nbits) - 1), nbits)

    def write_unary(self, q: int):
        while q >= 32:
            self.write(0, 32)
            q -= 32
        self.write(1, q + 1)  # q zeros then a 1

    def align(self):
        if self.nbits:
            self.write(0, 8 - self.nbits)

    def bytes(self) -> bytes:
        assert self.nbits == 0
        return bytes(self.buf)


def crc8(data: bytes) -> int:
    c = 0
    for b in data:
        c ^= b
        for _ in range(8):
            c = ((c << 1) ^ 0x07) & 0xFF if c & 0x80 else (c << 1) & 0xFF
    return c


def crc16(data: bytes) -> int:
    c = 0
    for b in data:
        c ^= b << 8
        for _ in range(8):
            c = ((c << 1) ^ 0x8005) & 0xFFFF if c & 0x8000 \
                else (c << 1) & 0xFFFF
    return c


def _utf8_coded(n: int) -> bytes:
    # FLAC's UTF-8-style frame number; tests keep n small but cover
    # the multi-byte branch.
    if n < 0x80:
        return bytes([n])
    if n < 0x800:
        return bytes([0xC0 | (n >> 6), 0x80 | (n & 0x3F)])
    if n < 0x10000:
        return bytes([0xE0 | (n >> 12), 0x80 | ((n >> 6) & 0x3F),
                      0x80 | (n & 0x3F)])
    raise ValueError("test frames stay small")


_FIXED_COEF = {0: [], 1: [1], 2: [2, -1]}


def _rice_encode(bw: BitWriter, residual, param: int, escape: bool,
                 raw_bits: int = 18):
    """One partition (order 0). escape=True writes the raw-bits form."""
    if escape:
        bw.write((1 << 4) - 1, 4)     # 0xF escape (RICE method)
        bw.write(raw_bits, 5)
        for r in residual:
            bw.write_signed(int(r), raw_bits)
        return
    bw.write(param, 4)
    for r in residual:
        r = int(r)
        v = (-r << 1) - 1 if r < 0 else (r << 1)  # zigzag
        bw.write_unary(v >> param)
        if param:
            bw.write(v & ((1 << param) - 1), param)


def _write_subframe(bw: BitWriter, x, bps: int, mode: str,
                    wasted: int = 0):
    """x: int array. With wasted>0, every sample must have that many
    low zero bits (caller guarantees)."""
    x = np.asarray(x, np.int64)
    if wasted:
        assert not np.any(x & ((1 << wasted) - 1))
        x = x >> wasted
    eff = bps - wasted

    def header(type_code: int):
        bw.write(0, 1)
        bw.write(type_code, 6)
        if wasted:
            bw.write(1, 1)
            bw.write_unary(wasted - 1)
        else:
            bw.write(0, 1)

    if mode == "constant":
        assert np.all(x == x[0])
        header(0)
        bw.write_signed(int(x[0]), eff)
    elif mode == "verbatim":
        header(1)
        for v in x:
            bw.write_signed(int(v), eff)
    elif mode == "fixed1_escape":
        header(8 + 1)
        bw.write_signed(int(x[0]), eff)
        res = np.diff(x.astype(np.int64))
        bw.write(0, 2)
        bw.write(0, 4)
        _rice_encode(bw, res, 0, escape=True, raw_bits=max(
            2, int(np.abs(res).max()).bit_length() + 1))
    elif mode.startswith("fixed"):
        order = int(mode[-1])
        coef = _FIXED_COEF[order]
        header(8 + order)
        for v in x[:order]:
            bw.write_signed(int(v), eff)
        res = x[order:].astype(np.int64).copy()
        for i in range(order, len(x)):
            pred = sum(c * int(x[i - 1 - j]) for j, c in enumerate(coef))
            res[i - order] = int(x[i]) - pred
        bw.write(0, 2)  # residual method: RICE (4-bit params)
        bw.write(0, 4)  # partition order 0
        zz = np.abs(res) * 2
        param = max(0, int(np.ceil(np.log2(max(1, int(zz.mean() + 1))))))
        param = min(param, 14)
        _rice_encode(bw, res, param, escape=False)
    elif mode == "lpc2":
        # order-2 LPC, precision 4, shift 1, coefficients [4, -2]>>1
        # == the fixed-2 predictor — exercises the LPC parse path with
        # exactly reproducible integer math.
        order, precision, shift, coef = 2, 4, 1, [4, -2]
        header(31 + order)
        for v in x[:order]:
            bw.write_signed(int(v), eff)
        bw.write(precision - 1, 4)
        bw.write_signed(shift, 5)
        for c in coef:
            bw.write_signed(c, precision)
        res = x[order:].astype(np.int64).copy()
        for i in range(order, len(x)):
            acc = coef[0] * int(x[i - 1]) + coef[1] * int(x[i - 2])
            res[i - order] = int(x[i]) - (acc >> shift)
        bw.write(0, 2)
        bw.write(0, 4)
        zz = np.abs(res) * 2
        param = max(0, int(np.ceil(np.log2(max(1, int(zz.mean() + 1))))))
        _rice_encode(bw, res, min(param, 14), escape=False)
    else:
        raise ValueError(mode)


def write_flac(path: str, samples: np.ndarray, sample_rate: int = 16000,
               blocksize: int = 256, mode: str = "fixed2",
               stereo_mode: str = "independent", wasted: int = 0):
    """samples: int16 array [N] (mono) or [N, 2] (stereo)."""
    samples = np.asarray(samples)
    stereo = samples.ndim == 2
    nch = 2 if stereo else 1
    n = samples.shape[0]
    bps = 16

    out = bytearray(b"fLaC")
    # STREAMINFO (last metadata block)
    si = BitWriter()
    si.write(blocksize, 16)
    si.write(blocksize, 16)
    si.write(0, 24)
    si.write(0, 24)
    si.write(sample_rate, 20)
    si.write(nch - 1, 3)
    si.write(bps - 1, 5)
    si.write(n, 36)
    si_bytes = si.bytes() + b"\x00" * 16  # MD5 unset (34 bytes total)
    out += bytes([0x80]) + len(si_bytes).to_bytes(3, "big") + si_bytes

    for fi, lo in enumerate(range(0, n, blocksize)):
        blk = samples[lo:lo + blocksize]
        bs = blk.shape[0]
        bw = BitWriter()
        bw.write(0x3FFE, 14)
        bw.write(0, 1)   # reserved
        bw.write(0, 1)   # fixed-blocksize stream
        bw.write(7, 4)   # blocksize: 16-bit follows
        bw.write(0, 4)   # sample rate: from STREAMINFO
        if stereo and stereo_mode == "mid_side":
            bw.write(10, 4)
        else:
            bw.write(nch - 1, 4)
        bw.write(4, 3)   # 16-bit samples
        bw.write(0, 1)   # reserved
        for byte in _utf8_coded(fi):
            bw.write(byte, 8)
        bw.write(bs - 1, 16)
        bw.align()
        hdr = bw.bytes()
        body = BitWriter()
        body.buf = bytearray(hdr)
        body.buf.append(crc8(hdr))

        if stereo and stereo_mode == "mid_side":
            left = blk[:, 0].astype(np.int64)
            right = blk[:, 1].astype(np.int64)
            mid = (left + right) >> 1
            side = left - right
            _write_subframe(body, mid, bps, mode)
            _write_subframe(body, side, bps + 1, mode)
        elif stereo:
            _write_subframe(body, blk[:, 0], bps, mode, wasted)
            _write_subframe(body, blk[:, 1], bps, mode, wasted)
        else:
            _write_subframe(body, blk, bps, mode, wasted)
        body.align()
        frame = body.bytes()
        out += frame + crc16(frame).to_bytes(2, "big")

    with open(path, "wb") as f:
        f.write(bytes(out))
