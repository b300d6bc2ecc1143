"""Dependency-free baseline JPEG (ITU-T T.81) decode — pure numpy + Python
bit I/O, the same treatment PPM/BMP/WAV got (stages/media.py): the format is
a public byte-exact spec, so a decoder needs no codec library.

Scope (documented subset of baseline sequential DCT):

- 8-bit baseline sequential (SOF0), Huffman entropy coding, any number of
  components with sampling factors 1x1 (grayscale and 4:4:4 color); DQT /
  DHT / DRI / RSTn / APPn / COM segments handled; byte stuffing (FF 00)
  and marker-padded entropy segments per F.1.2.3.
- Progressive (SOF2), arithmetic coding and subsampled MCUs stay gated
  ``NotImplementedError`` — same policy as the other codec formats.

Output semantics: decoded samples are the COMPONENT planes (Y or Y/Cb/Cr)
after IDCT + level shift + clamp — feature sums are over component samples;
JFIF RGB conversion is a separate (decoder-choice) stage and deliberately
not part of the integer-exact contract.

The encoder half (``encode_jpeg_baseline``) exists to build REAL compressed
fixtures: it writes spec-valid files (canonical Huffman tables carried in
DHT, forward DCT + quantization) so tests can pin the decoder against
closed-form and coefficient-exact oracles. Reciprocal-bug risk is bounded
by the closed-form DC fixtures: a wrong bitstream convention on both sides
would still decode to the wrong pixel VALUES vs the symbolically-computed
oracle (__ray_entry__ media_features_jpeg twin).
"""

from __future__ import annotations

import numpy as np

# zigzag order: index i of the scan -> (row, col) flattened position
_ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int64)

_BASIS = None  # lazily-built 8x8 DCT basis (C(u)/2 * cos((2x+1)u pi / 16))


def _basis() -> np.ndarray:
    global _BASIS
    if _BASIS is None:
        u = np.arange(8).reshape(8, 1).astype(np.float64)
        x = np.arange(8).reshape(1, 8).astype(np.float64)
        b = 0.5 * np.cos((2 * x + 1) * u * np.pi / 16)
        b[0, :] *= 1 / np.sqrt(2.0)
        _BASIS = b
    return _BASIS


def idct_block(coeffs: np.ndarray) -> np.ndarray:
    """2D 8x8 inverse DCT (T.81 A.3.3), float64: s = B^T F B."""
    b = _basis()
    return b.T @ coeffs.astype(np.float64) @ b


def fdct_block(samples: np.ndarray) -> np.ndarray:
    """2D 8x8 forward DCT of level-shifted samples: F = B s B^T."""
    b = _basis()
    return b @ samples.astype(np.float64) @ b.T


def _canonical_table(symbols: list[int]) -> tuple[list[int], list[int]]:
    """(BITS[1..16], HUFFVAL) for a canonical, INCOMPLETE Huffman code over
    ``symbols``: with K symbols and L = ceil(log2(K+1)), assign
    2^L - K - 1 codes of length L-1 and the rest length L — Kraft < 1, so
    the all-ones codeword stays unused (the T.81 convention the standard
    tables follow)."""
    K = len(symbols)
    L = 1
    while (1 << L) < K + 1:
        L += 1
    a = max((1 << L) - K - 1, 0)
    bits = [0] * 16
    if L >= 2 and a > 0:
        bits[L - 2] = a
    bits[L - 1] = K - a
    return bits, list(symbols)


# fixed symbol inventories: DC categories 0..11; AC = EOB, (run 0..15 x
# size 1..10), ZRL — EOB first so it lands on a short code
DC_SYMBOLS = list(range(12))
AC_SYMBOLS = [0x00] + [
    (r << 4) | s for r in range(16) for s in range(1, 11)
] + [0xF0]


def _huff_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """symbol -> (code, length) per T.81 C.2 canonical generation."""
    out: dict[int, tuple[int, int]] = {}
    code = 0
    k = 0
    for ln in range(1, 17):
        for _ in range(bits[ln - 1]):
            out[vals[k]] = (code, ln)
            code += 1
            k += 1
        code <<= 1
    return out


class _BitWriter:
    def __init__(self):
        self.bytes = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            b = (self.acc >> (self.nbits - 8)) & 0xFF
            self.bytes.append(b)
            if b == 0xFF:
                self.bytes.append(0x00)  # byte stuffing
            self.nbits -= 8
        self.acc &= (1 << self.nbits) - 1

    def flush(self) -> None:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # 1-fill per F.1.2.3


def _category(v: int) -> int:
    return int(v).bit_length() if v > 0 else int(-v).bit_length()


def _encode_coeff_bits(v: int) -> tuple[int, int]:
    """(appended-bits value, category) per T.81 F.1.2.1/F.1.2.2: positives
    verbatim, negatives as v - 1 in ``category`` low bits."""
    s = _category(v)
    return (v if v >= 0 else v + (1 << s) - 1, s)


def encode_jpeg_baseline(
    planes: list[np.ndarray], quant: np.ndarray,
    restart_interval: int = 0,
) -> bytes:
    """Spec-valid baseline JPEG bytes for 1 or 3 same-sized component
    planes (uint8, dims multiples of 8; sampling 1x1 = grayscale / 4:4:4).
    One shared quantization table (64 entries, natural order) and one
    shared canonical DC + AC Huffman table pair carried in DHT."""
    h, w = planes[0].shape
    if any(p.shape != (h, w) for p in planes) or h % 8 or w % 8:
        raise ValueError("planes must share dims that are multiples of 8")
    nc = len(planes)
    q = np.asarray(quant, np.int64).reshape(64)
    if not ((1 <= q).all() and (q <= 255).all()):
        raise ValueError("quant entries must be 1..255")

    dc_bits, dc_vals = _canonical_table(DC_SYMBOLS)
    ac_bits, ac_vals = _canonical_table(AC_SYMBOLS)
    dc_code = _huff_codes(dc_bits, dc_vals)
    ac_code = _huff_codes(ac_bits, ac_vals)

    out = bytearray(b"\xff\xd8")  # SOI

    def seg(marker: int, body: bytes) -> None:
        out.extend(bytes([0xFF, marker]))
        out.extend((len(body) + 2).to_bytes(2, "big"))
        out.extend(body)

    seg(0xDB, bytes([0x00]) + bytes(int(q[_ZIGZAG[i]]) for i in range(64)))
    sof = bytes([8]) + h.to_bytes(2, "big") + w.to_bytes(2, "big") + bytes([nc])
    for c in range(nc):
        sof += bytes([c + 1, 0x11, 0])  # id, h=1/v=1, quant table 0
    seg(0xC0, sof)
    seg(0xC4, bytes([0x00]) + bytes(dc_bits) + bytes(dc_vals)
        + bytes([0x10]) + bytes(ac_bits) + bytes(ac_vals))
    if restart_interval:
        seg(0xDD, restart_interval.to_bytes(2, "big"))
    sos = bytes([nc])
    for c in range(nc):
        sos += bytes([c + 1, 0x00])  # DC table 0, AC table 0
    sos += bytes([0, 63, 0])
    seg(0xDA, sos)

    bw = _BitWriter()
    pred = [0] * nc
    bx, by = w // 8, h // 8
    qz = q  # natural order
    mcu_index = 0
    rst = 0
    for blk in range(bx * by):
        if restart_interval and mcu_index and mcu_index % restart_interval == 0:
            bw.flush()
            bw.bytes.extend(bytes([0xFF, 0xD0 + rst]))
            rst = (rst + 1) & 7
            pred = [0] * nc
        r0, c0 = (blk // bx) * 8, (blk % bx) * 8
        for c in range(nc):
            samples = planes[c][r0:r0 + 8, c0:c0 + 8].astype(np.float64) - 128
            coeffs = fdct_block(samples)
            qc = np.floor(coeffs / qz.reshape(8, 8) + 0.5).astype(np.int64)
            flat = qc.reshape(64)[_ZIGZAG]
            diff = int(flat[0]) - pred[c]
            pred[c] = int(flat[0])
            vbits, s = _encode_coeff_bits(diff)
            bw.write(*dc_code[s])
            if s:
                bw.write(vbits, s)
            run = 0
            last_nz = 0
            nz = np.flatnonzero(flat[1:])
            last_nz = (nz[-1] + 1) if len(nz) else 0
            for i in range(1, last_nz + 1):
                v = int(flat[i])
                if v == 0:
                    run += 1
                    continue
                while run > 15:
                    bw.write(*ac_code[0xF0])  # ZRL
                    run -= 16
                vbits, s = _encode_coeff_bits(v)
                if s > 10:
                    raise ValueError("AC coefficient out of baseline range")
                bw.write(*ac_code[(run << 4) | s])
                bw.write(vbits, s)
                run = 0
            if last_nz < 63:
                bw.write(*ac_code[0x00])  # EOB
        mcu_index += 1
    bw.flush()
    out.extend(bw.bytes)
    out.extend(b"\xff\xd9")  # EOI
    return bytes(out)


class _BitReader:
    """MSB-first bit reader over an entropy-coded segment with FF00 byte
    stuffing; stops at any marker (FF xx, xx != 0) and records it."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.acc = 0
        self.nbits = 0
        self.marker: int | None = None

    def _fill(self) -> None:
        d = self.data
        while self.nbits < 25 and self.marker is None:
            if self.pos >= len(d):
                self.marker = 0xD9
                break
            b = d[self.pos]
            if b == 0xFF:
                nxt = d[self.pos + 1] if self.pos + 1 < len(d) else 0xD9
                if nxt == 0x00:
                    self.pos += 2
                else:
                    self.marker = nxt
                    break
            else:
                self.pos += 1
            self.acc = (self.acc << 8) | b
            self.nbits += 8

    def read(self, n: int) -> int:
        if n == 0:
            return 0
        self._fill()
        while self.nbits < n:
            # padding past the end of the segment reads as 1-bits (F.2.2.5
            # never needs them for a well-formed stream; a truncated stream
            # must not underflow the shift below)
            self.acc = (self.acc << 8) | 0xFF
            self.nbits += 8
        v = (self.acc >> (self.nbits - n)) & ((1 << n) - 1)
        self.nbits -= n
        self.acc &= (1 << self.nbits) - 1
        return v

    def skip_to_marker(self) -> int:
        """Align to byte boundary and consume the pending marker."""
        self.acc = 0
        self.nbits = 0
        self._fill()
        m = self.marker
        self.marker = None
        # advance past FF xx
        d = self.data
        while self.pos + 1 < len(d):
            if d[self.pos] == 0xFF and d[self.pos + 1] == m:
                self.pos += 2
                break
            self.pos += 1
        return m if m is not None else 0xD9


class _HuffDecoder:
    """Canonical decode tables per T.81 F.2.2.3 (mincode/maxcode/valptr)."""

    def __init__(self, bits: list[int], vals: list[int]):
        self.vals = vals
        self.mincode = [0] * 17
        self.maxcode = [-1] * 17
        self.valptr = [0] * 17
        code = 0
        k = 0
        for ln in range(1, 17):
            if bits[ln - 1]:
                self.valptr[ln] = k
                self.mincode[ln] = code
                code += bits[ln - 1]
                k += bits[ln - 1]
                self.maxcode[ln] = code - 1
            code <<= 1

    def decode(self, br: _BitReader) -> int:
        code = br.read(1)
        ln = 1
        while code > self.maxcode[ln]:
            ln += 1
            if ln > 16:
                raise ValueError("invalid Huffman code in JPEG stream")
            code = (code << 1) | br.read(1)
        return self.vals[self.valptr[ln] + code - self.mincode[ln]]


def _extend(v: int, s: int) -> int:
    """T.81 F.2.2.1 EXTEND: map s low bits back to the signed coefficient."""
    return v if s == 0 or v >= (1 << (s - 1)) else v - (1 << s) + 1


def decode_jpeg(payload: bytes, return_coefficients: bool = False):
    """Baseline JPEG -> dict of typed metadata (the decode_media contract)
    or, with ``return_coefficients``, the raw dequantized coefficient
    blocks per component (bitstream-exactness oracle for tests).

    Metadata: kind='jpeg', width, height, channels, bits=8, n_values =
    w*h*channels, sum_values = integer sum of all decoded component
    samples (IDCT + 128 level shift, round-half-up, clamped to [0, 255])."""
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (no SOI)")
    i = 2
    qt: dict[int, np.ndarray] = {}
    huff_dc: dict[int, _HuffDecoder] = {}
    huff_ac: dict[int, _HuffDecoder] = {}
    restart_interval = 0
    frame = None
    scan = None
    while i + 4 <= len(payload):
        if payload[i] != 0xFF:
            raise ValueError("marker expected in JPEG header")
        # T.81 B.1.1.2: markers may be preceded by any number of 0xFF fill
        # bytes — skip them so `FF FF DB ...` parses as DQT, not marker 0xFF
        while i + 2 <= len(payload) and payload[i + 1] == 0xFF:
            i += 1
        marker = payload[i + 1]
        if marker == 0xD9:
            break
        size = int.from_bytes(payload[i + 2:i + 4], "big")
        body = payload[i + 4:i + 2 + size]
        if len(body) != size - 2:
            raise ValueError("truncated JPEG segment")
        i += 2 + size
        if marker == 0xDB:
            j = 0
            while j < len(body):
                pq, tq = body[j] >> 4, body[j] & 0xF
                if pq != 0:
                    raise NotImplementedError("16-bit quant tables")
                z = np.frombuffer(body[j + 1:j + 65], np.uint8).astype(np.int64)
                nat = np.zeros(64, np.int64)
                nat[_ZIGZAG] = z
                qt[tq] = nat
                j += 65
        elif marker == 0xC4:
            j = 0
            while j < len(body):
                tc, th = body[j] >> 4, body[j] & 0xF
                bits = list(body[j + 1:j + 17])
                n = sum(bits)
                vals = list(body[j + 17:j + 17 + n])
                (huff_dc if tc == 0 else huff_ac)[th] = _HuffDecoder(bits, vals)
                j += 17 + n
        elif marker == 0xC0 or marker == 0xC1:
            prec = body[0]
            if prec != 8:
                raise NotImplementedError("only 8-bit baseline JPEG")
            h = int.from_bytes(body[1:3], "big")
            w = int.from_bytes(body[3:5], "big")
            nc = body[5]
            comps = []
            for c in range(nc):
                cid, hv, tq = body[6 + 3 * c:9 + 3 * c]
                if hv != 0x11:
                    raise NotImplementedError(
                        "subsampled JPEG (sampling factors != 1x1)"
                    )
                comps.append((cid, tq))
            frame = (w, h, comps)
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                "only baseline sequential JPEG (SOF0/SOF1) is supported"
            )
        elif marker == 0xDD:
            restart_interval = int.from_bytes(body[0:2], "big")
        elif marker == 0xDA:
            ns = body[0]
            scan = [(body[1 + 2 * c], body[2 + 2 * c] >> 4,
                     body[2 + 2 * c] & 0xF) for c in range(ns)]
            break
        # APPn / COM and other segments are skipped
    if frame is None or scan is None:
        raise ValueError("JPEG missing SOF/SOS")
    w, h, comps = frame
    nc = len(comps)
    cid_to_tq = dict(comps)
    br = _BitReader(payload, i)
    bx, by = (w + 7) // 8, (h + 7) // 8
    pred = [0] * nc
    planes = [np.zeros((by * 8, bx * 8), np.float64) for _ in range(nc)]
    coeff_blocks = [[] for _ in range(nc)] if return_coefficients else None
    mcu_index = 0
    for blk in range(bx * by):
        if restart_interval and mcu_index and mcu_index % restart_interval == 0:
            m = br.skip_to_marker()
            if not (0xD0 <= m <= 0xD7):
                raise ValueError(f"expected RST marker, got {m:#x}")
            pred = [0] * nc
        r0, c0 = (blk // bx) * 8, (blk % bx) * 8
        for ci, (cid, td, ta) in enumerate(scan):
            q = qt[cid_to_tq[cid]]
            flat = np.zeros(64, np.int64)
            s = huff_dc[td].decode(br)
            diff = _extend(br.read(s), s)
            pred[ci] += diff
            flat[0] = pred[ci]
            k = 1
            while k < 64:
                rs = huff_ac[ta].decode(br)
                if rs == 0x00:
                    break
                if rs == 0xF0:
                    k += 16
                    continue
                k += rs >> 4
                sz = rs & 0xF
                if k > 63:
                    raise ValueError("AC run past end of block")
                flat[k] = _extend(br.read(sz), sz)
                k += 1
            nat = np.zeros(64, np.int64)
            nat[_ZIGZAG] = flat  # dezigzag first; q is natural-order
            block = (nat * q).reshape(8, 8)
            if return_coefficients:
                coeff_blocks[ci].append(block)
            planes[ci][r0:r0 + 8, c0:c0 + 8] = idct_block(block)
        mcu_index += 1
    if return_coefficients:
        return coeff_blocks
    total = 0
    for p in planes:
        samples = np.clip(np.floor(p[:h, :w] + 0.5) + 128, 0, 255)
        total += int(samples.astype(np.int64).sum())
    return {
        "kind": "jpeg", "width": w, "height": h, "channels": nc,
        "sample_rate": 0, "bits": 8, "n_values": w * h * nc,
        "sum_values": total,
    }


def synth_jpeg_payload(media_id: int) -> bytes:
    """Deterministic REAL baseline-JPEG payload per id with closed-form
    decoded features (the media_features_jpeg twin recomputes them
    symbolically): grayscale, w = 8*(1 + id%3), h = 8*(1 + id%2); every
    8x8 block is DC-ONLY at level level_b = (id*7 + 13*b) % 256 for block
    index b in row-major block order. With the all-8s quant table the DC
    coefficient is exactly level_b - 128, so the decoded block is uniform
    level_b and sum_values = 64 * sum_b(level_b). The bitstream still
    exercises Huffman DC categories, byte stuffing and DC prediction."""
    mid = int(media_id)
    w, h = 8 * (1 + mid % 3), 8 * (1 + mid % 2)
    bx, by = w // 8, h // 8
    plane = np.zeros((h, w), np.uint8)
    for b in range(bx * by):
        r0, c0 = (b // bx) * 8, (b % bx) * 8
        plane[r0:r0 + 8, c0:c0 + 8] = (mid * 7 + 13 * b) % 256
    return encode_jpeg_baseline([plane], np.full(64, 8, np.int64))
