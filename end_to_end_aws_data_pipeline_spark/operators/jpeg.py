"""Dependency-free baseline JPEG (JFIF) codec in pure numpy.

Closes the "compressed codecs" gap flagged for the multimodal column
pipeline (the reference repo itself ships JPEG screenshots —
reference/README assets — so a real corpus hits this format
immediately): `decode_jpeg` handles spec-conformant baseline DCT JFIF
— SOI/APP0/DQT/SOF0/DHT/SOS marker parse, canonical huffman decode
from the stream's own DHT segments, 0xFF00 byte unstuffing, DC
prediction, zigzag dequant, orthonormal IDCT, and YCbCr→RGB for
interleaved 4:4:4 color. Progressive (SOF2), arithmetic coding,
subsampled MCUs and restart intervals raise ``NotImplementedError``
with the feature named.

`encode_jpeg` emits valid baseline files (grayscale or 4:4:4 RGB) any
standard decoder can read. Its huffman tables are fixed-length
canonical (4-bit DC / 9-bit AC codes) — legal per ITU-T T.81 Annex C
since tables ride in DHT, just less compact than the Annex K defaults.

Exactness contract used by the oracle-checked query
(operators/multimodal.py::q_multimodal_decode_jpeg): with a FLAT
quantization table of 8, an image whose 8×8 blocks are each constant
round-trips BIT-EXACTLY — the DCT of a constant block c is a lone DC
coefficient 8·(c-128), quantizing by 8 gives the integer c-128 with no
rounding loss, and the IDCT returns exactly c. That lets DuckDB
predict decoded pixel sums arithmetically while the full bitstream
path (huffman, zigzag, dequant, IDCT) really executes. Lossy behavior
on arbitrary images is covered by tolerance property tests
(tests/test_llm_ops.py).
"""

from __future__ import annotations

import struct

# ---------------------------------------------------------------------------
# shared constants
# ---------------------------------------------------------------------------

# zigzag scan positions (row, col) in coefficient order, ITU-T T.81 fig 5
_ZZ_POS: list[tuple[int, int]] = []
for _s in range(15):
    _rng = (
        range(min(_s, 7), max(0, _s - 7) - 1, -1)
        if _s % 2 == 0
        else range(max(0, _s - 7), min(_s, 7) + 1)
    )
    for _r in _rng:
        _ZZ_POS.append((_r, _s - _r))

FLAT_Q8 = [8] * 64  # the exact-roundtrip table (see module docstring)


def _dct_matrix():
    import numpy as np

    x = np.arange(8)
    t = np.cos((2 * x[None, :] + 1) * np.arange(8)[:, None] * np.pi / 16)
    t *= np.sqrt(2.0 / 8.0)
    t[0] = np.sqrt(1.0 / 8.0)
    return t


def _canonical_codes(counts, symbols):
    """(counts per length 1..16, symbol list) → {symbol: (length, code)}
    by the T.81 Annex C canonical assignment."""
    out, code, k = {}, 0, 0
    for length in range(1, 17):
        for _ in range(counts[length - 1]):
            out[symbols[k]] = (length, code)
            code += 1
            k += 1
        code <<= 1
    return out


# fixed-length canonical tables for the ENCODER (decoder always reads the
# stream's DHT): 12 DC categories at 4 bits, all 256 AC symbols at 9 bits
_ENC_DC_COUNTS = [0, 0, 0, 12] + [0] * 12
_ENC_DC_SYMBOLS = list(range(12))
_ENC_AC_COUNTS = [0] * 8 + [254, 2] + [0] * 6  # DHT counts are bytes (≤255)
_ENC_AC_SYMBOLS = list(range(256))
_ENC_DC = _canonical_codes(_ENC_DC_COUNTS, _ENC_DC_SYMBOLS)
_ENC_AC = _canonical_codes(_ENC_AC_COUNTS, _ENC_AC_SYMBOLS)


def _mag_cat(v: int) -> tuple[int, int]:
    """JPEG magnitude category: (size, appended bits) for a signed v."""
    if v == 0:
        return 0, 0
    size = abs(v).bit_length()
    bits = v if v > 0 else v + (1 << size) - 1
    return size, bits


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, length: int) -> None:
        self.acc = (self.acc << length) | (value & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            self.nbits -= 8
            b = (self.acc >> self.nbits) & 0xFF
            self.out.append(b)
            if b == 0xFF:  # byte stuffing
                self.out.append(0x00)

    def flush(self) -> bytes:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # pad with 1s per spec
        return bytes(self.out)


def _seg(marker: int, body: bytes) -> bytes:
    return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body


def _dht_body(tc_th: int, counts, symbols) -> bytes:
    return bytes([tc_th]) + bytes(counts) + bytes(symbols)


def _encode_blocks(w, planes, qtab):
    """Entropy-code interleaved 8x8 blocks (4:4:4 → one block per
    component per MCU). `planes` is a list of (h, w) float arrays."""
    import numpy as np

    t = _dct_matrix()
    h = planes[0].shape[0]
    q = np.empty((8, 8))
    for i, (r, c) in enumerate(_ZZ_POS):
        q[r, c] = qtab[i]
    bw = _BitWriter()
    pred = [0] * len(planes)
    for by in range(h // 8):
        for bx in range(w // 8):
            for ci, plane in enumerate(planes):
                blk = plane[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] - 128.0
                coef = t @ blk @ t.T
                zz = np.round(coef / q).astype(np.int64)
                zz = [int(zz[r, c]) for (r, c) in _ZZ_POS]
                # DC: predicted difference
                diff = zz[0] - pred[ci]
                pred[ci] = zz[0]
                size, bits = _mag_cat(diff)
                ln, code = _ENC_DC[size]
                bw.write(code, ln)
                if size:
                    bw.write(bits, size)
                # AC: run-length of zeros + category
                run = 0
                last_nz = 0
                for i in range(63, 0, -1):
                    if zz[i] != 0:
                        last_nz = i
                        break
                for i in range(1, last_nz + 1):
                    if zz[i] == 0:
                        run += 1
                        continue
                    while run > 15:
                        ln, code = _ENC_AC[0xF0]  # ZRL
                        bw.write(code, ln)
                        run -= 16
                    size, bits = _mag_cat(zz[i])
                    ln, code = _ENC_AC[(run << 4) | size]
                    bw.write(code, ln)
                    bw.write(bits, size)
                    run = 0
                if last_nz != 63:
                    ln, code = _ENC_AC[0x00]  # EOB
                    bw.write(code, ln)
    return bw.flush()


def encode_jpeg(pixels, qtab=None) -> bytes:
    """Encode an (h, w) grayscale or (h, w, 3) RGB uint8 array as a
    baseline JFIF JPEG. h and w must be multiples of 8 (the testdata
    synthesizer guarantees it; a general encoder would edge-pad).
    ``qtab`` is a 64-entry zigzag-order quantization table (default
    FLAT_Q8, the exact-roundtrip table)."""
    import numpy as np

    pix = np.asarray(pixels, dtype=np.float64)
    gray = pix.ndim == 2
    h, w = pix.shape[:2]
    if h % 8 or w % 8:
        raise ValueError("encode_jpeg requires h, w multiples of 8")
    qtab = list(FLAT_Q8 if qtab is None else qtab)
    if gray:
        planes = [pix]
    else:
        r, g, b = pix[:, :, 0], pix[:, :, 1], pix[:, :, 2]
        y = np.round(0.299 * r + 0.587 * g + 0.114 * b)
        cb = np.round(-0.168736 * r - 0.331264 * g + 0.5 * b + 128)
        cr = np.round(0.5 * r - 0.418688 * g - 0.081312 * b + 128)
        planes = [y, np.clip(cb, 0, 255), np.clip(cr, 0, 255)]
    ncomp = len(planes)
    out = bytearray(b"\xff\xd8")  # SOI
    out += _seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += _seg(0xDB, bytes([0x00]) + bytes(qtab))  # DQT, 8-bit table 0
    sof = bytes([8]) + struct.pack(">HH", h, w) + bytes([ncomp])
    for ci in range(ncomp):
        sof += bytes([ci + 1, 0x11, 0])  # id, 1x1 sampling, qtable 0
    out += _seg(0xC0, sof)  # SOF0 baseline
    out += _seg(0xC4, _dht_body(0x00, _ENC_DC_COUNTS, _ENC_DC_SYMBOLS))
    out += _seg(0xC4, _dht_body(0x10, _ENC_AC_COUNTS, _ENC_AC_SYMBOLS))
    sos = bytes([ncomp])
    for ci in range(ncomp):
        sos += bytes([ci + 1, 0x00])  # DC table 0, AC table 0
    sos += bytes([0, 63, 0])
    out += _seg(0xDA, sos)
    out += _encode_blocks(w, planes, qtab)
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# ---------------------------------------------------------------------------
# decoder
# ---------------------------------------------------------------------------


class _BitReader:
    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.acc = 0
        self.nbits = 0

    def read_bit(self) -> int:
        if self.nbits == 0:
            if self.pos >= len(self.data):
                raise ValueError("truncated JPEG entropy stream")
            b = self.data[self.pos]
            self.pos += 1
            if b == 0xFF:
                # stuffed byte: 0xFF00 means literal 0xFF
                if self.pos >= len(self.data):
                    raise ValueError("truncated after 0xFF")
                nxt = self.data[self.pos]
                if nxt == 0x00:
                    self.pos += 1
                elif 0xD0 <= nxt <= 0xD7:
                    raise NotImplementedError(
                        "JPEG restart markers (DRI) not supported"
                    )
                else:
                    raise ValueError(f"unexpected marker 0xFF{nxt:02X} in scan")
            self.acc = b
            self.nbits = 8
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v


def _receive_extend(br: _BitReader, size: int) -> int:
    if size == 0:
        return 0
    v = br.read_bits(size)
    if v < (1 << (size - 1)):
        v -= (1 << size) - 1
    return v


def _huff_decode(br: _BitReader, table: dict) -> int:
    length, code = 0, 0
    while length < 16:
        code = (code << 1) | br.read_bit()
        length += 1
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("invalid huffman code in JPEG stream")


def decode_jpeg(payload: bytes):
    """Decode a baseline JFIF JPEG to an (h, w, 3) uint8 RGB array
    (grayscale replicates to 3 channels — same contract as the other
    decoders in operators/multimodal.py)."""
    import numpy as np

    if payload[:2] != b"\xff\xd8":
        raise ValueError("bad JPEG signature")
    pos = 2
    qtabs: dict[int, list[int]] = {}
    huff: dict[tuple[int, int], dict] = {}  # (class, id) -> {(len, code): sym}
    comps = None
    h = w = 0
    scan_comps = None
    data_start = None
    while pos + 4 <= len(payload):
        if payload[pos] != 0xFF:
            raise ValueError(f"expected marker at {pos}")
        marker = payload[pos + 1]
        if marker == 0xD9:  # EOI
            break
        (seglen,) = struct.unpack_from(">H", payload, pos + 2)
        body = payload[pos + 4 : pos + 2 + seglen]
        pos += 2 + seglen
        if marker == 0xDB:  # DQT (possibly several tables per segment)
            off = 0
            while off < len(body):
                pq, tq = body[off] >> 4, body[off] & 0x0F
                if pq != 0:
                    raise NotImplementedError("16-bit quant tables")
                qtabs[tq] = list(body[off + 1 : off + 65])
                off += 65
        elif marker == 0xC4:  # DHT
            off = 0
            while off < len(body):
                tc, th = body[off] >> 4, body[off] & 0x0F
                counts = list(body[off + 1 : off + 17])
                n = sum(counts)
                symbols = list(body[off + 17 : off + 17 + n])
                huff[(tc, th)] = {
                    (ln, code): sym
                    for sym, (ln, code) in _canonical_codes(
                        counts, symbols
                    ).items()
                }
                off += 17 + n
        elif marker == 0xC0:  # SOF0 baseline
            precision = body[0]
            if precision != 8:
                raise NotImplementedError("only 8-bit precision")
            h, w = struct.unpack_from(">HH", body, 1)
            ncomp = body[5]
            comps = []
            for ci in range(ncomp):
                cid, sampling, tq = body[6 + 3 * ci : 9 + 3 * ci]
                if sampling != 0x11:
                    raise NotImplementedError(
                        "subsampled JPEG (only 4:4:4 / grayscale supported)"
                    )
                comps.append((cid, tq))
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA,
                        0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                f"non-baseline JPEG (SOF marker 0xFF{marker:02X}: "
                "progressive/arithmetic/hierarchical)"
            )
        elif marker == 0xDD:
            raise NotImplementedError("JPEG restart intervals (DRI)")
        elif marker == 0xDA:  # SOS
            ns = body[0]
            scan_comps = []
            for ci in range(ns):
                cid, tabs = body[1 + 2 * ci], body[2 + 2 * ci]
                scan_comps.append((cid, tabs >> 4, tabs & 0x0F))
            data_start = pos
            break
        # APPn/COM and anything else: skipped
    if comps is None or scan_comps is None or data_start is None:
        raise ValueError("JPEG missing SOF0/SOS")
    if h % 8 or w % 8:
        raise NotImplementedError("image dims not multiples of 8")
    # entropy data runs to EOI
    end = payload.rfind(b"\xff\xd9")
    if end < 0:
        raise ValueError("JPEG missing EOI")
    br = _BitReader(payload[data_start:end])
    t = _dct_matrix()
    dezz = np.empty((len(comps), 8, 8))
    for ci, (_, tq) in enumerate(comps):
        for i, (r, c) in enumerate(_ZZ_POS):
            dezz[ci, r, c] = qtabs[tq][i]
    planes = [np.zeros((h, w)) for _ in comps]
    pred = [0] * len(comps)
    tq_by_cid = {cid: i for i, (cid, _) in enumerate(comps)}
    for by in range(h // 8):
        for bx in range(w // 8):
            for cid, dct_id, act_id in scan_comps:
                ci = tq_by_cid[cid]
                zz = np.zeros(64)
                size = _huff_decode(br, huff[(0, dct_id)])
                pred[ci] += _receive_extend(br, size)
                zz[0] = pred[ci]
                k = 1
                while k < 64:
                    sym = _huff_decode(br, huff[(1, act_id)])
                    if sym == 0x00:  # EOB
                        break
                    run, size = sym >> 4, sym & 0x0F
                    if size == 0:
                        if run != 15:
                            raise ValueError("bad AC symbol")
                        k += 16  # ZRL
                        continue
                    k += run
                    if k > 63:
                        raise ValueError("AC index out of range")
                    zz[k] = _receive_extend(br, size)
                    k += 1
                coef = np.zeros((8, 8))
                for i, (r, c) in enumerate(_ZZ_POS):
                    coef[r, c] = zz[i]
                blk = t.T @ (coef * dezz[ci]) @ t + 128.0
                planes[ci][by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = blk
    if len(planes) == 1:
        g = np.clip(np.round(planes[0]), 0, 255).astype(np.uint8)
        return np.repeat(g[:, :, None], 3, axis=2)
    y, cb, cr = planes
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    rgb = np.stack([r, g, b], axis=2)
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)
