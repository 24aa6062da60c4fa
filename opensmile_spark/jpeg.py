"""Pure-numpy baseline JPEG codec (ITU-T T.81, sequential DCT, Huffman).

The container ships no PIL/libjpeg, so the engine's compressed-image path
was a documented stub through round 3. This module closes it from the
public spec: a baseline encoder (4:4:4, standard Annex K quantization +
Huffman tables, libjpeg-style quality scaling) and a decoder that parses
SOI/APP/DQT/SOF0/DHT/DRI/SOS from the byte stream, Huffman-decodes the
entropy segment (0xFF00 unstuffing, RSTn restart handling), dequantizes,
inverse-zigzags, IDCTs and converts YCbCr back to RGB, with 4:4:4 / 4:2:2
/ 4:2:0 chroma upsampling. All tables are read FROM THE FILE, so the
decoder is not tied to this encoder's choices.

Scope: baseline/extended sequential Huffman JPEGs at 8- and 12-bit
precision here (12-bit output scales to the pipeline's uint8 contract),
plus progressive (SOF2) streams via jpeg_progressive.py (spectral
selection, successive approximation, EOB runs) and lossless (SOF3)
streams via jpeg_lossless.py (Annex H predictive DPCM, exact samples) —
`decode_jpeg` dispatches all of these automatically. Arithmetic-coded
and hierarchical variants raise ValueError (quarantined per-row by
multimodal's on_error='column').

Everything here is per-payload kernel work invoked from the Arrow-batched
decode UDF in multimodal.py; no Spark objects in this module.
"""

from __future__ import annotations

import struct

import numpy as np

# ---- constants (ITU-T T.81 Annex K) ---------------------------------------

ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int32)

Q_LUM = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.int32).reshape(8, 8)

Q_CHROM = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
], dtype=np.int32).reshape(8, 8)

DC_LUM_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
DC_LUM_VALS = list(range(12))
DC_CHROM_BITS = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
DC_CHROM_VALS = list(range(12))

AC_LUM_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
AC_LUM_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
    0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
    0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
    0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
    0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
    0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
    0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
    0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
    0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
    0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]
AC_CHROM_BITS = [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77]
AC_CHROM_VALS = [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
    0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
    0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15,
    0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17,
    0x18, 0x19, 0x1A, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37,
    0x38, 0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A,
    0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65,
    0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A,
    0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
    0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5,
    0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
    0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9,
    0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2,
    0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]

# orthonormal 8-point DCT-II matrix: D = C @ block @ C.T
_C = np.zeros((8, 8))
for _u in range(8):
    for _x in range(8):
        _C[_u, _x] = np.sqrt((1 if _u == 0 else 2) / 8.0) \
            * np.cos((2 * _x + 1) * _u * np.pi / 16.0)


def _quality_scale(q_table: np.ndarray, quality: int) -> np.ndarray:
    """libjpeg quality scaling: 5000/q below 50, 200-2q above."""
    quality = min(max(int(quality), 1), 100)
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    q = (q_table * scale + 50) // 100
    return np.clip(q, 1, 255).astype(np.int32)


# ---- huffman ---------------------------------------------------------------

def _canonical_codes(bits, vals):
    """(code, length) per symbol from the (BITS, HUFFVAL) spec lists —
    T.81 Annex C code-generation procedure."""
    codes = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            codes[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return codes


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int):
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            self.nbits -= 8
            byte = (self.acc >> self.nbits) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:          # byte stuffing
                self.out.append(0x00)
        # drop emitted high bits: an unbounded Python-int accumulator
        # otherwise grows by `length` bits per call and every shift goes
        # O(total bits) — quadratic over a whole image
        self.acc &= (1 << self.nbits) - 1

    def flush(self):
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)   # pad with 1s


def _extend(v: int, size: int) -> int:
    """T.81 F.2.2.1 sign extension of a `size`-bit magnitude."""
    if size == 0:
        return 0
    return v if v >= (1 << (size - 1)) else v - (1 << size) + 1


def _seg(marker: int, payload: bytes) -> bytes:
    """One marker segment: marker, 2-byte length (incl. itself), payload —
    shared by every encoder here and in jpeg_lossless.py."""
    return struct.pack(">HH", marker, len(payload) + 2) + payload


# ---- fast entropy decoding -------------------------------------------------
# The scalar _BitReader/_huff_decode pair above costs ~30 Python ops per
# coefficient (a bit-read call per code bit). The fast path below brings
# that to ~6: the entropy segment is unstuffed ONCE into plain bytes
# (0xFF00 -> 0xFF, RSTn recorded as segment boundaries), and Huffman
# codes resolve with a single peek into a flat prefix table.


def _unstuff_entropy(data: bytes, start: int):
    """Unstuff the entropy-coded segment starting at `start`.

    Returns (buf, boundaries, end): `buf` = entropy bytes with 0xFF00
    collapsed and RSTn markers removed; `boundaries` = byte offsets in
    buf where each RSTn cut a new restart segment; `end` = absolute
    offset of the terminating marker (EOI / next header)."""
    arr = np.frombuffer(data, np.uint8)
    n = len(data)
    parts = []
    boundaries = []
    size = 0
    prev = start
    end = n
    terminated = False
    # scan in bounded windows: progressive files call this once per SOS,
    # so a full-file 0xFF sweep per scan would be O(scans * filesize)
    win = start
    WINDOW = 1 << 16
    while win < n and not terminated:
        hi = min(n, win + WINDOW)
        for p in (np.nonzero(arr[win:hi] == 0xFF)[0] + win):
            if p < prev:
                continue
            nxt = data[p + 1] if p + 1 < n else 0xD9
            if nxt == 0x00:                   # stuffed data byte
                parts.append(arr[prev:p + 1])
                size += p + 1 - prev
                prev = p + 2
            elif nxt == 0xFF:                 # fill byte, re-examined next
                parts.append(arr[prev:p])
                size += p - prev
                prev = p + 1
            elif 0xD0 <= nxt <= 0xD7:         # restart marker
                parts.append(arr[prev:p])
                size += p - prev
                boundaries.append(size)
                prev = p + 2
            else:                             # real marker: segment end
                parts.append(arr[prev:p])
                size += p - prev
                end = p
                terminated = True
                break
        win = hi
    if not terminated:
        parts.append(arr[prev:n])
    buf = np.concatenate(parts).tobytes() if parts else b""
    return buf, boundaries, end


def _peek_table(bits, vals):
    """(flat lookup list, L): entry = (length << 8) | symbol for every
    L-bit prefix; 0 = invalid prefix. L = longest code length used."""
    L = max((i + 1 for i in range(16) if bits[i]), default=1)
    tbl = np.zeros(1 << L, dtype=np.uint32)
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            start = code << (L - length)
            tbl[start:start + (1 << (L - length))] = \
                (length << 8) | vals[k]
            code += 1
            k += 1
        code <<= 1
    return tbl.tolist(), L


class _FastBitReader:
    """MSB-first reader over pre-unstuffed entropy bytes (reads past the
    end pad with zero bits, matching the scalar reader's behavior)."""

    __slots__ = ("buf", "nbytes", "acc", "nbits", "pos")

    def __init__(self, buf: bytes, pos: int = 0):
        self.buf = buf
        self.nbytes = len(buf)
        self.acc = 0
        self.nbits = 0
        self.pos = pos

    def get(self, n: int) -> int:
        nbits = self.nbits
        while nbits < n:
            b = self.buf[self.pos] if self.pos < self.nbytes else 0
            self.pos += 1
            self.acc = ((self.acc << 8) | b) & 0xFFFFFFFFFF
            nbits += 8
        self.nbits = nbits - n
        return (self.acc >> self.nbits) & ((1 << n) - 1)

    def peek(self, n: int) -> int:
        nbits = self.nbits
        while nbits < n:
            b = self.buf[self.pos] if self.pos < self.nbytes else 0
            self.pos += 1
            self.acc = ((self.acc << 8) | b) & 0xFFFFFFFFFF
            nbits += 8
        self.nbits = nbits
        return (self.acc >> (nbits - n)) & ((1 << n) - 1)

    def skip(self, n: int):
        self.nbits -= n

    def restart_at(self, byteoff: int):
        self.pos = byteoff
        self.acc = 0
        self.nbits = 0


def _huff_decode_fast(r: _FastBitReader, tbl, L: int) -> int:
    e = tbl[r.peek(L)]
    if e == 0:
        raise ValueError("invalid Huffman code in entropy stream")
    r.skip(e >> 8)
    return e & 0xFF


# ---- color -----------------------------------------------------------------

def rgb_to_ycbcr(rgb: np.ndarray) -> np.ndarray:
    r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
    return np.stack([y, cb, cr], axis=-1)


def ycbcr_to_rgb(ycc: np.ndarray) -> np.ndarray:
    y, cb, cr = ycc[..., 0], ycc[..., 1] - 128.0, ycc[..., 2] - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    return np.clip(np.stack([r, g, b], axis=-1), 0, 255)


# ---- encoder ---------------------------------------------------------------

def _encode_blocks(chan: np.ndarray, q: np.ndarray, center: float = 128.0):
    """All 8x8 blocks of one padded channel -> quantized zigzag coeffs:
    vectorized DCT over every block at once (einsum), no per-block loop
    until entropy coding (which is inherently sequential). `center` is
    the level shift, 2^(P-1) (T.81 A.3.1)."""
    h, w = chan.shape
    blocks = chan.reshape(h // 8, 8, w // 8, 8).transpose(0, 2, 1, 3)
    d = np.einsum("ux,ijxy,vy->ijuv", _C, blocks - center, _C)
    quant = np.round(d / q).astype(np.int32)
    return quant.reshape(-1, 64)[:, ZIGZAG]


def _write_block(bw: _BitWriter, zz: np.ndarray, pred: int,
                 dc_codes, ac_codes) -> int:
    diff = int(zz[0]) - pred
    size = int(diff).bit_length() if diff != 0 else 0
    code, length = dc_codes[size]
    bw.write(code, length)
    if size:
        bw.write(diff if diff > 0 else diff + (1 << size) - 1, size)
    run = 0
    last_nz = int(np.nonzero(zz[1:])[0][-1]) + 1 if np.any(zz[1:]) else 0
    for i in range(1, last_nz + 1):
        v = int(zz[i])
        if v == 0:
            run += 1
            continue
        while run > 15:
            c, ln = ac_codes[0xF0]          # ZRL
            bw.write(c, ln)
            run -= 16
        size = abs(v).bit_length()
        c, ln = ac_codes[(run << 4) | size]
        bw.write(c, ln)
        bw.write(v if v > 0 else v + (1 << size) - 1, size)
        run = 0
    if last_nz < 63:
        c, ln = ac_codes[0x00]              # EOB
        bw.write(c, ln)
    return int(zz[0])


def encode_jpeg(rgb: np.ndarray, quality: int = 85) -> bytes:
    """Baseline sequential JPEG, 4:4:4, standard tables. `rgb` is
    (h, w, 3) uint8."""
    rgb = np.asarray(rgb)
    if rgb.ndim != 3 or rgb.shape[2] != 3:
        raise ValueError("encode_jpeg expects (h, w, 3)")
    h, w = rgb.shape[:2]
    ql = _quality_scale(Q_LUM, quality)
    qc = _quality_scale(Q_CHROM, quality)

    ycc = rgb_to_ycbcr(rgb.astype(np.float64))
    ph, pw = (h + 7) // 8 * 8, (w + 7) // 8 * 8
    padded = np.empty((ph, pw, 3))
    padded[:h, :w] = ycc
    padded[h:, :w] = ycc[h - 1:h, :]          # edge replicate
    padded[:, w:] = padded[:, w - 1:w]

    comp_zz = [_encode_blocks(padded[..., 0], ql),
               _encode_blocks(padded[..., 1], qc),
               _encode_blocks(padded[..., 2], qc)]

    dc_l = _canonical_codes(DC_LUM_BITS, DC_LUM_VALS)
    ac_l = _canonical_codes(AC_LUM_BITS, AC_LUM_VALS)
    dc_c = _canonical_codes(DC_CHROM_BITS, DC_CHROM_VALS)
    ac_c = _canonical_codes(AC_CHROM_BITS, AC_CHROM_VALS)

    bw = _BitWriter()
    preds = [0, 0, 0]
    tabs = [(dc_l, ac_l), (dc_c, ac_c), (dc_c, ac_c)]
    for blk in range(comp_zz[0].shape[0]):    # 4:4:4 => 1 block/comp/MCU
        for ci in range(3):
            preds[ci] = _write_block(bw, comp_zz[ci][blk], preds[ci],
                                     *tabs[ci])
    bw.flush()

    seg = _seg
    out = bytearray(b"\xff\xd8")                              # SOI
    out += seg(0xFFE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += seg(0xFFDB,
               bytes([0]) + bytes(ql.flatten()[ZIGZAG].astype(np.uint8)))
    out += seg(0xFFDB,
               bytes([1]) + bytes(qc.flatten()[ZIGZAG].astype(np.uint8)))
    sof = struct.pack(">BHHB", 8, h, w, 3)
    for cid, tq in ((1, 0), (2, 1), (3, 1)):
        sof += bytes([cid, 0x11, tq])                          # 1x1 sampling
    out += seg(0xFFC0, sof)
    for tc_th, bits, vals in ((0x00, DC_LUM_BITS, DC_LUM_VALS),
                              (0x10, AC_LUM_BITS, AC_LUM_VALS),
                              (0x01, DC_CHROM_BITS, DC_CHROM_VALS),
                              (0x11, AC_CHROM_BITS, AC_CHROM_VALS)):
        out += seg(0xFFC4, bytes([tc_th] + bits) + bytes(vals))
    sos = bytes([3, 1, 0x00, 2, 0x11, 3, 0x11, 0, 63, 0])
    out += seg(0xFFDA, sos)
    out += bw.out
    out += b"\xff\xd9"                                        # EOI
    return bytes(out)


# generic 12-bit tables (T.81 F.1.2: DC SSSS reaches 15, AC size 14 —
# past the 8-bit Annex K tables, so extended-precision streams carry
# their own): 16 DC categories at 5 bits, all 226 AC symbols at 8 bits
_DC12_BITS = [0, 0, 0, 0, 16, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0]
_DC12_VALS = list(range(16))
_AC12_BITS = [0, 0, 0, 0, 0, 0, 0, 226, 0, 0, 0, 0, 0, 0, 0, 0]
_AC12_VALS = [0x00, 0xF0] + [(r << 4) | s
                             for r in range(16) for s in range(1, 15)]


def encode_jpeg12(samples: np.ndarray, quality: int = 85) -> bytes:
    """12-bit extended sequential JPEG (SOF1), single grayscale component.
    `samples` is (h, w) integers in 0..4095; quantization is the Annex K
    luma table at the given quality (legal for any precision — dequant is
    table-driven either way)."""
    a = np.asarray(samples)
    if a.ndim != 2:
        raise ValueError("encode_jpeg12 expects (h, w) 12-bit samples")
    h, w = a.shape
    ql = _quality_scale(Q_LUM, quality)
    ph, pw = (h + 7) // 8 * 8, (w + 7) // 8 * 8
    padded = np.empty((ph, pw))
    padded[:h, :w] = a
    padded[h:, :w] = a[h - 1:h, :]
    padded[:, w:] = padded[:, w - 1:w]
    zz = _encode_blocks(padded, ql, center=2048.0)

    dc = _canonical_codes(_DC12_BITS, _DC12_VALS)
    ac = _canonical_codes(_AC12_BITS, _AC12_VALS)
    bw = _BitWriter()
    pred = 0
    for blk in range(zz.shape[0]):
        pred = _write_block(bw, zz[blk], pred, dc, ac)
    bw.flush()

    seg = _seg
    out = bytearray(b"\xff\xd8")
    out += seg(0xFFDB,
               bytes([0]) + bytes(ql.flatten()[ZIGZAG].astype(np.uint8)))
    out += seg(0xFFC1, struct.pack(">BHHB", 12, h, w, 1) + bytes([1, 0x11, 0]))
    out += seg(0xFFC4, bytes([0x00] + _DC12_BITS) + bytes(_DC12_VALS))
    out += seg(0xFFC4, bytes([0x10] + _AC12_BITS) + bytes(_AC12_VALS))
    out += seg(0xFFDA, bytes([1, 1, 0x00, 0, 63, 0]))
    out += bw.out
    out += b"\xff\xd9"
    return bytes(out)


# ---- decoder ---------------------------------------------------------------

def decode_jpeg(payload: bytes) -> np.ndarray:
    """Decode a baseline sequential JPEG to (h, w, 3) uint8 RGB (or
    (h, w) for grayscale single-component streams). All quantization and
    Huffman tables come from the byte stream."""
    data = bytes(payload)
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    pos = 2
    qtabs: dict[int, np.ndarray] = {}
    htabs: dict[tuple[int, int], dict] = {}
    comps = []          # (id, h_samp, v_samp, tq)
    h = w = 0
    precision = 8
    restart_interval = 0
    scan_comps = []
    while pos < len(data):
        if data[pos] != 0xFF:
            pos += 1
            continue
        # T.81 B.1.1.2: any number of 0xFF fill bytes may pad before a
        # marker code — skip them or the scan misreads a bogus length
        while pos + 1 < len(data) and data[pos + 1] == 0xFF:
            pos += 1
        if pos + 1 >= len(data):
            break
        marker = data[pos + 1]
        pos += 2
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            continue
        if marker == 0xD9:
            break
        (seglen,) = struct.unpack(">H", data[pos:pos + 2])
        seg = data[pos + 2:pos + seglen]
        if marker == 0xDB:                      # DQT
            p = 0
            while p < len(seg):
                pq, tq = seg[p] >> 4, seg[p] & 0xF
                p += 1
                if pq:
                    vals = np.frombuffer(seg[p:p + 128], dtype=">u2")
                    p += 128
                else:
                    vals = np.frombuffer(seg[p:p + 64], dtype=np.uint8)
                    p += 64
                q = np.zeros(64, dtype=np.int32)
                q[ZIGZAG] = vals
                qtabs[tq] = q.reshape(8, 8)
        elif marker == 0xC4:                    # DHT
            p = 0
            while p < len(seg):
                tc, th = seg[p] >> 4, seg[p] & 0xF
                bits = list(seg[p + 1:p + 17])
                n = sum(bits)
                vals = list(seg[p + 17:p + 17 + n])
                htabs[(tc, th)] = _peek_table(bits, vals)
                p += 17 + n
        elif marker == 0xC0 or marker == 0xC1:  # SOF0/1 (baseline/ext seq)
            prec, h, w, nc = struct.unpack(">BHHB", seg[:6])
            if prec not in (8, 12):
                raise ValueError("only 8- and 12-bit precision supported")
            precision = prec
            if h == 0 or w == 0 or h * w > (1 << 26):
                # corrupt-header guard: raise before any allocation so
                # on_error='column' quarantines instead of OOMing a task
                raise ValueError(f"unreasonable JPEG dimensions {w}x{h}")
            for i in range(nc):
                cid, hv, tq = seg[6 + 3 * i:9 + 3 * i]
                comps.append((cid, hv >> 4, hv & 0xF, tq))
        elif marker == 0xC2:                    # SOF2 progressive Huffman
            from .jpeg_progressive import decode_jpeg_progressive
            return decode_jpeg_progressive(data)
        elif marker == 0xC3:                    # SOF3 lossless sequential
            from .jpeg_lossless import decode_jpeg_lossless
            raw, prec = decode_jpeg_lossless(data, with_precision=True)
            if prec <= 8:
                return raw
            # >8-bit samples: scale to the pipeline's uint8 contract
            # (exact samples via jpeg_lossless.decode_jpeg_lossless)
            return (raw >> (prec - 8)).astype(np.uint8)
        elif marker in (0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            raise ValueError(
                "unsupported JPEG variant (arithmetic/hierarchical); "
                "baseline sequential (8/12-bit), progressive Huffman "
                "and lossless (SOF3) are supported")
        elif marker == 0xDD:                    # DRI
            (restart_interval,) = struct.unpack(">H", seg[:2])
        elif marker == 0xDA:                    # SOS
            ns = seg[0]
            for i in range(ns):
                cs, td_ta = seg[1 + 2 * i], seg[2 + 2 * i]
                scan_comps.append((cs, td_ta >> 4, td_ta & 0xF))
            pos += seglen
            break
        pos += seglen
    if not comps or not scan_comps:
        raise ValueError("truncated JPEG: missing SOF/SOS")

    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcus_x = (w + 8 * hmax - 1) // (8 * hmax)
    mcus_y = (h + 8 * vmax - 1) // (8 * vmax)

    by_id = {c[0]: c for c in comps}
    order = []      # (comp_idx, h_samp, v_samp, q, dc_table, ac_table)
    planes = []
    for ci, (cs, td, ta) in enumerate(scan_comps):
        _, hs, vs, tq = by_id[cs]
        order.append((ci, hs, vs, qtabs[tq].astype(np.float64),
                      htabs[(0, td)], htabs[(1, ta)]))
        planes.append(np.zeros((mcus_y * vs * 8, mcus_x * hs * 8)))

    buf, boundaries, _end = _unstuff_entropy(data, pos)
    preds = [0] * len(order)
    # zigzag coefficients per scan component over the padded block grid;
    # dequant + IDCT run vectorized once per component after entropy.
    # The bit reader is INLINED as locals (acc/nbits/bpos) — method-call
    # overhead dominates a pure-python entropy loop otherwise.
    coefs = [np.zeros((mcus_y * vs, mcus_x * hs, 64), dtype=np.int32)
             for (_ci, hs, vs, _q, _d, _a) in order]
    flat = [c.reshape(-1, 64) for c in coefs]
    rowmul = [mcus_x * hs for (_ci, hs, _vs, _q, _d, _a) in order]
    blen = len(buf)
    acc = 0
    nbits = 0
    bpos = 0
    next_b = 0
    mcu_count = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and mcu_count \
                    and mcu_count % restart_interval == 0:
                if next_b < len(boundaries):
                    bpos = boundaries[next_b]
                    acc = 0
                    nbits = 0
                    next_b += 1
                preds = [0] * len(order)
            for k, (ci, hs, vs, q, dct_t, act_t) in enumerate(order):
                dtbl, dL = dct_t
                atbl, aL = act_t
                dmask = (1 << dL) - 1
                amask = (1 << aL) - 1
                for by in range(vs):
                    for bx in range(hs):
                        blkvals = [0] * 64
                        # DC
                        while nbits < dL:
                            acc = ((acc << 8) | (buf[bpos]
                                                 if bpos < blen else 0)) \
                                & 0xFFFFFFFFFF
                            bpos += 1
                            nbits += 8
                        e = dtbl[(acc >> (nbits - dL)) & dmask]
                        if e == 0:
                            raise ValueError(
                                "invalid Huffman code in entropy stream")
                        nbits -= e >> 8
                        size = e & 0xFF
                        if size:
                            while nbits < size:
                                acc = ((acc << 8)
                                       | (buf[bpos]
                                          if bpos < blen else 0)) \
                                    & 0xFFFFFFFFFF
                                bpos += 1
                                nbits += 8
                            nbits -= size
                            v = (acc >> nbits) & ((1 << size) - 1)
                            preds[k] += v if v >= (1 << (size - 1)) \
                                else v - (1 << size) + 1
                        blkvals[0] = preds[k]
                        # AC
                        i = 1
                        while i < 64:
                            while nbits < aL:
                                acc = ((acc << 8)
                                       | (buf[bpos]
                                          if bpos < blen else 0)) \
                                    & 0xFFFFFFFFFF
                                bpos += 1
                                nbits += 8
                            e = atbl[(acc >> (nbits - aL)) & amask]
                            if e == 0:
                                raise ValueError(
                                    "invalid Huffman code in entropy "
                                    "stream")
                            nbits -= e >> 8
                            rs = e & 0xFF
                            if rs == 0x00:
                                break
                            if rs == 0xF0:
                                i += 16
                                continue
                            i += rs >> 4
                            if i > 63:
                                break
                            s = rs & 0xF
                            while nbits < s:
                                acc = ((acc << 8)
                                       | (buf[bpos]
                                          if bpos < blen else 0)) \
                                    & 0xFFFFFFFFFF
                                bpos += 1
                                nbits += 8
                            nbits -= s
                            v = (acc >> nbits) & ((1 << s) - 1)
                            blkvals[i] = v if v >= (1 << (s - 1)) \
                                else v - (1 << s) + 1
                            i += 1
                        flat[k][(my * vs + by) * rowmul[k]
                                + mx * hs + bx] = blkvals
            mcu_count += 1

    for k, (ci, hs, vs, q, _d, _a) in enumerate(order):
        pby, pbx = mcus_y * vs, mcus_x * hs
        qflat = q.reshape(-1)
        # slab over block rows: bounds peak float64 working set on
        # guard-limit-sized images without changing per-block math
        slab = max(1, (1 << 21) // max(pbx, 1))
        for r0 in range(0, pby, slab):
            r1 = min(pby, r0 + slab)
            zzc = coefs[k][r0:r1].reshape(-1, 64).astype(np.float64)
            nat = np.zeros_like(zzc)
            nat[:, ZIGZAG] = zzc
            nat *= qflat
            blocks = nat.reshape(r1 - r0, pbx, 8, 8)
            spatial = (_C.T @ blocks) @ _C    # batched BLAS, not einsum
            # level shift is 2^(P-1) (T.81 A.3.1: 128 at 8-bit, 2048 at 12)
            planes[k][r0 * 8:r1 * 8] = spatial.transpose(
                0, 2, 1, 3).reshape((r1 - r0) * 8, pbx * 8) \
                + float(1 << (precision - 1))

    # upsample chroma to full resolution and crop
    full = []
    for k, (ci, hs, vs, _q, _d, _a) in enumerate(order):
        p = planes[k]
        if hs != hmax or vs != vmax:
            p = np.repeat(np.repeat(p, vmax // vs, axis=0),
                          hmax // hs, axis=1)
        if precision > 8:
            # 12-bit samples (0..4095, chroma centered at 2048) scale to
            # the 8-bit pipeline range before color conversion
            p = p / float(1 << (precision - 8))
        full.append(p[:h, :w])
    if len(full) == 1:
        return np.clip(full[0], 0, 255).astype(np.uint8)
    ycc = np.stack(full[:3], axis=-1)
    return ycbcr_to_rgb(ycc).astype(np.uint8)
