"""Pure-python TIFF codec (TIFF 6.0) — stdlib struct + numpy.

Scanned-document corpora ship TIFF; this closes that leg of the
multimodal decode path: both byte orders (II/MM), IFD walk, strip
assembly, compressions 1 (none), 5 (LZW — the TIFF variant: MSB-first
code packing with the early-change quirk, 256-entry base table) and
32773 (PackBits RLE), horizontal-differencing predictor 2, photometric
interpretations WhiteIsZero / BlackIsZero / RGB / Palette (16-bit
colormap scaled to 8), 8-bit samples at 1/3/4 samples per pixel.

Encoder for tests writes all three compressions (+ optional predictor),
so decode->encode roundtrips pin exact pixel equality — TIFF is
lossless.

Per-payload kernel invoked from the Arrow-batched UDF in multimodal.py;
no Spark objects here.
"""

from __future__ import annotations

import struct

import numpy as np

# corrupt-header guard — see png.py MAX_DECODE_PIXELS rationale
MAX_DECODE_PIXELS = 1 << 26


def _lzw_decode_tiff(data: bytes, max_out: int) -> bytes:
    """TIFF-variant LZW: 8-bit symbols, CLEAR=256, EOI=257, MSB-first
    bit packing, and the spec's early change (width grows when the NEXT
    code could overflow, i.e. one entry earlier than GIF)."""
    CLEAR, EOI = 256, 257
    out = bytearray()
    table: list[bytes] = []

    def reset():
        nonlocal table, width
        table = [bytes([i]) for i in range(256)] + [b"", b""]
        width = 9

    width = 9
    reset()
    acc = 0
    nbits = 0
    pos = 0
    prev: bytes | None = None
    while len(out) < max_out:
        while nbits < width:
            if pos >= len(data):
                return bytes(out)
            # 32-bit mask: nbits never exceeds width-1+8 <= 19, and an
            # unmasked Python-int accumulator grows by 8 bits per input
            # byte — quadratic over a whole strip
            acc = ((acc << 8) | data[pos]) & 0xFFFFFFFF
            nbits += 8
            pos += 1
        code = (acc >> (nbits - width)) & ((1 << width) - 1)
        nbits -= width
        if code == CLEAR:
            reset()
            prev = None
            continue
        if code == EOI:
            break
        if prev is None:
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            table.append(prev + entry[:1])
        elif code == len(table):
            entry = prev + prev[:1]
            table.append(entry)
        else:
            raise ValueError("corrupt TIFF LZW code")
        out += entry
        prev = entry
        # early change: bump width when table can no longer address the
        # NEXT entry to be added (len+1 == 2^width), capped at 12 bits
        if len(table) + 1 >= (1 << width) and width < 12:
            width += 1
    return bytes(out)


def _lzw_encode_tiff(data: bytes) -> bytes:
    CLEAR, EOI = 256, 257
    out = bytearray()
    acc = 0
    nbits = 0
    width = 9

    def emit(code: int):
        nonlocal acc, nbits
        acc = (acc << width) | code
        nbits += width
        while nbits >= 8:
            nbits -= 8
            out.append((acc >> nbits) & 0xFF)
        acc &= (1 << nbits) - 1

    table: dict[bytes, int] = {bytes([i]): i for i in range(256)}
    next_code = 258
    emit(CLEAR)
    cur = b""
    for b in data:
        nxt = cur + bytes([b])
        if nxt in table:
            cur = nxt
            continue
        emit(table[cur])
        table[nxt] = next_code
        next_code += 1
        # early change: one emission earlier than the GIF-style rule
        # (decoder mirrors with len(table)+1 >= 2^width)
        if next_code >= (1 << width) and width < 12:
            width += 1
        elif next_code > 4093:
            emit(CLEAR)
            table = {bytes([i]): i for i in range(256)}
            next_code = 258
            width = 9
        cur = bytes([b])
    if cur:
        emit(table[cur])
    emit(EOI)
    if nbits:
        out.append((acc << (8 - nbits)) & 0xFF)
    return bytes(out)


def _packbits_decode(data: bytes, max_out: int) -> bytes:
    out = bytearray()
    pos = 0
    while pos < len(data) and len(out) < max_out:
        n = data[pos]
        pos += 1
        if n < 128:                              # literal run
            out += data[pos:pos + n + 1]
            pos += n + 1
        elif n > 128:                            # replicate
            out += bytes([data[pos]]) * (257 - n)
            pos += 1
        # n == 128: no-op
    return bytes(out)


def _packbits_encode(data: bytes) -> bytes:
    out = bytearray()
    i = 0
    n = len(data)
    while i < n:
        run = 1
        while i + run < n and run < 128 and data[i + run] == data[i]:
            run += 1
        if run >= 2:
            out += bytes([257 - run, data[i]])
            i += run
            continue
        lit = i
        while (i < n and i - lit < 128
               and not (i + 1 < n and data[i + 1] == data[i])):
            i += 1
        out += bytes([i - lit - 1]) + data[lit:i]
    return bytes(out)


def decode_tiff(payload: bytes) -> np.ndarray:
    """Decode the first IFD of a TIFF to uint8 (h, w) gray, (h, w, 3)
    RGB or (h, w, 4) RGBA."""
    data = bytes(payload)
    if data[:4] == b"II*\x00":
        endian = "<"
    elif data[:4] == b"MM\x00*":
        endian = ">"
    else:
        raise ValueError("not a TIFF (bad signature)")
    (ifd_off,) = struct.unpack(endian + "I", data[4:8])
    (n_entries,) = struct.unpack(endian + "H",
                                 data[ifd_off:ifd_off + 2])
    type_size = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8}
    type_fmt = {1: "B", 3: "H", 4: "I"}
    tags: dict[int, list[int]] = {}
    for i in range(n_entries):
        e = ifd_off + 2 + 12 * i
        tag, typ, cnt = struct.unpack(endian + "HHI", data[e:e + 8])
        if typ not in type_fmt:
            continue
        sz = type_size[typ] * cnt
        if sz <= 4:
            raw = data[e + 8:e + 8 + sz]
        else:
            (off,) = struct.unpack(endian + "I", data[e + 8:e + 12])
            raw = data[off:off + sz]
        tags[tag] = list(struct.unpack(
            endian + type_fmt[typ] * cnt, raw))

    def one(tag, default=None):
        v = tags.get(tag)
        if v is None:
            if default is None:
                raise ValueError(f"TIFF missing required tag {tag}")
            return default
        return v[0]

    w = one(256)
    h = one(257)
    if w == 0 or h == 0 or w * h > MAX_DECODE_PIXELS:
        raise ValueError(f"unreasonable TIFF dimensions {w}x{h}")
    spp = one(277, 1)
    bits = tags.get(258, [8] * spp)
    if any(b != 8 for b in bits):
        raise ValueError("only 8-bit TIFF samples supported")
    comp = one(259, 1)
    photo = one(262, 1)
    if photo not in (0, 1, 2, 3):
        # CMYK(5)/YCbCr(6)/CIELab(8)... would silently decode as RGB
        raise ValueError(f"unsupported TIFF photometric {photo}")
    if one(284, 1) != 1:                         # PlanarConfiguration
        # planar (RRR...GGG...BBB) data reinterpreted as interleaved
        # RGB is silent corruption — refuse instead
        raise ValueError("planar TIFF (PlanarConfiguration=2) "
                         "not supported")
    pred = one(317, 1)
    rows_per_strip = one(278, h)
    offsets = tags.get(273)
    counts = tags.get(279)
    if not offsets or not counts:
        raise ValueError("TIFF missing strip offsets/counts")

    stride = w * spp
    rows = []
    for si, (off, cnt) in enumerate(zip(offsets, counts)):
        nrows = min(rows_per_strip, h - si * rows_per_strip)
        if nrows <= 0:
            break
        raw = data[off:off + cnt]
        if comp == 1:
            dec = raw
        elif comp == 5:
            dec = _lzw_decode_tiff(raw, nrows * stride)
        elif comp == 32773:
            dec = _packbits_decode(raw, nrows * stride)
        else:
            raise ValueError(f"unsupported TIFF compression {comp}")
        if len(dec) < nrows * stride:
            raise ValueError("truncated TIFF strip")
        rows.append(np.frombuffer(
            dec[:nrows * stride], np.uint8).reshape(nrows, stride))
    img = np.vstack(rows)
    if img.shape[0] < h:
        raise ValueError("TIFF strips cover fewer rows than ImageLength")
    img = img[:h]
    if pred == 2:                                # horizontal differencing
        img = img.reshape(h, w, spp).astype(np.uint32)
        img = np.cumsum(img, axis=1).astype(np.uint8).reshape(h, stride)
    img = img.reshape(h, w, spp)
    if photo == 3:                               # palette
        cmap = tags.get(320)
        if not cmap:
            raise ValueError("palette TIFF missing ColorMap")
        n = len(cmap) // 3
        pal = (np.array(cmap, dtype=np.uint32)
               .reshape(3, n).T >> 8).astype(np.uint8)
        return pal[np.minimum(img[..., 0], n - 1)]
    if spp == 1:
        g = img[..., 0]
        return (255 - g) if photo == 0 else g    # WhiteIsZero inverts
    return img                                   # RGB / RGBA


def encode_tiff(img: np.ndarray, compression: int = 1,
                predictor: int = 1, rows_per_strip: int | None = None
                ) -> bytes:
    """Little-endian TIFF of uint8 (h, w) gray / (h, w, 3) RGB /
    (h, w, 4) RGBA; compression 1 / 5 (LZW) / 32773 (PackBits);
    predictor 2 = horizontal differencing. Lossless."""
    img = np.ascontiguousarray(np.asarray(img, dtype=np.uint8))
    if img.ndim == 2:
        img = img[..., None]
    h, w, spp = img.shape
    if rows_per_strip is None:
        rows_per_strip = max(1, min(h, 8192 // max(1, w * spp // 8)))
    raw = img
    if predictor == 2:
        d = img.astype(np.int16)
        d[:, 1:] = d[:, 1:] - d[:, :-1]
        raw = (d & 0xFF).astype(np.uint8)
    flat = raw.reshape(h, w * spp)

    strips = []
    for y0 in range(0, h, rows_per_strip):
        chunk = flat[y0:y0 + rows_per_strip].tobytes()
        if compression == 5:
            strips.append(_lzw_encode_tiff(chunk))
        elif compression == 32773:
            strips.append(_packbits_encode(chunk))
        else:
            strips.append(chunk)

    entries = []                 # (tag, type, count, value_or_bytes)

    def short(tag, *vals):
        entries.append((tag, 3, len(vals),
                        struct.pack("<" + "H" * len(vals), *vals)))

    def long_(tag, *vals):
        entries.append((tag, 4, len(vals),
                        struct.pack("<" + "I" * len(vals), *vals)))

    short(256, w)
    short(257, h)
    short(258, *([8] * spp))
    short(259, compression)
    short(262, 2 if spp >= 3 else 1)
    # strip offsets filled after layout
    short(277, spp)
    short(278, rows_per_strip)
    long_(279, *[len(s) for s in strips])
    if predictor == 2:
        short(317, predictor)

    # layout: header(8) + IFD + external value blobs + strip data
    n_strip = len(strips)
    ifd_entries = len(entries) + 1               # + StripOffsets
    ifd_size = 2 + 12 * ifd_entries + 4
    blob_off = 8 + ifd_size
    blobs = bytearray()

    def place(value: bytes) -> tuple[int, bytes]:
        nonlocal blob_off
        if len(value) <= 4:
            return 0, value + b"\x00" * (4 - len(value))
        off = blob_off
        blobs.extend(value)
        blob_off += len(value)
        return off, struct.pack("<I", off)

    strip_data_off = None        # resolved after blobs

    packed = []
    for tag, typ, cnt, val in sorted(entries) + [(273, 4, n_strip, None)]:
        if tag == 273:
            # placeholder; patched once strip data offset is known
            if n_strip == 1:
                packed.append((tag, typ, cnt, b"\x00\x00\x00\x00", None))
            else:
                off, enc = place(b"\x00" * 4 * n_strip)
                packed.append((tag, typ, cnt, enc, off))
            continue
        _, enc = place(val)
        packed.append((tag, typ, cnt, enc, None))
    packed.sort(key=lambda e: e[0])

    strip_data_off = blob_off
    offs = []
    o = strip_data_off
    for s in strips:
        offs.append(o)
        o += len(s)
    # patch StripOffsets
    final = []
    for tag, typ, cnt, enc, ext in packed:
        if tag == 273:
            if n_strip == 1:
                enc = struct.pack("<I", offs[0])
            else:
                blobs[ext - 8 - ifd_size:ext - 8 - ifd_size
                      + 4 * n_strip] = struct.pack(
                          "<" + "I" * n_strip, *offs)
        final.append((tag, typ, cnt, enc))

    out = bytearray(b"II*\x00" + struct.pack("<I", 8))
    out += struct.pack("<H", ifd_entries)
    for tag, typ, cnt, enc in final:
        out += struct.pack("<HHI", tag, typ, cnt) + enc
    out += struct.pack("<I", 0)                  # no next IFD
    out += blobs
    for s in strips:
        out += s
    return bytes(out)
