"""Lossless JPEG codec (ITU-T T.81 Annex H — lossless sequential Huffman,
SOF3). Closes the 'lossless variants raise' scope note in jpeg.py.

Lossless JPEG is predictive DPCM, not DCT: each sample is predicted from
its causal neighbours Ra (left), Rb (above), Rc (above-left) via one of
seven selectors (H.1.2.1), the difference is coded with the DC-coefficient
Huffman discipline (SSSS category + sign-extended magnitude bits, F.2.2.1)
with the lossless-only SSSS=16 case meaning a difference of exactly 32768
with no appended bits (H.2.3), and reconstruction is modulo 2^16
(H.1.2.3). Precision 2-16 bits; an optional point transform Pt scales
samples down on encode and back up on decode (H.2.2).

Predictor edge rules (H.1.2.2): the very first sample of the scan — and
the first sample after every restart marker — is predicted with the
default 2^(P-Pt-1); the REST OF THAT LINE (the first line of the scan,
or the remainder of the line a restart landed on) uses the
one-dimensional Ra predictor; the first sample of every other line
predicts from Rb; all other samples use the selected predictor.

Both directions are implemented so the decoder can be pinned by an exact
roundtrip oracle (lossless means bit-identical samples, the strongest
test a codec can have). Interleaved multi-component scans are supported
at 1x1 sampling (the only layout produced for RGB/multichannel lossless
in practice); subsampled lossless interleave raises.

Reference analogue: the openSMILE tree only consumes decoded media via
live connectors (/root/reference/src/video/openCVSource.cpp); this codec
exists for the multimodal corpus-decode path, per-payload kernel work
invoked from the Arrow-batched UDF in multimodal.py — no Spark objects
here.
"""

from __future__ import annotations

import struct

import numpy as np

from .jpeg import (_BitWriter, _canonical_codes, _peek_table, _seg,
                   _unstuff_entropy)

# generic SSSS table: 17 symbols (0..16), all 5-bit codes — canonical per
# Annex C (codes 0..16 of 5 bits; the all-ones code is never assigned)
_LL_BITS = [0, 0, 0, 0, 17, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0]
_LL_VALS = list(range(17))


def _predict(ra: int, rb: int, rc: int, sel: int) -> int:
    """T.81 Table H.1 predictor selections 1-7."""
    if sel == 1:
        return ra
    if sel == 2:
        return rb
    if sel == 3:
        return rc
    if sel == 4:
        return ra + rb - rc
    if sel == 5:
        return ra + ((rb - rc) >> 1)
    if sel == 6:
        return rb + ((ra - rc) >> 1)
    if sel == 7:
        return (ra + rb) >> 1
    raise ValueError(f"invalid lossless predictor selector {sel}")


def encode_jpeg_lossless(img: np.ndarray, predictor: int = 4,
                         precision: int | None = None,
                         point_transform: int = 0,
                         restart_interval: int = 0) -> bytes:
    """Encode (h, w) or (h, w, nc<=4) integer samples as a lossless JPEG
    (SOF3). `precision` defaults to 8 for uint8 input, 16 otherwise;
    samples must already fit the precision. Components are interleaved at
    1x1 sampling; no color transform (lossless JPEG codes components
    as-is). `restart_interval` > 0 emits RSTn every that many MCUs
    (= sample positions), resetting prediction to the scan default."""
    a = np.asarray(img)
    if a.ndim == 2:
        a = a[:, :, None]
    if a.ndim != 3 or a.shape[2] > 4:
        raise ValueError("encode_jpeg_lossless expects (h, w[, nc<=4])")
    if precision is None:
        precision = 8 if a.dtype == np.uint8 else 16
    if not 2 <= precision <= 16:
        raise ValueError("lossless JPEG precision must be 2..16")
    pt = int(point_transform)
    h, w, nc = a.shape
    s = (a.astype(np.int64) >> pt)

    # Vectorized prediction (the decode side is inherently sequential —
    # each prediction needs reconstructed neighbours — but the ENCODE side
    # sees all samples up front, so the predictor lattice is pure numpy):
    # base = selected predictor from shifted views, then the H.1.2.2 edge
    # overlays — Rb for column 0, Ra for every sample on a line where the
    # scan/a restart interval began, the default at each reset sample.
    ra = np.empty_like(s)
    rb = np.empty_like(s)
    rc = np.empty_like(s)
    ra[:, 1:] = s[:, :-1]
    ra[:, :1] = 0
    rb[1:] = s[:-1]
    rb[:1] = 0
    rc[1:, 1:] = s[:-1, :-1]
    rc[:1] = 0
    rc[:, :1] = 0
    if predictor == 1:
        pred = ra.copy()
    elif predictor == 2:
        pred = rb.copy()
    elif predictor == 3:
        pred = rc.copy()
    elif predictor == 4:
        pred = ra + rb - rc
    elif predictor == 5:
        pred = ra + ((rb - rc) >> 1)
    elif predictor == 6:
        pred = rb + ((ra - rc) >> 1)
    elif predictor == 7:
        pred = (ra + rb) >> 1
    else:
        raise ValueError(f"invalid lossless predictor selector {predictor}")
    pred[1:, 0] = s[:-1, 0]                    # column 0: Rb
    default = 1 << (precision - pt - 1)
    resets = [0]                               # flat MCU indices that reset
    if restart_interval:
        resets += list(range(restart_interval, h * w, restart_interval))
    line1 = np.zeros((h, w), dtype=bool)       # Ra-rule region (H.1.2.2)
    for m in resets:
        y0, x0 = divmod(m, w)
        line1[y0, x0 + 1:] = True
    pred[line1] = ra[line1]
    for m in resets:
        y0, x0 = divmod(m, w)
        pred[y0, x0] = default
    # modulo-65536 differences mapped to [-32768, 32767], flat (y, x, c)
    diffs = ((s - pred + 32768) % 65536 - 32768).ravel().tolist()

    codes = _canonical_codes(_LL_BITS, _LL_VALS)
    bw = _BitWriter()
    write = bw.write
    if restart_interval:
        per_rst = restart_interval * nc
        for k in range(0, len(diffs), per_rst):
            if k:
                bw.flush()                     # byte-align (pad with 1s)
                bw.out += bytes([0xFF, 0xD0
                                 + (k // per_rst - 1) % 8])
            for d in diffs[k:k + per_rst]:
                if d == -32768:        # H.2.3: SSSS=16, no extra bits
                    code, ln = codes[16]
                    write(code, ln)
                    continue
                ssss = abs(d).bit_length()
                code, ln = codes[ssss]
                write(code, ln)
                if ssss:
                    write(d if d > 0 else d + (1 << ssss) - 1, ssss)
    else:
        for d in diffs:
            if d == -32768:
                code, ln = codes[16]
                write(code, ln)
                continue
            ssss = abs(d).bit_length()
            code, ln = codes[ssss]
            write(code, ln)
            if ssss:
                write(d if d > 0 else d + (1 << ssss) - 1, ssss)
    bw.flush()

    seg = _seg
    out = bytearray(b"\xff\xd8")
    sof = struct.pack(">BHHB", precision, h, w, nc)
    for c in range(nc):
        sof += bytes([c + 1, 0x11, 0])
    out += seg(0xFFC3, sof)
    out += seg(0xFFC4, bytes([0x00] + _LL_BITS) + bytes(_LL_VALS))
    if restart_interval:
        out += seg(0xFFDD, struct.pack(">H", restart_interval))
    sos = bytes([nc])
    for c in range(nc):
        sos += bytes([c + 1, 0x00])        # every component uses table 0
    sos += bytes([predictor, 0, pt])       # Ss=selector, Se=0, Ah:Al=0:Pt
    out += seg(0xFFDA, sos)
    out += bw.out
    out += b"\xff\xd9"
    return bytes(out)


def decode_jpeg_lossless(payload: bytes,
                         with_precision: bool = False):
    """Decode a lossless (SOF3) JPEG to exact integer samples: (h, w) or
    (h, w, nc), dtype uint8 when precision <= 8 else uint16. Huffman
    tables come from the byte stream; restart markers reset prediction to
    the scan-start default (H.2.1.3). With `with_precision`, returns
    (samples, declared precision) so callers can rescale for 8-bit
    pipelines without guessing from the data."""
    data = bytes(payload)
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    pos = 2
    htabs: dict[int, tuple] = {}
    comps: list[tuple[int, int, int]] = []     # (id, h_samp, v_samp)
    h = w = 0
    precision = 0
    restart_interval = 0
    scan_comps: list[tuple[int, int]] = []     # (comp id, td)
    sel = 1
    pt = 0
    while pos < len(data):
        if data[pos] != 0xFF:
            pos += 1
            continue
        while pos + 1 < len(data) and data[pos + 1] == 0xFF:
            pos += 1                           # B.1.1.2 fill bytes
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
        if marker == 0xC4:                     # DHT (class 0 only here)
            p = 0
            while p < len(seg):
                tc, th = seg[p] >> 4, seg[p] & 0xF
                bits = list(seg[p + 1:p + 17])
                n = sum(bits)
                vals = list(seg[p + 17:p + 17 + n])
                if tc == 0:
                    htabs[th] = _peek_table(bits, vals)
                p += 17 + n
        elif marker == 0xC3:                   # SOF3 lossless sequential
            precision, h, w, nc = struct.unpack(">BHHB", seg[:6])
            if not 2 <= precision <= 16:
                raise ValueError("invalid lossless JPEG precision")
            if h == 0 or w == 0 or h * w > (1 << 26):
                raise ValueError(f"unreasonable JPEG dimensions {w}x{h}")
            for i in range(nc):
                cid, hv, _tq = seg[6 + 3 * i:9 + 3 * i]
                comps.append((cid, hv >> 4, hv & 0xF))
        elif marker in (0xC0, 0xC1, 0xC2, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA,
                        0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError("not a lossless (SOF3) JPEG")
        elif marker == 0xDD:                   # DRI
            (restart_interval,) = struct.unpack(">H", seg[:2])
        elif marker == 0xDA:                   # SOS
            ns = seg[0]
            for i in range(ns):
                scan_comps.append((seg[1 + 2 * i], seg[2 + 2 * i] >> 4))
            sel = seg[1 + 2 * ns]              # Ss = predictor selector
            pt = seg[3 + 2 * ns] & 0xF         # Al = point transform
            pos += seglen
            break
        pos += seglen
    if not comps or not scan_comps:
        raise ValueError("truncated JPEG: missing SOF3/SOS")
    if len(scan_comps) < len(comps):
        # T.81 allows coding each component as its own scan; decoding
        # only the first would silently return one channel of a
        # multi-channel image — raise so on_error='column' quarantines
        raise ValueError(
            "multi-scan (non-interleaved) lossless JPEG not supported")
    if len(scan_comps) > 1:
        by_id = {c[0]: c for c in comps}
        for cs, _td in scan_comps:
            if by_id[cs][1] != 1 or by_id[cs][2] != 1:
                raise ValueError(
                    "subsampled interleaved lossless JPEG not supported")
    if not 1 <= sel <= 7:
        raise ValueError(f"invalid lossless predictor selector {sel}")

    nc = len(scan_comps)
    tables = [htabs[td] for _cs, td in scan_comps]
    buf, boundaries, _end = _unstuff_entropy(data, pos)
    out = np.zeros((h, w, nc), dtype=np.int64)
    default = 1 << (precision - pt - 1)

    blen = len(buf)
    acc = 0
    nbits = 0
    bpos = 0
    next_b = 0
    mcus = 0
    reset = True                # scan start: default prediction (H.2.1.3)
    line1_y = 0                 # row where the current interval began —
    #                             that whole line predicts from Ra (H.1.2.2)
    prev: list | None = None
    # rows are plain Python lists in the per-sample loop (the same
    # discipline as jpeg.py's inlined entropy loop — numpy scalar
    # indexing costs ~6x here); one bulk assign per row into `out`
    for y in range(h):
        row = [[0] * nc for _ in range(w)]
        for x in range(w):
            if restart_interval and mcus and mcus % restart_interval == 0:
                if next_b < len(boundaries):
                    bpos = boundaries[next_b]
                    acc = 0
                    nbits = 0
                    next_b += 1
                reset = True
                line1_y = y
            rx = row[x]
            ra = row[x - 1] if x else None
            rb = prev[x] if prev is not None else None
            for c in range(nc):
                tbl, L = tables[c]
                while nbits < L:
                    acc = ((acc << 8) | (buf[bpos] if bpos < blen else 0)) \
                        & 0xFFFFFFFFFF
                    bpos += 1
                    nbits += 8
                e = tbl[(acc >> (nbits - L)) & ((1 << L) - 1)]
                if e == 0:
                    raise ValueError("invalid Huffman code in entropy stream")
                nbits -= e >> 8
                ssss = e & 0xFF
                if ssss == 16:                 # H.2.3: diff = 32768 exactly
                    d = 32768
                elif ssss:
                    while nbits < ssss:
                        acc = ((acc << 8)
                               | (buf[bpos] if bpos < blen else 0)) \
                            & 0xFFFFFFFFFF
                        bpos += 1
                        nbits += 8
                    nbits -= ssss
                    v = (acc >> nbits) & ((1 << ssss) - 1)
                    d = v if v >= (1 << (ssss - 1)) else v - (1 << ssss) + 1
                else:
                    d = 0
                if reset:
                    pred = default
                elif y == line1_y:             # first line of interval: Ra
                    pred = ra[c]
                elif x == 0:
                    pred = rb[c]
                else:
                    pred = _predict(ra[c], rb[c], prev[x - 1][c], sel)
                rx[c] = (pred + d) & 0xFFFF    # H.1.2.3 modulo 2^16
            reset = False
            mcus += 1
        out[y] = row
        prev = row

    out <<= pt                                  # H.2.2 inverse point xform
    dtype = np.uint8 if precision <= 8 else np.uint16
    res = out.astype(dtype)
    res = res[:, :, 0] if nc == 1 else res
    return (res, precision) if with_precision else res
