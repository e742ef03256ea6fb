"""Baseline JPEG codec, pure Python + numpy (no Pillow, no libjpeg).

Implements the baseline sequential DCT process of ITU-T T.81 (the JPEG
standard): marker parsing (SOI/APPn/COM/DQT/DHT/SOF0/SOF1/DRI/SOS/EOI),
canonical Huffman entropy decode with byte unstuffing and restart
markers, dequantization + zigzag + orthonormal-matrix IDCT, sampling-
factor block layout with chroma upsampling, and JFIF full-range
YCbCr -> RGB. The companion encoder writes interchange-format baseline
JPEG with the Annex K example quantization/Huffman tables (scaled by
the libjpeg quality formula), optional 4:2:0 subsampling and optional
restart intervals — it exists so the decoder has an in-repo round-trip
partner and so `resize_images` can re-encode in kind, the
`_encode_png`/`_encode_gif` precedent.

Everything here is public knowledge (ITU-T T.81 / ISO 10918-1, JFIF
spec); the reference repo has no image codec at all — its binary-blob
handling is SequenceFile bytes (reference:
hadoop-mapreduce-client-core/src/main/java/org/apache/hadoop/mapreduce/
lib/input/SequenceFileInputFormat.java:1), which is exactly why this
engine carries its own decode tier for the multimodal columns.

Progressive (SOF2), arithmetic coding, 12-bit precision and lossless
modes raise ValueError — baseline covers the overwhelmingly common
interchange files and keeps the error boundary honest.
"""

from __future__ import annotations

from functools import lru_cache

_JPEG_SIG = b"\xff\xd8\xff"

# zigzag scan position -> natural (row-major) index, T.81 Figure 5
_ZIGZAG = (
    0, 1, 8, 16, 9, 2, 3, 10,
    17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63,
)

# Annex K example tables (T.81 K.1/K.3) — the de-facto interchange set.
_QT_LUM = (
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
)
_QT_CHROM = (
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
)
_HT_DC_LUM = (
    bytes((0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0)),
    bytes(range(12)),
)
_HT_DC_CHROM = (
    bytes((0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0)),
    bytes(range(12)),
)
_HT_AC_LUM = (
    bytes((0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D)),
    bytes.fromhex(
        "010203000411051221314106135161071422718114328191a1082342b1c115"
        "52d1f02433627282090a161718191a25262728292a3435363738393a434445"
        "464748494a535455565758595a636465666768696a737475767778797a8384"
        "85868788898a92939495969798999aa2a3a4a5a6a7a8a9aab2b3b4b5b6b7b8"
        "b9bac2c3c4c5c6c7c8c9cad2d3d4d5d6d7d8d9dae1e2e3e4e5e6e7e8e9eaf1"
        "f2f3f4f5f6f7f8f9fa"
    ),
)
_HT_AC_CHROM = (
    bytes((0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77)),
    bytes.fromhex(
        "000102031104052131061241510761711322328108144291a1b1c109233352"
        "f0156272d10a162434e125f11718191a262728292a35363738393a43444546"
        "4748494a535455565758595a636465666768696a737475767778797a828384"
        "85868788898a92939495969798999aa2a3a4a5a6a7a8a9aab2b3b4b5b6b7b8"
        "b9bac2c3c4c5c6c7c8c9cad2d3d4d5d6d7d8d9dae2e3e4e5e6e7e8e9eaf2f3"
        "f4f5f6f7f8f9fa"
    ),
)


@lru_cache(maxsize=1)
def _dct_mat():
    """Orthonormal 8x8 DCT-II basis M: forward F = M @ (x-128) @ M.T,
    inverse x = M.T @ F @ M + 128."""
    import numpy as np

    n = np.arange(8)
    M = np.cos((2 * n[None, :] + 1) * n[:, None] * np.pi / 16) * np.sqrt(0.25)
    M[0] *= np.sqrt(0.5)
    return M


def _build_huffman(counts: bytes, symbols: bytes):
    """Canonical JPEG Huffman table -> {(length, code): symbol}
    (T.81 Annex C code assignment)."""
    table = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(counts[length - 1]):
            if k >= len(symbols):
                raise ValueError("malformed JPEG Huffman table")
            table[(length, code)] = symbols[k]
            code += 1
            k += 1
        code <<= 1
    return table


def _huffman_codes(counts: bytes, symbols: bytes):
    """Same assignment, encoder direction: {symbol: (code, length)}."""
    return {
        sym: (code, length)
        for (length, code), sym in _build_huffman(counts, symbols).items()
    }


class _BitReader:
    """MSB-first bit reader over the entropy-coded segment, with the
    T.81 byte-unstuffing rule (FF 00 -> data FF) and restart-marker
    resync. Hitting any other marker mid-read raises (truncated)."""

    def __init__(self, blob: bytes, pos: int):
        self.blob = blob
        self.pos = pos
        self.acc = 0
        self.nbits = 0

    def _fill(self):
        b = self.blob
        if self.pos >= len(b):
            raise ValueError("truncated JPEG entropy data")
        byte = b[self.pos]
        self.pos += 1
        if byte == 0xFF:
            if self.pos >= len(b):
                raise ValueError("truncated JPEG entropy data")
            nxt = b[self.pos]
            if nxt == 0x00:
                self.pos += 1
            else:
                raise ValueError(
                    f"unexpected marker 0xff{nxt:02x} inside JPEG scan"
                )
        self.acc = (self.acc << 8) | byte
        self.nbits += 8

    def read(self, n: int) -> int:
        while self.nbits < n:
            self._fill()
        self.nbits -= n
        v = (self.acc >> self.nbits) & ((1 << n) - 1)
        self.acc &= (1 << self.nbits) - 1
        return v

    def decode(self, table) -> int:
        length, code = 0, 0
        while length < 16:
            code = (code << 1) | self.read(1)
            length += 1
            sym = table.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("invalid JPEG Huffman code")

    def restart(self, n: int):
        """Byte-align and consume the expected RSTn marker."""
        self.acc = 0
        self.nbits = 0
        b = self.blob
        if self.pos + 2 > len(b) or b[self.pos] != 0xFF or b[
            self.pos + 1
        ] != 0xD0 + (n & 7):
            raise ValueError("missing JPEG restart marker")
        self.pos += 2


def _extend(v: int, t: int) -> int:
    """T.81 F.2.2.1 EXTEND: map a t-bit magnitude to its signed value."""
    if t == 0:
        return 0
    return v - (1 << t) + 1 if v < (1 << (t - 1)) else v


def _decode_block(reader, dc_tab, ac_tab, pred: int):
    """One 8x8 block of quantized coefficients in zigzag order."""
    coefs = [0] * 64
    t = reader.decode(dc_tab)
    if t > 11:
        raise ValueError("bad JPEG DC category")
    pred += _extend(reader.read(t), t)
    coefs[0] = pred
    k = 1
    while k < 64:
        rs = reader.decode(ac_tab)
        r, s = rs >> 4, rs & 0x0F
        if s == 0:
            if r == 15:  # ZRL
                k += 16
                continue
            break  # EOB
        k += r
        if k > 63:
            raise ValueError("JPEG AC run past end of block")
        coefs[k] = _extend(reader.read(s), s)
        k += 1
    return coefs, pred


def decode_jpeg(blob: bytes):
    """Decode a baseline JPEG -> (h, w, 3) uint8 RGB (grayscale files
    are replicated to 3 channels). Raises ValueError on non-JPEG,
    truncated streams and non-baseline processes."""
    import numpy as np

    if len(blob) < 4 or blob[:3] != _JPEG_SIG:
        raise ValueError("not a JPEG payload")
    qtables: dict[int, list[int]] = {}
    htables: dict[tuple[int, int], dict] = {}
    frame = None
    restart_interval = 0
    pos = 2
    while True:
        if pos + 2 > len(blob):
            raise ValueError("truncated JPEG: no SOS marker")
        if blob[pos] != 0xFF:
            raise ValueError(f"malformed JPEG marker at {pos}")
        marker = blob[pos + 1]
        pos += 2
        if marker == 0xD8 or marker == 0x01 or 0xD0 <= marker <= 0xD7:
            continue  # SOI / TEM / stray RST: no payload
        if pos + 2 > len(blob):
            raise ValueError("truncated JPEG segment header")
        ln = int.from_bytes(blob[pos : pos + 2], "big")
        seg = blob[pos + 2 : pos + ln]
        if len(seg) != ln - 2:
            raise ValueError("truncated JPEG segment")
        if marker == 0xDB:  # DQT
            i = 0
            while i < len(seg):
                pq, tq = seg[i] >> 4, seg[i] & 0x0F
                i += 1
                if pq == 0:
                    vals = list(seg[i : i + 64])
                    i += 64
                elif pq == 1:
                    vals = [
                        int.from_bytes(seg[i + 2 * j : i + 2 * j + 2], "big")
                        for j in range(64)
                    ]
                    i += 128
                else:
                    raise ValueError("bad JPEG DQT precision")
                if len(vals) < 64:
                    raise ValueError("truncated JPEG DQT")
                qtables[tq] = vals
        elif marker == 0xC4:  # DHT
            i = 0
            while i + 17 <= len(seg):
                tc, th = seg[i] >> 4, seg[i] & 0x0F
                counts = seg[i + 1 : i + 17]
                nsym = sum(counts)
                symbols = seg[i + 17 : i + 17 + nsym]
                if len(symbols) < nsym:
                    raise ValueError("truncated JPEG DHT")
                htables[(tc, th)] = _build_huffman(counts, symbols)
                i += 17 + nsym
        elif marker in (0xC0, 0xC1):  # SOF0 baseline / SOF1 ext. sequential
            if len(seg) < 6:
                raise ValueError("truncated JPEG SOF")
            prec = seg[0]
            h = int.from_bytes(seg[1:3], "big")
            w = int.from_bytes(seg[3:5], "big")
            ncomp = seg[5]
            if prec != 8:
                raise ValueError(f"unsupported JPEG precision {prec}")
            if h < 1 or w < 1 or ncomp not in (1, 3):
                raise ValueError("unsupported JPEG frame geometry")
            comps = []
            for c in range(ncomp):
                cid, hv, tq = seg[6 + 3 * c : 9 + 3 * c]
                comps.append(
                    {"id": cid, "h": hv >> 4, "v": hv & 0x0F, "tq": tq}
                )
            frame = (h, w, comps)
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            raise ValueError(
                "unsupported JPEG process (progressive/arithmetic/"
                "lossless) — baseline sequential only"
            )
        elif marker == 0xDD:  # DRI
            restart_interval = int.from_bytes(seg[0:2], "big")
        elif marker == 0xDA:  # SOS
            if frame is None:
                raise ValueError("JPEG SOS before SOF")
            ns = seg[0]
            scan = []
            for c in range(ns):
                cs, tdta = seg[1 + 2 * c : 3 + 2 * c]
                scan.append((cs, tdta >> 4, tdta & 0x0F))
            pos += ln
            break
        pos += ln

    h, w, comps = frame
    byid = {c["id"]: c for c in comps}
    order = []
    for cs, td, ta in scan:
        if cs not in byid:
            raise ValueError("JPEG scan references unknown component")
        c = dict(byid[cs])
        c["dc"] = htables.get((0, td))
        c["ac"] = htables.get((1, ta))
        c["qt"] = qtables.get(c["tq"])
        if c["dc"] is None or c["ac"] is None or c["qt"] is None:
            raise ValueError("JPEG scan references missing table")
        order.append(c)
    if len(order) != len(comps):
        raise ValueError("multi-scan JPEG not supported (baseline only)")

    hmax = max(c["h"] for c in order)
    vmax = max(c["v"] for c in order)
    if hmax < 1 or vmax < 1 or any(
        c["h"] < 1 or c["v"] < 1 or hmax % c["h"] or vmax % c["v"]
        for c in order
    ):
        raise ValueError("unsupported JPEG sampling factors")
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    M = _dct_mat()
    planes = []
    for c in order:
        planes.append(
            np.zeros((mcuy * c["v"] * 8, mcux * c["h"] * 8), np.float64)
        )
        c["qvec"] = np.array(c["qt"], np.float64)

    reader = _BitReader(blob, pos)
    preds = [0] * len(order)
    zz = np.array(_ZIGZAG)
    nrst = 0
    for my in range(mcuy):
        for mx in range(mcux):
            imcu = my * mcux + mx
            if restart_interval and imcu and imcu % restart_interval == 0:
                reader.restart(nrst)
                nrst = (nrst + 1) & 7
                preds = [0] * len(order)
            for ci, c in enumerate(order):
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        coefs, preds[ci] = _decode_block(
                            reader, c["dc"], c["ac"], preds[ci]
                        )
                        deq = np.asarray(coefs, np.float64) * c["qvec"]
                        blk = np.zeros(64, np.float64)
                        blk[zz] = deq
                        px = M.T @ blk.reshape(8, 8) @ M + 128.0
                        y0 = (my * c["v"] + by) * 8
                        x0 = (mx * c["h"] + bx) * 8
                        planes[ci][y0 : y0 + 8, x0 : x0 + 8] = px

    full = []
    for ci, c in enumerate(order):
        p = planes[ci]
        p = np.repeat(np.repeat(p, vmax // c["v"], 0), hmax // c["h"], 1)
        full.append(p[:h, :w])
    if len(full) == 1:
        g = np.clip(np.round(full[0]), 0, 255).astype(np.uint8)
        return np.stack([g, g, g], axis=-1)
    y, cb, cr = full
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    return np.clip(
        np.round(np.stack([r, g, b], axis=-1)), 0, 255
    ).astype(np.uint8)


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
            if byte == 0xFF:  # byte stuffing
                self.out.append(0x00)
        self.acc &= (1 << self.nbits) - 1

    def align(self):
        """Pad the partial byte with 1-bits (T.81 F.1.2.3)."""
        if self.nbits:
            self.write((1 << (8 - self.nbits)) - 1, 8 - self.nbits)


def _quality_tables(quality: int):
    """libjpeg quality scaling of the Annex K tables."""
    quality = min(100, max(1, int(quality)))
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    def scaled(base):
        return [min(255, max(1, (v * scale + 50) // 100)) for v in base]
    return scaled(_QT_LUM), scaled(_QT_CHROM)


def _encode_value_bits(v: int) -> tuple[int, int]:
    """(category, magnitude bits) for a DC diff / AC coefficient."""
    s = abs(v).bit_length()
    return s, (v if v >= 0 else v + (1 << s) - 1)


def _encode_block(writer, blk_q, dc_codes, ac_codes, pred: int) -> int:
    zz = [int(blk_q[_ZIGZAG[i] >> 3][_ZIGZAG[i] & 7]) for i in range(64)]
    s, bits = _encode_value_bits(zz[0] - pred)
    code, ln = dc_codes[s]
    writer.write(code, ln)
    if s:
        writer.write(bits, s)
    run = 0
    for k in range(1, 64):
        if zz[k] == 0:
            run += 1
            continue
        while run > 15:
            code, ln = ac_codes[0xF0]  # ZRL
            writer.write(code, ln)
            run -= 16
        s, bits = _encode_value_bits(zz[k])
        code, ln = ac_codes[(run << 4) | s]
        writer.write(code, ln)
        writer.write(bits, s)
        run = 0
    if run:
        code, ln = ac_codes[0x00]  # EOB
        writer.write(code, ln)
    return zz[0]


def encode_jpeg(
    rgb,
    quality: int = 90,
    subsample: bool = False,
    restart_interval: int = 0,
) -> bytes:
    """Encode an (h, w, 3) or (h, w) uint8 array as baseline JFIF JPEG
    with the Annex K tables. ``subsample=True`` writes 4:2:0 (2x2 box-
    averaged chroma), else 4:4:4. ``restart_interval`` > 0 emits DRI +
    RSTn markers every that many MCUs (exercises the decoder's resync
    path)."""
    import numpy as np

    arr = np.asarray(rgb, np.float64)
    gray = arr.ndim == 2
    if gray:
        arr = arr[:, :, None]
    h, w = arr.shape[:2]
    if h < 1 or w < 1:
        raise ValueError("empty image")
    qlum, qchrom = _quality_tables(quality)

    if gray:
        planes = [arr[:, :, 0]]
        samp = [(1, 1)]
        qsel = [0]
    else:
        r, g, b = arr[:, :, 0], arr[:, :, 1], arr[:, :, 2]
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = 128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b
        cr = 128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b
        if subsample:
            samp = [(2, 2), (1, 1), (1, 1)]
        else:
            samp = [(1, 1), (1, 1), (1, 1)]
        planes = [y, cb, cr]
        qsel = [0, 1, 1]
    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))

    prepped = []
    for (sh, sv), plane in zip(samp, planes):
        if (sh, sv) != (hmax, vmax):
            fy, fx = vmax // sv, hmax // sh
            ph = -(-plane.shape[0] // fy) * fy
            pw = -(-plane.shape[1] // fx) * fx
            pad = np.pad(
                plane, ((0, ph - plane.shape[0]), (0, pw - plane.shape[1])),
                mode="edge",
            )
            plane = pad.reshape(ph // fy, fy, pw // fx, fx).mean((1, 3))
        th, tw = mcuy * sv * 8, mcux * sh * 8
        plane = np.pad(
            plane,
            ((0, th - plane.shape[0]), (0, tw - plane.shape[1])),
            mode="edge",
        )
        prepped.append(plane)

    M = _dct_mat()
    # the Annex K base tables are natural row-major 8x8 matrices
    qmats = [
        np.asarray(qlum, np.float64).reshape(8, 8),
        np.asarray(qchrom, np.float64).reshape(8, 8),
    ]

    dc_codes = [_huffman_codes(*_HT_DC_LUM), _huffman_codes(*_HT_DC_CHROM)]
    ac_codes = [_huffman_codes(*_HT_AC_LUM), _huffman_codes(*_HT_AC_CHROM)]

    writer = _BitWriter()
    preds = [0] * len(planes)
    nrst = 0
    for my in range(mcuy):
        for mx in range(mcux):
            imcu = my * mcux + mx
            if restart_interval and imcu and imcu % restart_interval == 0:
                writer.align()
                writer.out += bytes((0xFF, 0xD0 + nrst))
                nrst = (nrst + 1) & 7
                preds = [0] * len(planes)
            for ci, ((sh, sv), plane) in enumerate(zip(samp, prepped)):
                t = qsel[ci]
                for by in range(sv):
                    for bx in range(sh):
                        y0 = (my * sv + by) * 8
                        x0 = (mx * sh + bx) * 8
                        blk = plane[y0 : y0 + 8, x0 : x0 + 8] - 128.0
                        f = M @ blk @ M.T
                        q = np.round(f / qmats[t]).astype(np.int64)
                        preds[ci] = _encode_block(
                            writer, q, dc_codes[t], ac_codes[t], preds[ci]
                        )
    writer.align()

    def seg(marker: int, payload: bytes) -> bytes:
        return bytes((0xFF, marker)) + (len(payload) + 2).to_bytes(2, "big") + payload

    out = bytearray(b"\xff\xd8")
    out += seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    def zzq(base) -> bytes:
        # DQT payloads are serialized in zigzag order (T.81 B.2.4.1)
        return bytes(base[_ZIGZAG[i]] for i in range(64))
    out += seg(0xDB, b"\x00" + zzq(qlum))
    ncomp = len(planes)
    if ncomp == 3:
        out += seg(0xDB, b"\x01" + zzq(qchrom))
    sof = bytes((8,)) + h.to_bytes(2, "big") + w.to_bytes(2, "big") + bytes(
        (ncomp,)
    )
    for ci in range(ncomp):
        sof += bytes((ci + 1, (samp[ci][0] << 4) | samp[ci][1], qsel[ci]))
    out += seg(0xC0, sof)
    out += seg(0xC4, b"\x00" + _HT_DC_LUM[0] + _HT_DC_LUM[1])
    out += seg(0xC4, b"\x10" + _HT_AC_LUM[0] + _HT_AC_LUM[1])
    if ncomp == 3:
        out += seg(0xC4, b"\x01" + _HT_DC_CHROM[0] + _HT_DC_CHROM[1])
        out += seg(0xC4, b"\x11" + _HT_AC_CHROM[0] + _HT_AC_CHROM[1])
    if restart_interval:
        out += seg(0xDD, restart_interval.to_bytes(2, "big"))
    sos = bytes((ncomp,))
    for ci in range(ncomp):
        t = qsel[ci]
        sos += bytes((ci + 1, (t << 4) | t))
    sos += b"\x00\x3f\x00"
    out += seg(0xDA, sos)
    out += writer.out
    out += b"\xff\xd9"
    return bytes(out)
