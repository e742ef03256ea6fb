"""Multimodal column plumbing: image/audio/video as opaque binary
columns with typed metadata.

The container ships no codec libraries, so each modality decodes its
one RAW format for real and stubs the compressed ones honestly:
- IMAGE: 24-bit uncompressed BMP (pure numpy, ``_decode_bmp``),
  8-bit non-interlaced PNG (stdlib zlib inflate + numpy unfiltering,
  ``_decode_png`` — PNG's only entropy layer is DEFLATE, which the
  stdlib ships), GIF87a/89a (pure-Python LZW + palette mapping,
  ``_decode_gif``, incl. interlace), AND JPEG — baseline and
  progressive Huffman both (pure Python+numpy, ``llm.jpeg``) —
  decode/resize/aHash FOR REAL; the image tier has NO stubs left
  (arithmetic-coded/lossless JPEG raises honestly).
- VIDEO: Y4M (yuv4mpeg2) frame extraction is REAL (text header + raw
  YUV planes); webm/mp4 CONTAINER metadata is REAL (``mkv_audit`` /
  ``mp4_audit`` header walks) — only the codec bitstream decode stays
  stubbed (needs ffmpeg).
- AUDIO: WAV decode, resampling AND spectral feature extraction are
  REAL (stdlib wave/audioop + numpy rFFT filterbank); mp3 FRAMING,
  ogg PAGING and FLAC STREAMINFO metadata are REAL (``mp3_audit``
  frame-header walk, ``ogg_audit`` page walk + Vorbis/Opus ID
  headers, ``flac_audit`` metadata-block walk — frames/pages,
  duration, bitrate, CBR/VBR); only mp3/vorbis/opus/FLAC sample
  DECODE stays stubbed (needs a codec).
The stubs are deterministic fakes (fake=True) or NotImplementedError
(fake=False), and everything Spark-side is real and tested either way:
schema contract, Arrow batch shape, mapInPandas signatures, partition
sizing. Swapping a stub for Pillow/ffmpeg is a one-function change on
a real cluster.

Scale notes: binary payloads ride in the row (parquet BYTE_ARRAY);
keep `spark.sql.files.maxPartitionBytes` moderate so a partition of
blobs fits executor memory; metadata-only transforms must select
narrow columns so the scan prunes the blob column away entirely.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# media struct contract: every multimodal table carries these columns
MEDIA_META_SCHEMA = "size_bytes bigint, digest string, format string"

# decompression-bomb guard shared by the compressed-raster decoders
# (PNG inflate, GIF LZW/canvas, JPEG has its own copy): a ~100-byte
# header claiming 65535x65535 must become a quarantinable ValueError,
# not a multi-GB allocation that OOMs the executor task — at 100 TB of
# untrusted blobs some WILL be hostile, not just malformed.
_MAX_PIXELS = 1 << 24

_MAGIC = {
    b"\x89PNG": "png",
    b"GIF8": "gif",
    b"\xff\xd8\xff": "jpeg",
    b"BM": "bmp",
    b"YUV4MPEG2": "y4m",
    b"RIFF": "wav",
    b"ID3": "mp3",
    b"OggS": "ogg",
    b"fLaC": "flac",
    b"\x1f\x8b": "gzip",
    b"PK\x03\x04": "zip",
    b"\x28\xb5\x2f\xfd": "zstd",
    b"WARC/": "warc",
    b"\x1a\x45\xdf\xa3": "webm",
    b"II*\x00": "tiff",
    b"MM\x00*": "tiff",
}


def _decode_bmp(blob: bytes):
    """REAL pure-numpy decoder for uncompressed 24-bit BMP
    (BITMAPINFOHEADER): returns an (h, w) float64 luma array ((r+g+b)/3).
    BMP is byte-exact without any codec library — the one mainstream
    raster format this container CAN truly decode — so the image path's
    honest stub boundary shrank format by format until (r9) no image
    stub remains. Raises ValueError on non-BMP or unsupported
    variants (compressed, non-24bpp)."""
    import numpy as np

    if len(blob) < 54 or blob[:2] != b"BM":
        raise ValueError("not a BMP payload")
    off = int.from_bytes(blob[10:14], "little")
    hdr = int.from_bytes(blob[14:18], "little")
    w = int.from_bytes(blob[18:22], "little", signed=True)
    h = int.from_bytes(blob[22:26], "little", signed=True)
    bpp = int.from_bytes(blob[28:30], "little")
    comp = int.from_bytes(blob[30:34], "little")
    if hdr < 40 or bpp != 24 or comp != 0 or w <= 0 or h == 0:
        raise ValueError(
            f"unsupported BMP variant (hdr={hdr}, bpp={bpp}, comp={comp})"
        )
    flip = h > 0  # positive height = bottom-up row order
    h = abs(h)
    stride = ((w * 3 + 3) // 4) * 4
    need = off + stride * h
    if len(blob) < need:
        raise ValueError(f"truncated BMP: {len(blob)} < {need} bytes")
    px = (
        np.frombuffer(blob, dtype=np.uint8, count=stride * h, offset=off)
        .reshape(h, stride)[:, : w * 3]
        .reshape(h, w, 3)
    )
    if flip:
        px = px[::-1]
    return px.astype(np.float64).mean(axis=2)  # BGR mean == RGB mean


_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _decode_png(blob: bytes):
    """REAL pure-stdlib+numpy decoder for 8-bit non-interlaced PNG
    (gray / gray+alpha / truecolor / truecolor+alpha): inflate the
    concatenated IDAT stream with zlib, undo scanline filters 0-4
    (None/Sub/Up/Average/Paeth), return an (h, w, channels) uint8
    array. PNG's only entropy layer is DEFLATE, which the stdlib
    ships, so — like BMP — the format is decodable without any codec
    library; with llm.jpeg (r9) the image tier has no stub left.
    Raises ValueError on non-PNG or unsupported variants (16-bit,
    palette, interlaced)."""
    import zlib

    import numpy as np

    if len(blob) < 8 or blob[:8] != _PNG_SIG:
        raise ValueError("not a PNG payload")
    pos, ihdr, idat = 8, None, bytearray()
    while pos + 8 <= len(blob):
        ln = int.from_bytes(blob[pos : pos + 4], "big")
        typ = blob[pos + 4 : pos + 8]
        data = blob[pos + 8 : pos + 8 + ln]
        if len(data) < ln:
            raise ValueError("truncated PNG chunk")
        if typ == b"IHDR":
            ihdr = data
        elif typ == b"IDAT":
            idat += data
        elif typ == b"IEND":
            break
        pos += 12 + ln  # length + type + payload + crc
    if ihdr is None or len(ihdr) < 13 or not idat:
        raise ValueError("malformed PNG: missing IHDR/IDAT")
    w = int.from_bytes(ihdr[0:4], "big")
    h = int.from_bytes(ihdr[4:8], "big")
    bitd, color, comp, filt, interlace = ihdr[8:13]
    channels = {0: 1, 2: 3, 4: 2, 6: 4}.get(color)
    if (
        bitd != 8 or channels is None or comp != 0 or filt != 0
        or interlace != 0 or w < 1 or h < 1
    ):
        raise ValueError(
            f"unsupported PNG variant (depth={bitd}, color={color}, "
            f"interlace={interlace})"
        )
    if w * h > _MAX_PIXELS:
        raise ValueError(f"PNG dimensions {w}x{h} exceed the decoder cap")
    stride = w * channels
    need = h * (stride + 1)
    try:
        # bounded inflate: a zlib bomb in IDAT can expand far past the
        # declared geometry — never inflate more than the scanlines need
        raw = zlib.decompressobj().decompress(bytes(idat), need)
    except zlib.error as exc:
        raise ValueError(f"corrupt PNG IDAT stream: {exc}") from exc
    if len(raw) < need:
        raise ValueError("truncated PNG pixel data")
    rows = np.frombuffer(raw, np.uint8, count=h * (stride + 1)).reshape(
        h, stride + 1
    )
    out = np.zeros((h, stride), dtype=np.uint8)
    bpp = channels  # bytes per pixel at depth 8
    for y in range(h):
        f = int(rows[y, 0])
        rec = rows[y, 1:].astype(np.int32)
        prior = out[y - 1].astype(np.int32) if y else np.zeros(stride, np.int32)
        if f == 0:
            pass
        elif f == 1:  # Sub: left neighbor — sequential along x
            for x in range(bpp, stride):
                rec[x] = (rec[x] + rec[x - bpp]) & 0xFF
        elif f == 2:  # Up: vectorized against the prior scanline
            rec = (rec + prior) & 0xFF
        elif f == 3:  # Average
            for x in range(stride):
                left = rec[x - bpp] if x >= bpp else 0
                rec[x] = (rec[x] + ((left + prior[x]) >> 1)) & 0xFF
        elif f == 4:  # Paeth
            for x in range(stride):
                a = int(rec[x - bpp]) if x >= bpp else 0
                b = int(prior[x])
                c = int(prior[x - bpp]) if x >= bpp else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pr = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                rec[x] = (rec[x] + pr) & 0xFF
        else:
            raise ValueError(f"malformed PNG: unknown scanline filter {f}")
        out[y] = rec & 0xFF
    return out.reshape(h, w, channels)


def _png_luma(px) -> "object":
    """(h, w, c) uint8 → (h, w) float64 luma: color-channel mean
    ((r+g+b)/3, alpha ignored; gray passes through) — the same luma
    contract _decode_bmp returns, so aHash/decode share one path."""
    c = px.shape[2]
    color = px[:, :, :1] if c <= 2 else px[:, :, :3]
    return color.astype("float64").mean(axis=2)


def _encode_png(px) -> bytes:
    """Minimal valid truecolor 8-bit PNG writer (filter 0 scanlines,
    one zlib IDAT) for resize re-encode; round-trips through
    _decode_png byte-exactly."""
    import zlib

    h, w, c = px.shape
    if c != 3:
        raise ValueError(f"encoder writes truecolor only, got {c} channels")

    def chunk(typ: bytes, data: bytes) -> bytes:
        return (
            len(data).to_bytes(4, "big") + typ + data
            + zlib.crc32(typ + data).to_bytes(4, "big")
        )

    ihdr = (
        w.to_bytes(4, "big") + h.to_bytes(4, "big") + bytes([8, 2, 0, 0, 0])
    )
    raw = b"".join(b"\x00" + px[y].tobytes() for y in range(h))
    return (
        _PNG_SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


_GIF_SIGS = (b"GIF87a", b"GIF89a")
_JPEG_SIG = b"\xff\xd8\xff"


def _gif_lzw_decode(data: bytes, min_code_size: int, n_pixels: int):
    """GIF-variant LZW decode of a concatenated image data stream →
    list of palette indices. Codes are read LSB-first; the code width
    starts at min_code_size+1 and bumps whenever the next free
    dictionary slot reaches 2**width (capped at 12 bits, the GIF
    maximum); the clear code resets the table. Pure stdlib — LZW has
    no entropy layer beyond the variable-width codes themselves."""
    clear = 1 << min_code_size
    end = clear + 1
    out: list[int] = []
    table: list[bytes] = []

    def reset():
        nonlocal width, nxt
        table.clear()
        table.extend(bytes([i]) for i in range(clear))
        table.append(b"")  # clear slot
        table.append(b"")  # end slot
        width = min_code_size + 1
        nxt = end + 1

    width = nxt = 0
    reset()
    acc = bits = pos = 0
    prev: bytes | None = None
    while True:
        while bits < width:
            if pos >= len(data):
                return out  # missing end code: tolerate, like decoders do
            acc |= data[pos] << bits
            bits += 8
            pos += 1
        code = acc & ((1 << width) - 1)
        acc >>= width
        bits -= width
        if code == clear:
            reset()
            prev = None
            continue
        if code == end:
            return out
        if prev is None:
            if code >= clear:
                raise ValueError("corrupt GIF LZW: first code not literal")
            entry = table[code]
        elif code < nxt:
            entry = table[code]
        elif code == nxt:
            entry = prev + prev[:1]
        else:
            raise ValueError("corrupt GIF LZW: code beyond table")
        if prev is not None and nxt < 4096:
            table.append(prev + entry[:1])
            nxt += 1
            if nxt == (1 << width) and width < 12:
                width += 1
        out.extend(entry)
        if len(out) >= n_pixels:
            return out
        prev = entry


def _decode_gif(blob: bytes):
    """REAL pure-stdlib+numpy decoder for GIF87a/89a (first frame):
    parse the logical screen + color tables, skip extension blocks,
    LZW-decode the first image's index stream (``_gif_lzw_decode``),
    de-interlace if flagged, map through the palette to an (h, w, 3)
    uint8 array. GIF's only compression is LZW over palette indices —
    no codec library needed; with llm.jpeg (r9) the image tier's
    honest stub boundary is gone. Raises ValueError on non-GIF or malformed
    streams; animated GIFs decode their FIRST frame (documented)."""
    arr, palette = _decode_gif_indexed(blob)
    return palette[arr]  # (h, w, 3) uint8


def _decode_gif_indexed(blob: bytes):
    """GIF decode to the native (index grid, palette) pair — the form
    palette-space transforms (resize-in-kind) consume; `_decode_gif`
    maps it to RGB."""
    import numpy as np

    if len(blob) < 13 or blob[:6] not in _GIF_SIGS:
        raise ValueError("not a GIF payload")
    packed = blob[10]
    pos = 13
    gct = None
    if packed & 0x80:
        n = 3 * (2 << (packed & 0x07))
        gct = blob[pos : pos + n]
        if len(gct) < n:
            raise ValueError("truncated GIF global color table")
        pos += n
    while pos < len(blob):
        b0 = blob[pos]
        if b0 == 0x21:  # extension: label + sub-blocks until terminator
            pos += 2
            while pos < len(blob) and blob[pos] != 0:
                pos += 1 + blob[pos]
            pos += 1
        elif b0 == 0x2C:  # image descriptor
            if pos + 10 > len(blob):
                raise ValueError("truncated GIF image descriptor")
            w = int.from_bytes(blob[pos + 5 : pos + 7], "little")
            h = int.from_bytes(blob[pos + 7 : pos + 9], "little")
            ipk = blob[pos + 9]
            pos += 10
            pal = gct
            if ipk & 0x80:
                n = 3 * (2 << (ipk & 0x07))
                pal = blob[pos : pos + n]
                if len(pal) < n:
                    raise ValueError("truncated GIF local color table")
                pos += n
            if pal is None:
                raise ValueError("GIF image without any color table")
            if w < 1 or h < 1:
                raise ValueError("empty GIF image")
            if w * h > _MAX_PIXELS:
                raise ValueError(
                    f"GIF dimensions {w}x{h} exceed the decoder cap"
                )
            if pos >= len(blob):
                raise ValueError("truncated GIF image data")
            min_code = blob[pos]
            pos += 1
            if not 2 <= min_code <= 8:
                raise ValueError(f"bad GIF LZW min code size {min_code}")
            data = bytearray()
            while pos < len(blob) and blob[pos] != 0:
                ln = blob[pos]
                data += blob[pos + 1 : pos + 1 + ln]
                pos += 1 + ln
            idx = _gif_lzw_decode(bytes(data), min_code, w * h)
            if len(idx) < w * h:
                raise ValueError("truncated GIF pixel data")
            arr = np.asarray(idx[: w * h], dtype=np.int32).reshape(h, w)
            if ipk & 0x40:  # interlaced: 4-pass row shuffle
                order = (
                    list(range(0, h, 8)) + list(range(4, h, 8))
                    + list(range(2, h, 4)) + list(range(1, h, 2))
                )
                deinter = np.empty_like(arr)
                deinter[order] = arr
                arr = deinter
            palette = np.frombuffer(pal, np.uint8).reshape(-1, 3)
            if int(arr.max()) >= palette.shape[0]:
                raise ValueError("GIF index beyond color table")
            return arr, palette
        elif b0 == 0x3B:  # trailer before any image
            break
        else:
            raise ValueError(f"malformed GIF block 0x{b0:02x}")
    raise ValueError("GIF contains no image data")


def _gif_lzw_encode(flat, n: int) -> tuple[int, bytes]:
    """REAL GIF LZW encode of a flat index sequence over an n-color
    table → (min_code_size, sub-blocked data incl. terminator), with
    the width-bump discipline the decoder mirrors: the decoder adds
    its entry one code LATER than the encoder, so a width increase
    takes effect only at the emit AFTER the add that filled the width
    — emit, THEN check the pending bump, THEN add (the Heckbert
    compress() output/check/add order)."""
    min_code = max(2, (n - 1).bit_length())
    clear = 1 << min_code
    end = clear + 1

    out_bits = bytearray()
    acc = bits = 0

    def emit(code: int, width: int):
        nonlocal acc, bits
        acc |= code << bits
        bits += width
        while bits >= 8:
            out_bits.append(acc & 0xFF)
            acc >>= 8
            bits -= 8

    width = min_code + 1
    nxt = end + 1
    table: dict[bytes, int] = {bytes([i]): i for i in range(n)}

    def bump_if_pending():
        nonlocal width
        if nxt > (1 << width) - 1 and width < 12:
            width += 1

    emit(clear, width)
    prev = b""
    for k in flat:
        cur = prev + bytes([int(k)])
        if cur in table:
            prev = cur
            continue
        emit(table[prev], width)
        bump_if_pending()
        if nxt < 4096:
            table[cur] = nxt
            nxt += 1
        else:  # table full: reset (keeps the stream simple and valid)
            emit(clear, width)
            table = {bytes([i]): i for i in range(n)}
            width = min_code + 1
            nxt = end + 1
        prev = bytes([int(k)])
    if prev:
        emit(table[prev], width)
        bump_if_pending()
    emit(end, width)
    if bits:
        out_bits.append(acc & 0xFF)
    data = bytes(out_bits)
    sub = b"".join(
        bytes([min(255, len(data) - i)]) + data[i : i + 255]
        for i in range(0, len(data), 255)
    ) + b"\x00"
    return min_code, sub


def _gif_palette_field(palette):
    """Validate a GIF color table and return (pal_uint8, size_field)."""
    import numpy as np

    pal = np.asarray(palette, dtype=np.uint8)
    n = pal.shape[0]
    size_field = max(1, (n - 1).bit_length() - 1)  # 2**(f+1) == n
    if n != (2 << size_field) or n < 4:
        raise ValueError(f"palette size must be a power of two >= 4, got {n}")
    return pal, size_field


def _iter_gif_frames(blob: bytes):
    """FULL animated-GIF decode, GENERATOR form: composite every frame
    onto the logical-screen canvas honoring the Graphic Control
    Extension — per-frame delay (centiseconds), disposal method
    (1 leave / 2 restore-background / 3 restore-previous) and
    transparency (transparent-index pixels leave the canvas unchanged)
    plus frame placement rects and per-frame interlacing. Yields
    ((H, W, 3) uint8 RGB canvas snapshot, delay_cs) one frame at a
    time so a digest-only consumer (sample_frames) holds ONE canvas +
    one snapshot regardless of frame count — a million-frame GIF is
    CPU-proportional, never memory-proportional. The first-frame
    decoders (`_decode_gif`) read only the first image's own rect;
    this is the real animation semantics on the same pure-Python LZW
    substrate. Raises ValueError on malformed streams (lazily, during
    iteration — wrap the LOOP, not just the call)."""
    import numpy as np

    if len(blob) < 13 or blob[:6] not in _GIF_SIGS:
        raise ValueError("not a GIF payload")
    W = int.from_bytes(blob[6:8], "little")
    H = int.from_bytes(blob[8:10], "little")
    if W < 1 or H < 1:
        raise ValueError("empty GIF logical screen")
    if W * H > _MAX_PIXELS:
        raise ValueError(f"GIF screen {W}x{H} exceeds the decoder cap")
    packed = blob[10]
    bg = blob[11]
    pos = 13
    gpal = None
    if packed & 0x80:
        n = 3 * (2 << (packed & 0x07))
        gct = blob[pos : pos + n]
        if len(gct) < n:
            raise ValueError("truncated GIF global color table")
        gpal = np.frombuffer(gct, np.uint8).reshape(-1, 3)
        pos += n
    canvas = np.zeros((H, W, 3), np.uint8)
    bg_rgb = None
    if gpal is not None and bg < gpal.shape[0]:
        bg_rgb = gpal[bg]
        canvas[:] = bg_rgb
    yielded = False
    delay, disposal, trans = 0, 0, None
    prev = None
    while pos < len(blob):
        b0 = blob[pos]
        if b0 == 0x21:  # extension
            label = blob[pos + 1] if pos + 1 < len(blob) else 0
            if (
                label == 0xF9
                and pos + 7 < len(blob)
                and blob[pos + 2] == 4
            ):  # Graphic Control Extension
                flags = blob[pos + 3]
                delay = int.from_bytes(blob[pos + 4 : pos + 6], "little")
                disposal = (flags >> 2) & 0x07
                trans = blob[pos + 6] if flags & 0x01 else None
            pos += 2
            while pos < len(blob) and blob[pos] != 0:
                pos += 1 + blob[pos]
            pos += 1
        elif b0 == 0x2C:  # image descriptor
            if pos + 10 > len(blob):
                raise ValueError("truncated GIF image descriptor")
            left = int.from_bytes(blob[pos + 1 : pos + 3], "little")
            top = int.from_bytes(blob[pos + 3 : pos + 5], "little")
            w = int.from_bytes(blob[pos + 5 : pos + 7], "little")
            h = int.from_bytes(blob[pos + 7 : pos + 9], "little")
            ipk = blob[pos + 9]
            pos += 10
            pal = gpal
            if ipk & 0x80:
                n = 3 * (2 << (ipk & 0x07))
                lct = blob[pos : pos + n]
                if len(lct) < n:
                    raise ValueError("truncated GIF local color table")
                pal = np.frombuffer(lct, np.uint8).reshape(-1, 3)
                pos += n
            if pal is None:
                raise ValueError("GIF image without any color table")
            if w < 1 or h < 1:
                raise ValueError("empty GIF image")
            if left + w > W or top + h > H:
                raise ValueError("GIF frame exceeds the logical screen")
            if pos >= len(blob):
                raise ValueError("truncated GIF image data")
            min_code = blob[pos]
            pos += 1
            if not 2 <= min_code <= 8:
                raise ValueError(f"bad GIF LZW min code size {min_code}")
            data = bytearray()
            while pos < len(blob) and blob[pos] != 0:
                ln = blob[pos]
                data += blob[pos + 1 : pos + 1 + ln]
                pos += 1 + ln
            pos += 1  # data terminator
            idx = _gif_lzw_decode(bytes(data), min_code, w * h)
            if len(idx) < w * h:
                raise ValueError("truncated GIF pixel data")
            arr = np.asarray(idx[: w * h], dtype=np.int32).reshape(h, w)
            if ipk & 0x40:  # interlaced
                order = (
                    list(range(0, h, 8)) + list(range(4, h, 8))
                    + list(range(2, h, 4)) + list(range(1, h, 2))
                )
                deinter = np.empty_like(arr)
                deinter[order] = arr
                arr = deinter
            opaque = arr != trans if trans is not None else np.ones(
                arr.shape, bool
            )
            if opaque.any() and int(arr[opaque].max()) >= pal.shape[0]:
                raise ValueError("GIF index beyond color table")
            if disposal == 3:
                prev = canvas.copy()
            region = canvas[top : top + h, left : left + w]
            safe = np.where(opaque, arr, 0)
            region[opaque] = pal[safe][opaque]
            yield canvas.copy(), delay
            yielded = True
            if disposal == 2:
                canvas[top : top + h, left : left + w] = (
                    bg_rgb if bg_rgb is not None else 0
                )
            elif disposal == 3 and prev is not None:
                canvas = prev
            delay, disposal, trans = 0, 0, None
        elif b0 == 0x3B:
            break
        else:
            raise ValueError(f"malformed GIF block 0x{b0:02x}")
    if not yielded:
        raise ValueError("GIF contains no image data")


def _decode_gif_frames(blob: bytes):
    """Eager list form of :func:`_iter_gif_frames` — for tests and
    small fixtures where holding every composed canvas is fine."""
    return list(_iter_gif_frames(blob))


def _encode_gif(indices, palette) -> bytes:
    """Minimal valid non-interlaced GIF87a writer (global color table,
    one frame, REAL LZW via ``_gif_lzw_encode``) — exists for
    round-trip tests and palette re-encode, the _encode_png precedent.
    ``indices`` is an (h, w) integer array, ``palette`` an (n, 3)
    uint8 array (n a power of two, 4..256)."""
    import numpy as np

    idx = np.asarray(indices)
    pal, size_field = _gif_palette_field(palette)
    h, w = idx.shape
    min_code, sub = _gif_lzw_encode(idx.reshape(-1).tolist(), pal.shape[0])
    return (
        b"GIF87a"
        + w.to_bytes(2, "little") + h.to_bytes(2, "little")
        + bytes([0x80 | size_field, 0, 0])
        + pal.tobytes()
        + b"\x2c" + b"\x00" * 4
        + w.to_bytes(2, "little") + h.to_bytes(2, "little")
        + b"\x00"
        + bytes([min_code]) + sub
        + b"\x3b"
    )


def _encode_gif_anim(
    frames,
    palette,
    screen_wh: tuple[int, int],
    delays_cs=None,
    disposals=None,
    transparents=None,
    background: int = 0,
) -> bytes:
    """Animated GIF89a writer: per-frame (indices, left, top) placed on
    a (W, H) logical screen, one Graphic Control Extension per frame
    carrying delay (centiseconds), disposal method (0 none / 1 leave /
    2 restore-background / 3 restore-previous) and optional
    transparent index. The multi-frame sibling of :func:`_encode_gif`
    — exists so the frame compositor has an encoder-independent
    round-trip partner (fixtures stay hand-buildable, the
    hand-packed-bitstream test discipline)."""
    pal, size_field = _gif_palette_field(palette)
    W, H = screen_wh
    nf = len(frames)
    delays_cs = list(delays_cs or [0] * nf)
    disposals = list(disposals or [0] * nf)
    transparents = list(transparents if transparents is not None else [None] * nf)
    if not (len(delays_cs) == len(disposals) == len(transparents) == nf):
        raise ValueError("per-frame metadata lists must match frame count")
    out = bytearray(
        b"GIF89a"
        + W.to_bytes(2, "little") + H.to_bytes(2, "little")
        + bytes([0x80 | size_field, background & 0xFF, 0])
        + pal.tobytes()
    )
    import numpy as np

    for (idx, left, top), delay, disp, trans in zip(
        frames, delays_cs, disposals, transparents
    ):
        idx = np.asarray(idx)
        h, w = idx.shape
        if left + w > W or top + h > H:
            raise ValueError("frame exceeds the logical screen")
        flags = ((disp & 7) << 2) | (1 if trans is not None else 0)
        out += (
            b"\x21\xf9\x04"
            + bytes([flags])
            + int(delay).to_bytes(2, "little")
            + bytes([trans if trans is not None else 0])
            + b"\x00"
        )
        min_code, sub = _gif_lzw_encode(
            idx.reshape(-1).tolist(), pal.shape[0]
        )
        out += (
            b"\x2c"
            + int(left).to_bytes(2, "little") + int(top).to_bytes(2, "little")
            + w.to_bytes(2, "little") + h.to_bytes(2, "little")
            + b"\x00"
            + bytes([min_code]) + sub
        )
    out += b"\x3b"
    return bytes(out)


def _gif_structure(blob: bytes) -> dict:
    """Container-structure walk of a GIF87a/89a stream WITHOUT decoding
    pixels: frame boundaries, per-frame GCE delays (centiseconds) and
    the NETSCAPE2.0 loop extension are read from the block headers
    while every LZW data block is SKIPPED via its sub-block length
    bytes — O(len(blob)) byte scan, zero decode CPU, zero canvas
    memory. Returns ``{width, height, n_frames, delays, loop_count}``
    (``loop_count`` None when the NETSCAPE extension is absent; 0 means
    loop forever per the spec). Raises ValueError on non-GIF or
    malformed/truncated streams — same error contract as the real
    decoders, so the quarantine routing is shared."""
    if len(blob) < 13 or blob[:6] not in _GIF_SIGS:
        raise ValueError("not a GIF payload")
    width = int.from_bytes(blob[6:8], "little")
    height = int.from_bytes(blob[8:10], "little")
    flags = blob[10]
    pos = 13
    if flags & 0x80:
        pos += 3 * (2 << (flags & 7))  # global color table

    def skip_subblocks(p: int) -> int:
        while True:
            if p >= len(blob):
                raise ValueError("truncated GIF sub-blocks")
            ln = blob[p]
            p += 1
            if ln == 0:
                return p
            p += ln

    n_frames = 0
    delays: list[int] = []
    loop_count = None
    pending_delay = 0  # most recent GCE delay, consumed by the next frame
    while True:
        if pos >= len(blob):
            raise ValueError("truncated GIF: missing trailer")
        block = blob[pos]
        pos += 1
        if block == 0x3B:  # trailer
            break
        if block == 0x21:  # extension
            if pos >= len(blob):
                raise ValueError("truncated GIF extension")
            label = blob[pos]
            pos += 1
            if label == 0xF9 and pos + 5 <= len(blob) and blob[pos] == 4:
                pending_delay = int.from_bytes(
                    blob[pos + 2 : pos + 4], "little"
                )
            elif (
                label == 0xFF
                and pos + 12 <= len(blob)
                and blob[pos] == 11
                and blob[pos + 1 : pos + 12] == b"NETSCAPE2.0"
            ):
                p2 = pos + 12
                if p2 + 4 <= len(blob) and blob[p2] == 3 and blob[p2 + 1] == 1:
                    loop_count = int.from_bytes(
                        blob[p2 + 2 : p2 + 4], "little"
                    )
            pos = skip_subblocks(pos)
        elif block == 0x2C:  # image descriptor
            if pos + 9 > len(blob):
                raise ValueError("truncated GIF image descriptor")
            lflags = blob[pos + 8]
            pos += 9
            if lflags & 0x80:
                pos += 3 * (2 << (lflags & 7))  # local color table
            if pos >= len(blob):
                raise ValueError("truncated GIF image data")
            pos += 1  # LZW minimum code size
            pos = skip_subblocks(pos)
            n_frames += 1
            delays.append(pending_delay)
            pending_delay = 0
        else:
            raise ValueError(f"bad GIF block 0x{block:02x}")
    if n_frames == 0:
        raise ValueError("GIF with no image data")
    return {
        "width": width,
        "height": height,
        "n_frames": n_frames,
        "delays": delays,
        "loop_count": loop_count,
    }


def gif_frame_audit(
    df: DataFrame,
    binary_col: str = "payload",
    id_col: str = "media_id",
    fake: bool = True,
) -> DataFrame:
    """Animation audit per GIF blob → (id, n_frames, width, height,
    total_delay_cs, min_delay_cs, max_delay_cs, loop_count) — the
    "how long/heavy is this animation" QA pass a media-corpus pipeline
    runs before deciding what to decode. HEADER WALK ONLY
    (:func:`_gif_structure`): pixel data is skipped via sub-block
    lengths, so the audit costs one byte scan per blob — at 100 TB the
    difference between listing animation metadata and decoding every
    frame. Non-GIF or malformed blobs: fake=True quarantines to a
    NULL-metrics row (the WAV-tier contract — executor tasks never
    die on hostile bytes); fake=False raises.

    NOT oracle-expressible (binary container walk, no SQL equivalent)
    — pytest-locked instead, per the repo's non-SQL-gate policy:
    the walk is cross-checked frame-by-frame against the full
    compositor (`_iter_gif_frames` must agree on n_frames and every
    delay) and against hand-built NETSCAPE/disposal fixtures."""
    out_schema = (
        f"{id_col} long, n_frames int, width int, height int, "
        "total_delay_cs long, min_delay_cs int, max_delay_cs int, "
        "loop_count int"
    )
    cols = [
        id_col, "n_frames", "width", "height",
        "total_delay_cs", "min_delay_cs", "max_delay_cs", "loop_count",
    ]

    def audit(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, blob in zip(pdf[id_col], pdf[binary_col]):
                blob = bytes(blob)
                try:
                    s = _gif_structure(blob)
                except ValueError:
                    if not fake:
                        raise
                    rows.append({c: None for c in cols} | {id_col: mid})
                    continue
                d = s["delays"]
                rows.append({
                    id_col: mid,
                    "n_frames": s["n_frames"],
                    "width": s["width"],
                    "height": s["height"],
                    "total_delay_cs": sum(d),
                    "min_delay_cs": min(d),
                    "max_delay_cs": max(d),
                    "loop_count": s["loop_count"],
                })
            yield pd.DataFrame(rows, columns=cols)

    return df.select(id_col, binary_col).mapInPandas(audit, schema=out_schema)


def _webp_structure(blob: bytes) -> dict:
    """Header-only walk of a WebP (RIFF) container — the
    :func:`_gif_structure` sibling for the other mainstream animation
    format (public spec: RFC 9649 / VP8 RFC 6386 §9.1 / VP8L header).
    Compressed payloads are SKIPPED via chunk sizes; dims come from
    the VP8 keyframe header (14-bit fields), the VP8L 28-bit packed
    dims, or the VP8X canvas; ANMF frames are counted with their
    24-bit durations and ANIM carries the loop count. Returns
    ``{variant, width, height, n_frames, total_duration_ms,
    loop_count, has_alpha}``; raises ValueError on non-WebP or
    malformed/truncated streams."""
    if len(blob) < 12 or blob[:4] != b"RIFF" or blob[8:12] != b"WEBP":
        raise ValueError("not a WebP payload")
    pos = 12
    variant = None
    width = height = None
    n_frames = 0
    total_ms = 0
    loop_count = None
    has_alpha = False
    while pos + 8 <= len(blob):
        fourcc = blob[pos : pos + 4]
        size = int.from_bytes(blob[pos + 4 : pos + 8], "little")
        body = pos + 8
        if body + size > len(blob):
            raise ValueError("truncated WebP chunk")
        if fourcc == b"VP8 " and variant is None:
            # keyframe: 3-byte frame tag, 3-byte start code, 14-bit dims
            if size < 10:
                raise ValueError("truncated VP8 bitstream header")
            if blob[body + 3 : body + 6] != b"\x9d\x01\x2a":
                raise ValueError("bad VP8 keyframe start code")
            variant = "lossy"
            width = int.from_bytes(blob[body + 6 : body + 8], "little") & 0x3FFF
            height = int.from_bytes(blob[body + 8 : body + 10], "little") & 0x3FFF
        elif fourcc == b"VP8L" and variant is None:
            if size < 5 or blob[body] != 0x2F:
                raise ValueError("bad VP8L signature")
            bits = int.from_bytes(blob[body + 1 : body + 5], "little")
            variant = "lossless"
            width = (bits & 0x3FFF) + 1
            height = ((bits >> 14) & 0x3FFF) + 1
            has_alpha = has_alpha or bool((bits >> 28) & 1)
        elif fourcc == b"VP8X":
            if size < 10:
                raise ValueError("truncated VP8X header")
            variant = "extended"
            flags = blob[body]
            has_alpha = has_alpha or bool(flags & 0x10)
            width = int.from_bytes(blob[body + 4 : body + 7], "little") + 1
            height = int.from_bytes(blob[body + 7 : body + 10], "little") + 1
        elif fourcc == b"ANIM":
            if size < 6:
                raise ValueError("truncated ANIM chunk")
            loop_count = int.from_bytes(blob[body + 4 : body + 6], "little")
        elif fourcc == b"ANMF":
            if size < 16:
                raise ValueError("truncated ANMF header")
            n_frames += 1
            total_ms += int.from_bytes(blob[body + 12 : body + 15], "little")
        elif fourcc == b"ALPH":
            has_alpha = True
        pos = body + size + (size & 1)  # chunks pad to even
    if variant is None:
        raise ValueError("WebP with no image chunk")
    if n_frames == 0:
        n_frames = 1
    return {
        "variant": variant,
        "width": width,
        "height": height,
        "n_frames": n_frames,
        "total_duration_ms": total_ms,
        "loop_count": loop_count,
        "has_alpha": has_alpha,
    }


def _tiff_structure(blob: bytes, max_pages: int = 65_535) -> dict:
    """Header-only walk of a TIFF container (public spec: TIFF 6.0):
    endianness from the II/MM magic, the IFD chain counted for
    ``n_pages`` (cycle-guarded — a hostile next-IFD loop raises
    instead of spinning), and ImageWidth(256) / ImageLength(257) /
    Compression(259) read from the FIRST IFD's inline SHORT/LONG
    values. Strip/tile data is never touched. Returns ``{byte_order,
    width, height, n_pages, compression}``; raises ValueError on
    non-TIFF or malformed streams."""
    if len(blob) < 8:
        raise ValueError("not a TIFF payload")
    if blob[:2] == b"II":
        bo = "little"
    elif blob[:2] == b"MM":
        bo = "big"
    else:
        raise ValueError("not a TIFF payload")
    if int.from_bytes(blob[2:4], bo) != 42:
        raise ValueError("bad TIFF version")

    def read(off, n):
        if off + n > len(blob):
            raise ValueError("truncated TIFF")
        return int.from_bytes(blob[off : off + n], bo)

    width = height = compression = None
    n_pages = 0
    seen = set()
    off = read(4, 4)
    while off:
        if off in seen or len(seen) >= max_pages:
            raise ValueError("cyclic or oversized TIFF IFD chain")
        seen.add(off)
        n_entries = read(off, 2)
        first = n_pages == 0
        for i in range(n_entries):
            e = off + 2 + 12 * i
            tag = read(e, 2)
            typ = read(e + 2, 2)
            cnt = read(e + 4, 4)
            if not first or cnt != 1 or tag not in (256, 257, 259):
                continue
            if typ == 3:  # SHORT, inline
                val = read(e + 8, 2)
            elif typ == 4:  # LONG, inline
                val = read(e + 8, 4)
            else:
                continue
            if tag == 256:
                width = val
            elif tag == 257:
                height = val
            else:
                compression = val
        n_pages += 1
        off = read(off + 2 + 12 * n_entries, 4)
    if n_pages == 0:
        raise ValueError("TIFF with no IFD")
    return {
        "byte_order": blob[:2].decode("ascii"),
        "width": width,
        "height": height,
        "n_pages": n_pages,
        "compression": compression,
    }


def _mp4_structure(blob: bytes) -> dict:
    """Header-only walk of an ISO-BMFF (MP4/MOV) container (public
    spec: ISO/IEC 14496-12): the box tree is traversed with an explicit
    stack — `ftyp` gives the major brand, `mvhd` the movie timescale +
    duration (version 0 and 1 layouts), each `trak`'s `tkhd` the
    16.16-fixed presentation dims and `hdlr` whether it is video
    (`vide`) or audio (`soun`). Media data (`mdat`) and codec sample
    payloads are never touched — this is the video-tier twin of the
    GIF/WebP audits: the CONTAINER is fully readable even though the
    codec bitstream stays behind the documented decode stub. Returns
    ``{brand, timescale, duration_ms, n_tracks, has_video, has_audio,
    width, height}``; raises ValueError on non-BMFF or malformed
    streams."""
    if len(blob) < 8:
        raise ValueError("not an ISO-BMFF payload")
    # first box must parse, and conventionally be ftyp for MP4 files
    first_type = blob[4:8]
    if first_type != b"ftyp" and first_type != b"moov":
        raise ValueError("not an ISO-BMFF payload")
    brand = None
    timescale = None
    duration_ms = None
    n_tracks = 0
    has_video = has_audio = False
    width = height = None
    containers = {b"moov", b"trak", b"mdia"}
    # stack of (pos, end) ranges to scan for sibling boxes
    stack = [(0, len(blob))]
    hops = 0
    while stack:
        pos, end = stack.pop()
        while pos + 8 <= end:
            hops += 1
            if hops > 100_000:
                raise ValueError("oversized ISO-BMFF box tree")
            size = int.from_bytes(blob[pos : pos + 4], "big")
            btype = blob[pos + 4 : pos + 8]
            body = pos + 8
            if size == 1:
                if pos + 16 > end:
                    raise ValueError("truncated ISO-BMFF largesize")
                size = int.from_bytes(blob[pos + 8 : pos + 16], "big")
                body = pos + 16
                if size < 16:
                    raise ValueError("bad ISO-BMFF largesize")
            elif size == 0:  # box extends to end of enclosing range
                size = end - pos
            elif size < 8:
                raise ValueError("bad ISO-BMFF box size")
            if pos + size > end:
                raise ValueError("ISO-BMFF box overruns its parent")
            if btype == b"ftyp" and brand is None:
                if size < 16:
                    raise ValueError("truncated ftyp")
                brand = blob[body : body + 4].decode("latin-1")
            elif btype == b"mvhd":
                # field reads must stay inside the box's OWN declared
                # extent (pos+size), not the parent range: an undersized
                # mvhd followed by a sibling would otherwise silently
                # yield the sibling's bytes as timescale/duration
                box_end = pos + size
                if body + 4 > box_end:
                    raise ValueError("truncated mvhd")
                ver = blob[body]
                if ver == 1:
                    if body + 32 > box_end:
                        raise ValueError("truncated mvhd v1")
                    timescale = int.from_bytes(blob[body + 20 : body + 24], "big")
                    dur = int.from_bytes(blob[body + 24 : body + 32], "big")
                else:
                    if body + 20 > box_end:
                        raise ValueError("truncated mvhd v0")
                    timescale = int.from_bytes(blob[body + 12 : body + 16], "big")
                    dur = int.from_bytes(blob[body + 16 : body + 20], "big")
                if timescale:
                    duration_ms = dur * 1000 // timescale
            elif btype == b"tkhd" and width is None:
                # dims are the LAST 8 bytes of the box: 16.16 fixed
                if size >= 24:
                    w = int.from_bytes(blob[pos + size - 8 : pos + size - 4], "big")
                    h = int.from_bytes(blob[pos + size - 4 : pos + size], "big")
                    if w and h:
                        width, height = w >> 16, h >> 16
            elif btype == b"hdlr":
                # same own-extent rule as mvhd: an undersized hdlr must
                # quarantine, never read a sibling's bytes as the handler
                if body + 12 > pos + size:
                    raise ValueError("truncated hdlr")
                handler = blob[body + 8 : body + 12]
                has_video = has_video or handler == b"vide"
                has_audio = has_audio or handler == b"soun"
            elif btype == b"trak":
                n_tracks += 1
            if btype in containers:
                stack.append((body, pos + size))
            pos += size
    if brand is None and timescale is None:
        raise ValueError("ISO-BMFF with neither ftyp nor moov content")
    return {
        "brand": brand,
        "timescale": timescale,
        "duration_ms": duration_ms,
        "n_tracks": n_tracks,
        "has_video": has_video,
        "has_audio": has_audio,
        "width": width,
        "height": height,
    }


def mp4_audit(
    df: DataFrame,
    binary_col: str = "payload",
    id_col: str = "media_id",
    fake: bool = True,
) -> DataFrame:
    """Video-tier sibling of :func:`gif_frame_audit`/:func:`webp_audit`:
    per-blob (brand, timescale, duration_ms, n_tracks, has_video,
    has_audio, width, height) from the ISO-BMFF box tree only — `mdat`
    and codec payloads skipped, so "how long/what shape is this video"
    QA costs one byte scan per blob while the actual H.264/AV1 decode
    stays behind the documented codec stub (the container boundary the
    100 TB corpus sweep needs is now real). NULL-row quarantine under
    fake=True, raise under fake=False; pytest-locked against
    hand-built box trees + a mutation fuzz."""
    out_schema = (
        f"{id_col} long, brand string, timescale long, duration_ms long, "
        "n_tracks int, has_video boolean, has_audio boolean, "
        "width int, height int"
    )
    cols = [
        id_col, "brand", "timescale", "duration_ms", "n_tracks",
        "has_video", "has_audio", "width", "height",
    ]

    def audit(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, blob in zip(pdf[id_col], pdf[binary_col]):
                try:
                    s = _mp4_structure(bytes(blob))
                except ValueError:
                    if not fake:
                        raise
                    rows.append({c: None for c in cols} | {id_col: mid})
                    continue
                rows.append({id_col: mid} | s)
            yield pd.DataFrame(rows, columns=cols)

    return df.select(id_col, binary_col).mapInPandas(audit, schema=out_schema)


_MP3_BITRATES = {
    # (version_group, layer) -> kbps by bitrate index 1..14 (0 = free,
    # 15 = bad). version_group: 1 = MPEG1, 2 = MPEG2/2.5 (shared tables).
    (1, 1): (32, 64, 96, 128, 160, 192, 224, 256, 288, 320, 352, 384, 416, 448),
    (1, 2): (32, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320, 384),
    (1, 3): (32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320),
    (2, 1): (32, 48, 56, 64, 80, 96, 112, 128, 144, 160, 176, 192, 224, 256),
    (2, 2): (8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160),
    (2, 3): (8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160),
}
_MP3_RATES = {  # version code (header bits) -> sample rates by index 0..2
    3: (44100, 48000, 32000),   # MPEG1
    2: (22050, 24000, 16000),   # MPEG2
    0: (11025, 12000, 8000),    # MPEG2.5
}


def _mp3_structure(blob: bytes) -> dict:
    """Header-only walk of an MPEG audio (mp3) stream (public specs:
    ISO/IEC 11172-3 + 13818-3 frame headers): skip a leading ID3v2 tag
    (syncsafe size), then hop frame to frame via each header's DECLARED
    length — Huffman/subband payload bytes are never parsed, so "how
    long is this audio" costs a per-frame 4-byte read exactly like the
    mp4/mkv audits cost a box/element walk. Counts frames, derives the
    exact sample duration n_frames·samples_per_frame/sample_rate, and
    classifies CBR vs VBR from the bitrate-index spread (catching VBR
    without trusting a Xing/VBRI tag). A trailing 128-byte ID3v1 'TAG'
    is accepted. Raises ValueError on non-MPEG sync, reserved
    version/layer/rate codes, free-format streams (frame length is not
    derivable without payload scanning — honest boundary), mid-frame
    truncation, or parameter changes mid-stream; the actual audio
    DECODE stays behind the documented codec stub
    (`extract_audio_features`/`decode_wav` mp3 boundary). Returns
    {version, layer, sample_rate, channels, n_frames, duration_ms,
    bitrate_kbps, vbr}."""
    pos = 0
    if blob[:3] == b"ID3":
        if len(blob) < 10:
            raise ValueError("truncated ID3v2 header")
        if any(b & 0x80 for b in blob[6:10]):
            raise ValueError("bad ID3v2 syncsafe size")
        size = (
            (blob[6] << 21) | (blob[7] << 14) | (blob[8] << 7) | blob[9]
        )
        pos = 10 + size + (10 if blob[5] & 0x10 else 0)  # footer flag
        if pos > len(blob):
            raise ValueError("ID3v2 tag overruns the blob")
    end = len(blob)
    if end - pos >= 128 and blob[end - 128 : end - 125] == b"TAG":
        end -= 128  # trailing ID3v1
    version = layer = rate = channels = None
    n_frames = 0
    frame_bytes = 0
    br_indices = set()
    spf = None
    while pos < end:
        if end - pos < 4:
            raise ValueError("truncated MPEG frame header")
        h0, h1, h2, h3 = blob[pos : pos + 4]
        if h0 != 0xFF or (h1 & 0xE0) != 0xE0:
            raise ValueError("lost MPEG frame sync")
        vcode = (h1 >> 3) & 3
        lcode = (h1 >> 1) & 3
        if vcode == 1 or lcode == 0:
            raise ValueError("reserved MPEG version/layer")
        lyr = 4 - lcode  # 3->Layer I, 2->II, 1->III
        br_idx = h2 >> 4
        sr_idx = (h2 >> 2) & 3
        if br_idx == 0:
            raise ValueError("free-format MPEG stream not supported")
        if br_idx == 15 or sr_idx == 3:
            raise ValueError("bad MPEG bitrate/samplerate index")
        vgroup = 1 if vcode == 3 else 2
        kbps = _MP3_BITRATES[(vgroup, lyr)][br_idx - 1]
        sr = _MP3_RATES[vcode][sr_idx]
        pad = (h2 >> 1) & 1
        ch = 1 if (h3 >> 6) == 3 else 2
        if lyr == 1:
            flen = (12 * kbps * 1000 // sr + pad) * 4
            this_spf = 384
        elif lyr == 2:
            flen = 144 * kbps * 1000 // sr + pad
            this_spf = 1152
        else:
            this_spf = 1152 if vgroup == 1 else 576
            flen = this_spf // 8 * kbps * 1000 // sr + pad
        if flen < 4:
            raise ValueError("bad MPEG frame length")
        if pos + flen > end:
            raise ValueError("MPEG frame overruns the blob")
        if n_frames == 0 and version is None and lyr == 3:
            # A LAME/Xing 'Xing'/'Info' (or Fraunhofer 'VBRI') header
            # rides in the otherwise-silent FIRST frame, after the
            # Layer III side info — it is metadata, not audio, so it
            # must not count toward n_frames/duration or contribute its
            # bitrate index to the CBR/VBR spread (a CBR file whose
            # Info frame is encoded at a different index is still CBR).
            side = (17 if ch == 1 else 32) if vgroup == 1 else (9 if ch == 1 else 17)
            # protection bit 0 = a 16-bit CRC sits between the header
            # and the side info, so the tag shifts by 2 (ISO 11172-3
            # §2.4.1.3.1); CRC-protected LAME files must still have
            # their Info frame excluded from the audio census
            crc = 2 if (h1 & 1) == 0 else 0
            # probes bounded by the frame's OWN extent (the mvhd/hdlr
            # lesson): a tiny low-bitrate frame must not read the next
            # frame's payload and mistake it for a tag
            tag = (
                blob[pos + 4 + crc + side : pos + 8 + crc + side]
                if 4 + crc + side + 4 <= flen else b""
            )
            vbri = blob[pos + 36 : pos + 40] if 40 <= flen else b""
            if tag in (b"Xing", b"Info") or vbri == b"VBRI":
                pos += flen
                continue
        cur = (vcode, lyr, sr, ch)
        if version is None:
            version, layer, rate, channels = cur
            spf = this_spf
        elif (version, layer, rate, channels) != cur:
            raise ValueError("MPEG stream parameters change mid-stream")
        br_indices.add(br_idx)
        n_frames += 1
        frame_bytes += flen
        pos += flen
        if n_frames > 1_000_000:
            raise ValueError("oversized MPEG stream")
    if n_frames == 0:
        raise ValueError("no MPEG frames")
    duration_ms = n_frames * spf * 1000 // rate
    # exact average bitrate over the frame span, in kbps
    bitrate_kbps = frame_bytes * 8 * rate // (n_frames * spf) // 1000
    return {
        "version": {3: "MPEG1", 2: "MPEG2", 0: "MPEG2.5"}[version],
        "layer": layer,
        "sample_rate": rate,
        "channels": channels,
        "n_frames": n_frames,
        "duration_ms": duration_ms,
        "bitrate_kbps": bitrate_kbps,
        "vbr": len(br_indices) > 1,
    }


def _ogg_structure(blob: bytes) -> dict:
    """Header-only walk of an Ogg container (public specs: RFC 3533
    framing + the Vorbis I / RFC 7845 Opus ID headers): hop page to
    page via each header's lacing table (packet payloads never
    parsed), identify the codec from the BOS packet's magic
    ('\\x01vorbis' → channels/rate at fixed offsets; 'OpusHead' →
    channels, pre-skip, 48 kHz granule clock), count pages, and derive
    duration from the LAST page's granule position — so "how long is
    this audio" costs one ~27-byte header read per page, the same
    posture as the mp3/mp4/mkv audits. Raises ValueError on a bad
    capture pattern, nonzero version, truncation, granule regression,
    or a MULTIPLEXED physical stream (second BOS serial — honest
    boundary: concurrent multiplexing needs per-stream demux). Unknown
    BOS codecs keep page accounting but yield NULL duration (no
    granule clock). Returns {codec, channels, sample_rate, n_pages,
    duration_ms, eos}."""
    pos = 0
    codec = None
    channels = rate = None
    pre_skip = 0
    serial = None
    last_granule = None
    n_pages = 0
    eos = False
    while pos < len(blob):
        if len(blob) - pos < 27:
            raise ValueError("truncated Ogg page header")
        if blob[pos : pos + 4] != b"OggS":
            raise ValueError("bad Ogg capture pattern")
        if blob[pos + 4] != 0:
            raise ValueError("unsupported Ogg version")
        htype = blob[pos + 5]
        granule = int.from_bytes(
            blob[pos + 6 : pos + 14], "little", signed=True
        )
        ser = int.from_bytes(blob[pos + 14 : pos + 18], "little")
        nsegs = blob[pos + 26]
        lace_end = pos + 27 + nsegs
        if lace_end > len(blob):
            raise ValueError("truncated Ogg lacing table")
        body = sum(blob[pos + 27 : lace_end])
        if lace_end + body > len(blob):
            raise ValueError("Ogg page overruns the blob")
        # Pin the physical-stream serial from the FIRST page whether or
        # not it carries BOS (a headerless/clipped chain would otherwise
        # leave serial None and silently disable the multiplexed-stream
        # check for the whole walk).
        if serial is None:
            serial = ser
        elif ser != serial:
            raise ValueError("multiplexed Ogg not supported")
        if htype & 0x02:  # beginning of stream
            pkt = blob[lace_end : lace_end + body]
            if pkt[:7] == b"\x01vorbis" and len(pkt) >= 16:
                codec = "vorbis"
                channels = pkt[11]
                rate = int.from_bytes(pkt[12:16], "little")
            elif pkt[:8] == b"OpusHead" and len(pkt) >= 19:
                codec = "opus"
                channels = pkt[9]
                pre_skip = int.from_bytes(pkt[10:12], "little")
                rate = int.from_bytes(pkt[12:16], "little")
            else:
                codec = "unknown"
        if granule >= 0:
            if last_granule is not None and granule < last_granule:
                raise ValueError("Ogg granule position regressed")
            last_granule = granule
        eos = bool(htype & 0x04)
        n_pages += 1
        pos = lace_end + body
        if n_pages > 1_000_000:
            raise ValueError("oversized Ogg stream")
    if n_pages == 0:
        raise ValueError("no Ogg pages")
    duration_ms = None
    if last_granule is not None:
        if codec == "vorbis" and rate:
            duration_ms = last_granule * 1000 // rate
        elif codec == "opus":
            # granule clock is ALWAYS 48 kHz for Opus; pre-skip samples
            # are decoder warm-up, excluded from the play duration
            duration_ms = max(0, last_granule - pre_skip) * 1000 // 48000
    return {
        "codec": codec,
        "channels": channels,
        "sample_rate": rate,
        "n_pages": n_pages,
        "duration_ms": duration_ms,
        "eos": eos,
    }


def _gzip_structure(blob: bytes) -> dict:
    """Header + trailer audit of a gzip member (public spec: RFC
    1952): magic/method check, FLG-driven optional-field walk (FEXTRA
    length, NUL-terminated FNAME/FCOMMENT, FHCRC), MTIME and OS code
    from the fixed header, and ISIZE (uncompressed size mod 2³²) from
    the LAST 8 trailer bytes — the DEFLATE payload itself is never
    inflated, so "what is this archive and how big does it claim to
    be" costs a ~20-byte read per blob. Caveat (documented, not
    hidden): a multi-member stream's trailer belongs to its last
    member and member boundaries are not findable without inflating,
    so isize reports the last member's — the single-member case (the
    norm for web-archive records) is exact. Raises ValueError on bad
    magic, a non-deflate method, reserved FLG bits, overruns. Returns
    {mtime, os_code, fname, has_comment, has_extra, isize,
    compressed_size}."""
    if len(blob) < 18:
        raise ValueError("truncated gzip member")
    if blob[:2] != b"\x1f\x8b":
        raise ValueError("not a gzip stream")
    if blob[2] != 8:
        raise ValueError(f"unsupported gzip method {blob[2]}")
    flg = blob[3]
    if flg & 0xE0:
        raise ValueError("reserved gzip FLG bits set")
    mtime = int.from_bytes(blob[4:8], "little")
    os_code = blob[9]
    pos = 10
    if flg & 0x04:  # FEXTRA
        if pos + 2 > len(blob):
            raise ValueError("truncated gzip FEXTRA length")
        xlen = int.from_bytes(blob[pos : pos + 2], "little")
        pos += 2 + xlen
        if pos > len(blob):
            raise ValueError("gzip FEXTRA overruns the blob")
    fname = None
    if flg & 0x08:  # FNAME
        nul = blob.find(b"\x00", pos)
        if nul < 0:
            raise ValueError("unterminated gzip FNAME")
        fname = blob[pos:nul].decode("latin-1")
        pos = nul + 1
    if flg & 0x10:  # FCOMMENT
        nul = blob.find(b"\x00", pos)
        if nul < 0:
            raise ValueError("unterminated gzip FCOMMENT")
        pos = nul + 1
    if flg & 0x02:  # FHCRC
        pos += 2
    if pos + 8 > len(blob):
        raise ValueError("gzip header overruns the trailer")
    isize = int.from_bytes(blob[-4:], "little")
    return {
        "mtime": mtime,
        "os_code": os_code,
        "fname": fname,
        "has_comment": bool(flg & 0x10),
        "has_extra": bool(flg & 0x04),
        "isize": isize,
        "compressed_size": len(blob),
    }


def _zip_structure(blob: bytes) -> dict:
    """Central-directory audit of a ZIP archive (public spec: PKWARE
    APPNOTE): locate the end-of-central-directory record (backward
    scan over the ≤64 KiB comment window; exact comment_len match
    preferred, last structurally-plausible candidate accepted so
    trailing-garbage archives — appended signatures, SFX padding —
    still parse; a fallback candidate must additionally point at a
    real central directory — PK\x01\x02 at its cd_off, or an empty
    directory at the record itself — so a plausible-looking fake EOCD
    planted in the trailing bytes cannot beat the real record in the
    backward scan), then walk the central
    directory entries — per-entry method and compressed/uncompressed
    sizes come from the directory alone, so cataloguing an archive
    never touches file payloads. Raises ValueError on a missing/torn
    EOCD, directory overruns, bad entry signatures, multi-disk
    archives, or ZIP64 markers (honest boundary — the 4-byte fields
    saturate at 0xFFFFFFFF; parse the ZIP64 records the day a corpus
    needs >4 GiB members). Returns {n_entries, total_uncompressed,
    total_compressed, n_stored, n_deflated, has_encrypted,
    comment_len}."""
    tail = blob[-(65536 + 22):] if len(blob) > 65536 + 22 else blob
    base = len(blob) - len(tail)
    # Backward scan over PK\x05\x06 candidates: a stored member or the
    # archive comment itself can contain the magic, so the rfind hit is
    # not necessarily the record. The standard disambiguation accepts
    # the candidate whose comment_len field equals the distance from
    # the end of its fixed record to the end of the blob; archives with
    # trailing bytes AFTER the EOCD (appended signatures, SFX padding)
    # have no exact match, so fall back to the last structurally
    # plausible candidate — comment fits inside the blob and the
    # central directory lands entirely before the record.
    eocd = -1
    fallback = -1
    search_end = len(tail)
    for _ in range(64):  # hostile magic-stuffed tails stay O(64·tail)
        rel = tail.rfind(b"PK\x05\x06", 0, search_end)
        if rel < 0:
            break
        cand = base + rel
        if cand + 22 <= len(blob):
            cand_clen = int.from_bytes(blob[cand + 20 : cand + 22], "little")
            if cand + 22 + cand_clen == len(blob):
                eocd = cand
                break
            if fallback < 0 and cand + 22 + cand_clen <= len(blob):
                c_size = int.from_bytes(blob[cand + 12 : cand + 16], "little")
                c_off = int.from_bytes(blob[cand + 16 : cand + 20], "little")
                # r14 ADVICE: a plausible-LOOKING fake EOCD inside the
                # very trailing bytes the fallback tolerates would beat
                # the real record in this backward scan — so a fallback
                # candidate must also point at an actual central
                # directory: PK\x01\x02 at its cd_off (or an empty
                # directory). Otherwise keep scanning for an earlier
                # candidate instead of accepting the decoy.
                if c_size == 0:
                    cd_sig_ok = c_off == cand  # truly empty archive
                else:
                    cd_sig_ok = (
                        c_off + 4 <= len(blob)
                        and blob[c_off : c_off + 4] == b"PK\x01\x02"
                    )
                if c_off + c_size <= cand and cd_sig_ok:
                    fallback = cand
        search_end = rel + 3  # keep overlapping magics findable
    if eocd < 0:
        eocd = fallback
    if eocd < 0:
        raise ValueError("no ZIP end-of-central-directory record")
    disk = int.from_bytes(blob[eocd + 4 : eocd + 6], "little")
    cd_disk = int.from_bytes(blob[eocd + 6 : eocd + 8], "little")
    n_here = int.from_bytes(blob[eocd + 8 : eocd + 10], "little")
    n_total = int.from_bytes(blob[eocd + 10 : eocd + 12], "little")
    cd_size = int.from_bytes(blob[eocd + 12 : eocd + 16], "little")
    cd_off = int.from_bytes(blob[eocd + 16 : eocd + 20], "little")
    comment_len = int.from_bytes(blob[eocd + 20 : eocd + 22], "little")
    if disk != 0 or cd_disk != 0 or n_here != n_total:
        raise ValueError("multi-disk ZIP not supported")
    if 0xFFFF in (n_total,) or 0xFFFFFFFF in (cd_size, cd_off):
        raise ValueError("ZIP64 archive not supported")
    if cd_off + cd_size > eocd:
        raise ValueError("ZIP central directory overruns the EOCD")
    pos = cd_off
    end = cd_off + cd_size
    total_u = total_c = n_stored = n_deflated = 0
    has_encrypted = False
    for _ in range(n_total):
        if pos + 46 > end:
            raise ValueError("ZIP central directory entry overruns")
        if blob[pos : pos + 4] != b"PK\x01\x02":
            raise ValueError("bad ZIP central-directory signature")
        gpflag = int.from_bytes(blob[pos + 8 : pos + 10], "little")
        method = int.from_bytes(blob[pos + 10 : pos + 12], "little")
        csize = int.from_bytes(blob[pos + 20 : pos + 24], "little")
        usize = int.from_bytes(blob[pos + 24 : pos + 28], "little")
        if 0xFFFFFFFF in (csize, usize):
            raise ValueError("ZIP64 entry sizes not supported")
        nlen = int.from_bytes(blob[pos + 28 : pos + 30], "little")
        xlen = int.from_bytes(blob[pos + 30 : pos + 32], "little")
        clen = int.from_bytes(blob[pos + 32 : pos + 34], "little")
        has_encrypted = has_encrypted or bool(gpflag & 0x1)
        if method == 0:
            n_stored += 1
        elif method == 8:
            n_deflated += 1
        total_c += csize
        total_u += usize
        pos += 46 + nlen + xlen + clen
    if pos != end:
        raise ValueError("ZIP central directory size mismatch")
    return {
        "n_entries": n_total,
        "total_uncompressed": total_u,
        "total_compressed": total_c,
        "n_stored": n_stored,
        "n_deflated": n_deflated,
        "has_encrypted": has_encrypted,
        "comment_len": comment_len,
    }


def _zstd_structure(blob: bytes) -> dict:
    """Frame-header audit of a zstd stream (public spec: RFC 8878):
    magic, frame-header descriptor (FCS field size, single-segment,
    checksum, dictionary-ID size), window descriptor → window size,
    and the DECLARED frame content size when present — blocks are
    never decoded. Leading skippable frames (magic 0x184D2A5?) are
    hopped via their declared lengths. Raises ValueError on a bad
    magic, reserved descriptor bits, or truncation. Returns
    {content_size, window_size, has_checksum, dict_id,
    n_skippable}."""
    pos = 0
    n_skippable = 0
    while True:
        if pos + 4 > len(blob):
            raise ValueError("truncated zstd magic")
        magic = int.from_bytes(blob[pos : pos + 4], "little")
        if (magic & 0xFFFFFFF0) == 0x184D2A50:  # skippable frame
            if pos + 8 > len(blob):
                raise ValueError("truncated zstd skippable frame")
            ln = int.from_bytes(blob[pos + 4 : pos + 8], "little")
            pos += 8 + ln
            if pos > len(blob):
                raise ValueError("zstd skippable frame overruns the blob")
            n_skippable += 1
            if n_skippable > 10_000:
                raise ValueError("oversized zstd skippable chain")
            continue
        if magic != 0xFD2FB528:
            raise ValueError("not a zstd frame")
        break
    pos += 4
    if pos >= len(blob):
        raise ValueError("truncated zstd frame header")
    fhd = blob[pos]
    pos += 1
    if fhd & 0x08:
        raise ValueError("reserved zstd frame-header bit set")
    fcs_code = fhd >> 6
    single_segment = bool(fhd & 0x20)
    has_checksum = bool(fhd & 0x04)
    did_code = fhd & 0x03
    window_size = None
    if not single_segment:
        if pos >= len(blob):
            raise ValueError("truncated zstd window descriptor")
        wd = blob[pos]
        pos += 1
        exponent, mantissa = wd >> 3, wd & 7
        base = 1 << (10 + exponent)
        window_size = base + (base // 8) * mantissa
    did_len = (0, 1, 2, 4)[did_code]
    if pos + did_len > len(blob):
        raise ValueError("truncated zstd dictionary id")
    dict_id = (
        int.from_bytes(blob[pos : pos + did_len], "little") if did_len else None
    )
    pos += did_len
    fcs_len = (0, 2, 4, 8)[fcs_code] if not single_segment else (1, 2, 4, 8)[fcs_code]
    content_size = None
    if fcs_len:
        if pos + fcs_len > len(blob):
            raise ValueError("truncated zstd frame content size")
        content_size = int.from_bytes(blob[pos : pos + fcs_len], "little")
        if fcs_len == 2:
            content_size += 256
    if single_segment and window_size is None:
        window_size = content_size
    return {
        "content_size": content_size,
        "window_size": window_size,
        "has_checksum": has_checksum,
        "dict_id": dict_id,
        "n_skippable": n_skippable,
    }


def archive_audit(
    df: DataFrame,
    binary_col: str = "payload",
    id_col: str = "media_id",
    fake: bool = True,
) -> DataFrame:
    """Archive/compression audit — the tier a web-archive corpus sweep
    runs before any decompression: classify each blob as gzip / zip /
    zstd by magic, then read ONLY headers, trailers, or the central
    directory to report entry counts and declared sizes (per-format
    walks: :func:`_gzip_structure` RFC 1952, :func:`_zip_structure`
    PKWARE central directory, :func:`_zstd_structure` RFC 8878). The
    compression-ratio and bomb-screen columns (claimed uncompressed
    vs actual compressed bytes) come for free — a declared 10⁶×
    expansion is a zip-bomb signal worth quarantining BEFORE an
    executor inflates it. NULL-row quarantine under fake=True, raise
    under fake=False. Output: (id, format, n_entries,
    uncompressed_size, compressed_size, expansion_e3)."""
    out_schema = (
        f"{id_col} long, format string, n_entries long, "
        "uncompressed_size long, compressed_size long, expansion_e3 long"
    )
    cols = [
        id_col, "format", "n_entries", "uncompressed_size",
        "compressed_size", "expansion_e3",
    ]

    def audit(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, blob in zip(pdf[id_col], pdf[binary_col]):
                blob = bytes(blob)
                try:
                    if blob[:2] == b"\x1f\x8b":
                        s = _gzip_structure(blob)
                        fmt, n = "gzip", 1
                        usize, csize = s["isize"], s["compressed_size"]
                    elif blob[:4] == b"\x28\xb5\x2f\xfd" or (
                        len(blob) >= 4
                        and (int.from_bytes(blob[:4], "little") & 0xFFFFFFF0)
                        == 0x184D2A50
                    ):
                        s = _zstd_structure(blob)
                        fmt, n = "zstd", 1
                        usize, csize = s["content_size"], len(blob)
                    else:
                        s = _zip_structure(blob)  # EOCD scan finds zips
                        fmt, n = "zip", s["n_entries"]
                        usize = s["total_uncompressed"]
                        csize = s["total_compressed"]
                    exp = (
                        usize * 1000 // csize
                        if usize is not None and csize
                        else None
                    )
                    rows.append({
                        id_col: mid, "format": fmt, "n_entries": n,
                        "uncompressed_size": usize,
                        "compressed_size": csize, "expansion_e3": exp,
                    })
                except ValueError:
                    if not fake:
                        raise
                    rows.append({c: None for c in cols} | {id_col: mid})
            yield pd.DataFrame(rows, columns=cols)

    return df.select(id_col, binary_col).mapInPandas(audit, schema=out_schema)


def _warc_structure(blob: bytes) -> dict:
    """Record-chain audit of an (uncompressed) WARC file (public spec:
    ISO 28500 / the IIPC WARC/1.x format — the CommonCrawl container):
    each record is a 'WARC/1.x' version line + named header lines +
    CRLFCRLF, then exactly Content-Length payload octets, then
    CRLFCRLF — so the chain hops payload bytes via the declared
    lengths and cataloguing a crawl segment (record counts by
    WARC-Type, payload volume, truncation flags) never reads a single
    response body. Pairs with :func:`_gzip_structure`: CommonCrawl
    .warc.gz files are per-record gzip members, so at 100 TB the
    pipeline is member-split → inflate one record → THIS walk. Raises
    ValueError on a bad version line, a missing/invalid
    Content-Length, missing CRLFCRLF terminators, or overruns.
    Returns {n_records, n_responses, n_requests, n_warcinfo,
    n_metadata, total_content_bytes, has_truncated, warc_version}."""
    pos = 0
    n = resp = req = winfo = meta = 0
    total = 0
    has_trunc = False
    version = None
    while pos < len(blob):
        eol = blob.find(b"\r\n", pos)
        if eol < 0 or not blob[pos:eol].startswith(b"WARC/"):
            raise ValueError("bad WARC version line")
        ver = blob[pos + 5 : eol].decode("latin-1", "replace")
        if version is None:
            version = ver
        hdr_end = blob.find(b"\r\n\r\n", eol)
        if hdr_end < 0:
            raise ValueError("unterminated WARC header block")
        clen = None
        rtype = None
        for line in blob[eol + 2 : hdr_end].split(b"\r\n"):
            k, _, v = line.partition(b":")
            key = k.strip().lower()
            if key == b"content-length":
                try:
                    clen = int(v.strip())
                except ValueError:
                    raise ValueError("invalid WARC Content-Length") from None
            elif key == b"warc-type":
                rtype = v.strip().lower()
            elif key == b"warc-truncated":
                has_trunc = True
        if clen is None or clen < 0:
            raise ValueError("missing WARC Content-Length")
        body = hdr_end + 4
        if body + clen + 4 > len(blob):
            raise ValueError("WARC record overruns the blob")
        if blob[body + clen : body + clen + 4] != b"\r\n\r\n":
            raise ValueError("missing WARC record terminator")
        n += 1
        total += clen
        if rtype == b"response":
            resp += 1
        elif rtype == b"request":
            req += 1
        elif rtype == b"warcinfo":
            winfo += 1
        elif rtype == b"metadata":
            meta += 1
        pos = body + clen + 4
        if n > 1_000_000:
            raise ValueError("oversized WARC chain")
    if n == 0:
        raise ValueError("no WARC records")
    return {
        "n_records": n,
        "n_responses": resp,
        "n_requests": req,
        "n_warcinfo": winfo,
        "n_metadata": meta,
        "total_content_bytes": total,
        "has_truncated": has_trunc,
        "warc_version": version,
    }


def _tar_structure(blob: bytes) -> dict:
    """Entry-chain audit of a tar archive (public spec: POSIX ustar /
    pax): 512-byte headers hopped via each entry's octal size field
    (file payloads never read), counting entries by typeflag
    (regular/dir/symlink; n_meta buckets BOTH pax extended headers
    x/g AND GNU long-name extensions L/K — all metadata-extension
    entries, none of them files), total declared bytes, and
    whether ustar/pax/GNU markers are present. The end-of-archive is
    two zero blocks (a single one, or a chain that simply ends at the
    blob boundary, is accepted — truncated tails are common in
    streamed dumps and the n_trailing_zeros field reports what was
    found). Raises ValueError on a non-numeric size field, a header
    checksum that fails the POSIX sum (spaces-for-checksum rule), or
    an entry overrunning the blob. Returns {n_entries, n_files,
    n_dirs, n_links, n_meta, total_file_bytes, is_ustar,
    complete_trailer}."""
    pos = 0
    n = files = dirs = links = pax = 0
    total = 0
    is_ustar = False
    complete = False
    while pos + 512 <= len(blob):
        hdr = blob[pos : pos + 512]
        if hdr == b"\x00" * 512:
            complete = (
                pos + 1024 <= len(blob)
                and blob[pos + 512 : pos + 1024] == b"\x00" * 512
            )
            break
        # POSIX checksum: sum of header bytes with the chksum field
        # read as spaces
        try:
            stored = int(hdr[148:156].split(b"\x00")[0].strip() or b"0", 8)
        except ValueError:
            raise ValueError("bad tar checksum field") from None
        calc = sum(hdr[:148]) + 8 * 0x20 + sum(hdr[156:])
        if stored != calc:
            raise ValueError("tar header checksum mismatch")
        size_field = hdr[124:136].split(b"\x00")[0].strip()
        try:
            size = int(size_field or b"0", 8)
        except ValueError:
            raise ValueError("bad tar size field") from None
        typeflag = hdr[156:157]
        magic = hdr[257:263]
        is_ustar = is_ustar or magic in (b"ustar\x00", b"ustar ")
        n += 1
        if typeflag in (b"0", b"\x00", b"7"):
            files += 1
            total += size
        elif typeflag == b"5":
            dirs += 1
        elif typeflag in (b"1", b"2"):
            links += 1
        elif typeflag in (b"x", b"g", b"L", b"K"):
            pax += 1
        data_blocks = (size + 511) // 512
        pos += 512 + data_blocks * 512
        if pos > len(blob):
            raise ValueError("tar entry overruns the blob")
        if n > 1_000_000:
            raise ValueError("oversized tar chain")
    if n == 0:
        raise ValueError("no tar entries")
    return {
        "n_entries": n,
        "n_files": files,
        "n_dirs": dirs,
        "n_links": links,
        "n_meta": pax,
        "total_file_bytes": total,
        "is_ustar": is_ustar,
        "complete_trailer": complete,
    }


def tar_audit(
    df: DataFrame,
    binary_col: str = "payload",
    id_col: str = "media_id",
    fake: bool = True,
) -> DataFrame:
    """Tar catalogue completing the archive tier: per-blob entry
    counts by type, declared payload bytes, ustar/pax detection and
    trailer completeness from the 512-byte header chain only
    (:func:`_tar_structure` — file payloads hopped). NULL-row
    quarantine under fake=True, raise under fake=False."""
    out_schema = (
        f"{id_col} long, n_entries long, n_files long, n_dirs long, "
        "n_links long, n_meta long, total_file_bytes long, "
        "is_ustar boolean, complete_trailer boolean"
    )
    cols = [
        id_col, "n_entries", "n_files", "n_dirs", "n_links", "n_meta",
        "total_file_bytes", "is_ustar", "complete_trailer",
    ]

    def audit(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, blob in zip(pdf[id_col], pdf[binary_col]):
                try:
                    s = _tar_structure(bytes(blob))
                except ValueError:
                    if not fake:
                        raise
                    rows.append({c: None for c in cols} | {id_col: mid})
                    continue
                rows.append({id_col: mid} | s)
            yield pd.DataFrame(rows, columns=cols)

    return df.select(id_col, binary_col).mapInPandas(audit, schema=out_schema)


def _pdf_structure(blob: bytes) -> dict:
    """Head+tail audit of a PDF (public spec: ISO 32000): the '%PDF-'
    version header (within the first 1024 bytes, the Acrobat
    convention), the '%%EOF' marker and 'startxref' offset from the
    LAST 2048 bytes, the object count from the trailer's '/Size'
    (searched in the tail for classic xref tables, then within 512
    bytes of the startxref target for cross-reference STREAMS), plus
    '/Linearized' (first 1024) and '/Encrypt' (tail) flags — so "is
    this a well-formed PDF, how many objects, is it encrypted" reads
    ≤ ~3.5 KB of a blob of ANY size, never the content streams.
    Raises ValueError on a missing header, missing %%EOF, or a
    missing/malformed startxref — a torn download quarantines to a
    NULL row, exactly the damaged-blob signal a corpus sweep wants.
    Returns {version, n_objects, startxref, linearized, encrypted}."""
    head = blob[:1024]
    h = head.find(b"%PDF-")
    if h < 0:
        raise ValueError("no %PDF header")
    ver = head[h + 5 : h + 8].decode("latin-1", "replace")
    if len(ver) < 3 or ver[1] != ".":
        raise ValueError("malformed PDF version")
    tail = blob[-2048:]
    if b"%%EOF" not in tail:
        raise ValueError("no %%EOF marker")
    sx = tail.rfind(b"startxref")
    if sx < 0:
        raise ValueError("no startxref")
    after = tail[sx + 9 :].split()
    if not after or not after[0].isdigit():
        raise ValueError("malformed startxref offset")
    startxref = int(after[0])
    if startxref >= len(blob):
        raise ValueError("startxref beyond the blob")
    n_objects = None
    tsize = tail.rfind(b"/Size")
    if tsize >= 0:
        toks = tail[tsize + 5 :].split()
        if toks and toks[0].rstrip(b">]").isdigit():
            n_objects = int(toks[0].rstrip(b">]"))
    if n_objects is None:
        # cross-reference stream: /Size lives in the object dict at
        # the startxref target
        xr = blob[startxref : startxref + 512]
        ssize = xr.find(b"/Size")
        if ssize >= 0:
            toks = xr[ssize + 5 :].split()
            if toks and toks[0].rstrip(b">]/").isdigit():
                n_objects = int(toks[0].rstrip(b">]/"))
    return {
        "version": ver,
        "n_objects": n_objects,
        "startxref": startxref,
        "linearized": b"/Linearized" in head,
        "encrypted": b"/Encrypt" in tail,
    }


def pdf_audit(
    df: DataFrame,
    binary_col: str = "payload",
    id_col: str = "media_id",
    fake: bool = True,
) -> DataFrame:
    """Document-tier audit: per-blob (version, n_objects, startxref,
    linearized, encrypted) from the PDF head+tail only
    (:func:`_pdf_structure` — ≤ ~3.5 KB read per blob of any size;
    content streams never parsed, text EXTRACTION stays out of scope).
    NULL-row quarantine under fake=True (a torn download IS the
    signal), raise under fake=False."""
    out_schema = (
        f"{id_col} long, version string, n_objects long, "
        "startxref long, linearized boolean, encrypted boolean"
    )
    cols = [
        id_col, "version", "n_objects", "startxref", "linearized",
        "encrypted",
    ]

    def audit(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, blob in zip(pdf[id_col], pdf[binary_col]):
                try:
                    s = _pdf_structure(bytes(blob))
                except ValueError:
                    if not fake:
                        raise
                    rows.append({c: None for c in cols} | {id_col: mid})
                    continue
                rows.append({id_col: mid} | s)
            yield pd.DataFrame(rows, columns=cols)

    return df.select(id_col, binary_col).mapInPandas(audit, schema=out_schema)


def warc_audit(
    df: DataFrame,
    binary_col: str = "payload",
    id_col: str = "media_id",
    fake: bool = True,
) -> DataFrame:
    """Crawl-segment catalogue: per-blob WARC record counts by type,
    payload volume and truncation flags from the header chain only
    (:func:`_warc_structure` — response bodies hopped via
    Content-Length). NULL-row quarantine under fake=True, raise under
    fake=False."""
    out_schema = (
        f"{id_col} long, n_records long, n_responses long, "
        "n_requests long, n_warcinfo long, n_metadata long, "
        "total_content_bytes long, has_truncated boolean, "
        "warc_version string"
    )
    cols = [
        id_col, "n_records", "n_responses", "n_requests", "n_warcinfo",
        "n_metadata", "total_content_bytes", "has_truncated",
        "warc_version",
    ]

    def audit(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, blob in zip(pdf[id_col], pdf[binary_col]):
                try:
                    s = _warc_structure(bytes(blob))
                except ValueError:
                    if not fake:
                        raise
                    rows.append({c: None for c in cols} | {id_col: mid})
                    continue
                rows.append({id_col: mid} | s)
            yield pd.DataFrame(rows, columns=cols)

    return df.select(id_col, binary_col).mapInPandas(audit, schema=out_schema)


def _flac_structure(blob: bytes) -> dict:
    """Header-only walk of a FLAC stream's metadata section (public
    spec: xiph.org FLAC format): 'fLaC' magic, then metadata blocks
    hopped via their 24-bit declared lengths — STREAMINFO (mandatory
    first block, 34 bytes) carries sample rate (20 bits), channels−1
    (3), bits-per-sample−1 (5) and total samples (36) in one packed
    64-bit field, so duration is exact without touching a single audio
    frame. The walk stops at the last-metadata flag; frame data is
    never read. Raises ValueError on a bad magic, a first block that
    is not a 34-byte STREAMINFO, the invalid block type 127, overruns,
    or a zero sample rate. Returns {sample_rate, channels,
    bits_per_sample, total_samples, duration_ms, n_meta_blocks,
    has_seektable}."""
    if blob[:4] != b"fLaC":
        raise ValueError("not a FLAC stream")
    pos = 4
    first = True
    info = None
    n_blocks = 0
    has_seektable = False
    while True:
        if pos + 4 > len(blob):
            raise ValueError("truncated FLAC metadata header")
        btype = blob[pos] & 0x7F
        last = bool(blob[pos] & 0x80)
        ln = int.from_bytes(blob[pos + 1 : pos + 4], "big")
        body = pos + 4
        if btype == 127:
            raise ValueError("invalid FLAC block type 127")
        if body + ln > len(blob):
            raise ValueError("FLAC metadata block overruns the blob")
        if first:
            if btype != 0 or ln != 34:
                raise ValueError("first FLAC block must be 34-byte STREAMINFO")
            packed = int.from_bytes(blob[body + 10 : body + 18], "big")
            rate = packed >> 44
            channels = ((packed >> 41) & 0x7) + 1
            bps = ((packed >> 36) & 0x1F) + 1
            total = packed & ((1 << 36) - 1)
            if rate == 0:
                raise ValueError("FLAC sample rate 0 is invalid")
            info = (rate, channels, bps, total)
            first = False
        elif btype == 3:
            has_seektable = True
        n_blocks += 1
        pos = body + ln
        if n_blocks > 100_000:
            raise ValueError("oversized FLAC metadata chain")
        if last:
            break
    rate, channels, bps, total = info
    return {
        "sample_rate": rate,
        "channels": channels,
        "bits_per_sample": bps,
        "total_samples": total,
        # 0 total samples = "unknown" per spec, not an empty stream
        "duration_ms": total * 1000 // rate if total else None,
        "n_meta_blocks": n_blocks,
        "has_seektable": has_seektable,
    }


def flac_audit(
    df: DataFrame,
    binary_col: str = "payload",
    id_col: str = "media_id",
    fake: bool = True,
) -> DataFrame:
    """Third audio-tier audit (lossless leg): per-blob (sample_rate,
    channels, bits_per_sample, total_samples, duration_ms,
    n_meta_blocks, has_seektable) from the FLAC metadata chain only —
    frame data never read; Rice/LPC decode stays behind the codec
    stub. NULL-row quarantine under fake=True, raise under
    fake=False."""
    out_schema = (
        f"{id_col} long, sample_rate int, channels int, "
        "bits_per_sample int, total_samples long, duration_ms long, "
        "n_meta_blocks int, has_seektable boolean"
    )
    cols = [
        id_col, "sample_rate", "channels", "bits_per_sample",
        "total_samples", "duration_ms", "n_meta_blocks", "has_seektable",
    ]

    def audit(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, blob in zip(pdf[id_col], pdf[binary_col]):
                try:
                    s = _flac_structure(bytes(blob))
                except ValueError:
                    if not fake:
                        raise
                    rows.append({c: None for c in cols} | {id_col: mid})
                    continue
                rows.append({id_col: mid} | s)
            yield pd.DataFrame(rows, columns=cols)

    return df.select(id_col, binary_col).mapInPandas(audit, schema=out_schema)


def ogg_audit(
    df: DataFrame,
    binary_col: str = "payload",
    id_col: str = "media_id",
    fake: bool = True,
) -> DataFrame:
    """Second audio-tier audit, completing the mp3/ogg pair: per-blob
    (codec, channels, sample_rate, n_pages, duration_ms, eos) from the
    Ogg page chain + BOS ID header only — packet payloads hopped via
    lacing tables, Vorbis/Opus sample DECODE stays behind the codec
    stub. NULL-row quarantine under fake=True, raise under
    fake=False."""
    out_schema = (
        f"{id_col} long, codec string, channels int, sample_rate int, "
        "n_pages long, duration_ms long, eos boolean"
    )
    cols = [
        id_col, "codec", "channels", "sample_rate", "n_pages",
        "duration_ms", "eos",
    ]

    def audit(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, blob in zip(pdf[id_col], pdf[binary_col]):
                try:
                    s = _ogg_structure(bytes(blob))
                except ValueError:
                    if not fake:
                        raise
                    rows.append({c: None for c in cols} | {id_col: mid})
                    continue
                rows.append({id_col: mid} | s)
            yield pd.DataFrame(rows, columns=cols)

    return df.select(id_col, binary_col).mapInPandas(audit, schema=out_schema)


def mp3_audit(
    df: DataFrame,
    binary_col: str = "payload",
    id_col: str = "media_id",
    fake: bool = True,
) -> DataFrame:
    """Audio-tier sibling of :func:`mp4_audit`/:func:`mkv_audit`:
    per-blob (version, layer, sample_rate, channels, n_frames,
    duration_ms, bitrate_kbps, vbr) from the MPEG frame-header chain
    only — Huffman/subband payloads hopped via declared frame lengths,
    so the compressed-audio boundary now mirrors the video one: the
    container/framing metadata is REAL while sample decode stays behind
    the documented mp3/ogg codec stub. NULL-row quarantine under
    fake=True, raise under fake=False; pytest-locked against hand-built
    frame chains + a mutation fuzz."""
    out_schema = (
        f"{id_col} long, version string, layer int, sample_rate int, "
        "channels int, n_frames long, duration_ms long, "
        "bitrate_kbps long, vbr boolean"
    )
    cols = [
        id_col, "version", "layer", "sample_rate", "channels",
        "n_frames", "duration_ms", "bitrate_kbps", "vbr",
    ]

    def audit(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, blob in zip(pdf[id_col], pdf[binary_col]):
                try:
                    s = _mp3_structure(bytes(blob))
                except ValueError:
                    if not fake:
                        raise
                    rows.append({c: None for c in cols} | {id_col: mid})
                    continue
                rows.append({id_col: mid} | s)
            yield pd.DataFrame(rows, columns=cols)

    return df.select(id_col, binary_col).mapInPandas(audit, schema=out_schema)


def _ebml_vint(blob: bytes, pos: int, keep_marker: bool) -> tuple[int, int]:
    """Parse one EBML variable-length integer at ``pos`` → (value,
    length). IDs keep the length-marker bit (the spec's raw-ID form);
    sizes strip it. Raises ValueError on truncation or a zero lead
    byte (reserved)."""
    if pos >= len(blob):
        raise ValueError("truncated EBML vint")
    b0 = blob[pos]
    if b0 == 0:
        raise ValueError("bad EBML vint lead byte")
    length = 9 - b0.bit_length()
    if pos + length > len(blob):
        raise ValueError("truncated EBML vint")
    val = b0 if keep_marker else b0 & ((1 << (8 - length)) - 1)
    for i in range(1, length):
        val = (val << 8) | blob[pos + i]
    return val, length


def _mkv_structure(blob: bytes) -> dict:
    """Header-only walk of a Matroska/WebM (EBML) container (public
    specs: RFC 8794 EBML + the Matroska element registry): DocType
    from the EBML header, then inside Segment the Info element's
    TimecodeScale (default 1e6 ns) + float Duration, and each
    TrackEntry's TrackType (1 = video, 2 = audio) with the Video
    element's PixelWidth/PixelHeight. Cluster/Block payloads are
    SKIPPED via their declared sizes — the webm decode stub keeps the
    codec boundary, but the container is fully readable. Unknown-size
    elements (live streams) extend to their parent's end, the spec
    semantics. Returns ``{doctype, timescale_ns, duration_ms,
    n_tracks, has_video, has_audio, width, height}``; raises
    ValueError on non-EBML or malformed streams."""
    import struct

    if len(blob) < 4 or blob[:4] != b"\x1a\x45\xdf\xa3":
        raise ValueError("not an EBML/Matroska payload")
    doctype = None
    timescale = 1_000_000
    duration_ticks = None
    n_tracks = 0
    has_video = has_audio = False
    width = height = None
    CONTAINERS = {0x18538067, 0x1549A966, 0x1654AE6B, 0xAE, 0xE0, 0xE1}
    stack = [(0, len(blob), 0)]  # (pos, end, depth marker unused)
    hops = 0
    while stack:
        pos, end, _ = stack.pop()
        while pos < end:
            hops += 1
            if hops > 100_000:
                raise ValueError("oversized EBML tree")
            eid, idlen = _ebml_vint(blob, pos, keep_marker=True)
            size, szlen = _ebml_vint(blob, pos + idlen, keep_marker=False)
            data = pos + idlen + szlen
            if size == (1 << (7 * szlen)) - 1:  # unknown size
                size = end - data
            if data + size > end:
                raise ValueError("EBML element overruns its parent")
            body = blob[data : data + size]
            if eid == 0x1A45DFA3:  # EBML header: scan for DocType
                stack.append((data, data + size, 0))
            elif eid == 0x4282:
                doctype = body.split(b"\x00")[0].decode("latin-1")
            elif eid == 0x2AD7B1:
                timescale = int.from_bytes(body, "big") or 1_000_000
            elif eid == 0x4489:
                if len(body) == 4:
                    duration_ticks = struct.unpack(">f", body)[0]
                elif len(body) == 8:
                    duration_ticks = struct.unpack(">d", body)[0]
                else:
                    raise ValueError("bad Matroska Duration width")
            elif eid == 0x83:
                n_tracks += 1
                t = int.from_bytes(body, "big")
                has_video = has_video or t == 1
                has_audio = has_audio or t == 2
            elif eid == 0xB0:
                width = int.from_bytes(body, "big")
            elif eid == 0xBA:
                height = int.from_bytes(body, "big")
            elif eid in CONTAINERS:
                stack.append((data, data + size, 0))
            pos = data + size
    if doctype is None and duration_ticks is None and n_tracks == 0:
        raise ValueError("EBML stream with no Matroska content")
    duration_ms = None
    if duration_ticks is not None:
        import math

        ms = duration_ticks * timescale / 1_000_000
        # hostile bytes can decode to inf/nan/negative floats — int()
        # on inf raises OverflowError, which would leak past the
        # ValueError quarantine contract (found by the mutation fuzz)
        if not math.isfinite(ms) or ms < 0 or ms > 1e15:
            raise ValueError("implausible Matroska Duration")
        duration_ms = int(ms)
    return {
        "doctype": doctype,
        "timescale_ns": timescale,
        "duration_ms": duration_ms,
        "n_tracks": n_tracks,
        "has_video": has_video,
        "has_audio": has_audio,
        "width": width,
        "height": height,
    }


def mkv_audit(
    df: DataFrame,
    binary_col: str = "payload",
    id_col: str = "media_id",
    fake: bool = True,
) -> DataFrame:
    """WebM/Matroska sibling of :func:`mp4_audit`: per-blob (doctype,
    timescale_ns, duration_ms, n_tracks, has_video, has_audio, width,
    height) from the EBML element tree only — Cluster/Block payloads
    skipped, so the r9-documented webm stub keeps only the CODEC
    bitstream behind it while "how long/what shape is this stream" QA
    is a byte scan. NULL-row quarantine under fake=True, raise under
    fake=False; pytest-locked against hand-built EBML trees (incl. an
    unknown-size live-stream Segment) + a mutation fuzz."""
    out_schema = (
        f"{id_col} long, doctype string, timescale_ns long, "
        "duration_ms long, n_tracks int, has_video boolean, "
        "has_audio boolean, width int, height int"
    )
    cols = [
        id_col, "doctype", "timescale_ns", "duration_ms", "n_tracks",
        "has_video", "has_audio", "width", "height",
    ]

    def audit(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, blob in zip(pdf[id_col], pdf[binary_col]):
                try:
                    s = _mkv_structure(bytes(blob))
                except ValueError:
                    if not fake:
                        raise
                    rows.append({c: None for c in cols} | {id_col: mid})
                    continue
                rows.append({id_col: mid} | s)
            yield pd.DataFrame(rows, columns=cols)

    return df.select(id_col, binary_col).mapInPandas(audit, schema=out_schema)


def webp_audit(
    df: DataFrame,
    binary_col: str = "payload",
    id_col: str = "media_id",
    fake: bool = True,
) -> DataFrame:
    """WebP sibling of :func:`gif_frame_audit`: per-blob (variant,
    width, height, n_frames, total_duration_ms, loop_count, has_alpha)
    from the container structure only — compressed VP8/VP8L payloads
    are skipped via chunk sizes, so the audit is O(bytes) with zero
    decode CPU (this container has NO WebP pixel decoder — the audit
    is exactly the honest boundary: everything the headers declare,
    nothing the bitstream hides). Non-WebP/malformed blobs quarantine
    to NULL rows under fake=True, raise under fake=False. Pytest-locked
    (binary walk, not SQL-expressible) against hand-built
    lossy/lossless/extended/animated fixtures + a mutation fuzz."""
    out_schema = (
        f"{id_col} long, variant string, width int, height int, "
        "n_frames int, total_duration_ms long, loop_count int, "
        "has_alpha boolean"
    )
    cols = [
        id_col, "variant", "width", "height",
        "n_frames", "total_duration_ms", "loop_count", "has_alpha",
    ]

    def audit(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, blob in zip(pdf[id_col], pdf[binary_col]):
                try:
                    s = _webp_structure(bytes(blob))
                except ValueError:
                    if not fake:
                        raise
                    rows.append({c: None for c in cols} | {id_col: mid})
                    continue
                rows.append({id_col: mid} | s)
            yield pd.DataFrame(rows, columns=cols)

    return df.select(id_col, binary_col).mapInPandas(audit, schema=out_schema)


def tiff_audit(
    df: DataFrame,
    binary_col: str = "payload",
    id_col: str = "media_id",
    fake: bool = True,
) -> DataFrame:
    """TIFF sibling of :func:`gif_frame_audit`: per-blob (byte_order,
    width, height, n_pages, compression) from the IFD chain only —
    strip/tile data never touched, hostile cyclic IFD chains raise
    instead of spinning. Same quarantine contract (NULL rows under
    fake=True, raise under fake=False); pytest-locked against
    hand-built II/MM single- and multi-page fixtures + a mutation
    fuzz."""
    out_schema = (
        f"{id_col} long, byte_order string, width int, height int, "
        "n_pages int, compression int"
    )
    cols = [id_col, "byte_order", "width", "height", "n_pages", "compression"]

    def audit(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, blob in zip(pdf[id_col], pdf[binary_col]):
                try:
                    s = _tiff_structure(bytes(blob))
                except ValueError:
                    if not fake:
                        raise
                    rows.append({c: None for c in cols} | {id_col: mid})
                    continue
                rows.append({id_col: mid} | s)
            yield pd.DataFrame(rows, columns=cols)

    return df.select(id_col, binary_col).mapInPandas(audit, schema=out_schema)


_PIL_IMAGE = False  # False = not probed yet; None = probed, absent


def _pillow():
    """PIL.Image when Pillow is installed, else None (probed once per
    interpreter). Pillow is the PRODUCTION fast path: at 100 TB you
    swap libjpeg-turbo/zlib-backed decoding in by installing it on the
    cluster — no code change. The pure-Python codecs below stay as the
    always-available fallback AND the equality oracle
    (tests/test_llm.py::test_pillow_fast_path_matches_pure_codecs,
    skipped while the container lacks Pillow)."""
    global _PIL_IMAGE
    if _PIL_IMAGE is False:
        try:
            from PIL import Image as _img

            _PIL_IMAGE = _img
        except Exception:
            _PIL_IMAGE = None
    return _PIL_IMAGE


def _pure_decodable(blob: bytes) -> bool:
    """Header probe mirroring the pure decoders' variant envelope:
    True iff the blob is a variant ``_decode_bmp`` / ``_decode_png`` /
    ``_decode_gif`` / ``llm.jpeg.decode_jpeg`` would accept (by header
    shape — the body may still be corrupt). The Pillow fast path is
    gated on this so outputs NEVER depend on whether Pillow is
    installed: a variant the pure decoders reject (16-bit or interlaced
    PNG, arithmetic/lossless JPEG, non-24bpp BMP) takes the same
    deterministic fake/raise path either way, instead of Pillow quietly
    real-decoding it on clusters that have the library. Probe failures
    return False (pure path governs — its error contract is the pinned
    one). Pure Python, no Pillow needed, so the envelope itself is
    testable in this container."""
    try:
        if blob[:2] == b"BM":
            if len(blob) < 54:
                return False
            hdr = int.from_bytes(blob[14:18], "little")
            bpp = int.from_bytes(blob[28:30], "little")
            comp = int.from_bytes(blob[30:34], "little")
            return hdr >= 40 and bpp == 24 and comp == 0
        if blob[:8] == _PNG_SIG:
            # IHDR must be the first chunk (PNG spec); mirror
            # _decode_png: 8-bit, gray/rgb(+alpha), no interlace
            if len(blob) < 33 or blob[12:16] != b"IHDR":
                return False
            bitd, color, comp, filt, interlace = blob[24:29]
            return (
                bitd == 8
                and color in (0, 2, 4, 6)
                and comp == 0
                and filt == 0
                and interlace == 0
            )
        if blob[:6] in _GIF_SIGS:
            return True  # _decode_gif covers GIF87a/89a fully
        if blob[:3] == _JPEG_SIG:
            # walk markers to the first SOFn: accept baseline /
            # extended-sequential / progressive Huffman at 8-bit
            # precision with 1 or 3 components (decode_jpeg's gate)
            pos = 2
            while pos + 4 <= len(blob):
                if blob[pos] != 0xFF:
                    return False
                marker = blob[pos + 1]
                if marker in (0x01, 0xD8) or 0xD0 <= marker <= 0xD7:
                    pos += 2
                    continue
                ln = int.from_bytes(blob[pos + 2 : pos + 4], "big")
                if ln < 2:
                    return False
                if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
                    if marker not in (0xC0, 0xC1, 0xC2):
                        return False  # arithmetic/lossless/differential
                    seg = blob[pos + 4 : pos + 2 + ln]
                    return (
                        len(seg) >= 6 and seg[0] == 8 and seg[5] in (1, 3)
                    )
                pos += 2 + ln
            return False
    except Exception:
        return False
    return False


def _pillow_rgb(blob: bytes):
    """Fast-path decode → (h, w, 3) uint8 RGB, or None meaning 'use the
    pure-Python codecs'. Only the four natively-decoded raster magics
    are attempted, AND only the variants the pure decoders accept
    (``_pure_decodable`` header probe), so unknown formats and
    unsupported variants keep the documented fake/stub contract
    (oracled gates feed non-raster blobs through the DETERMINISTIC
    pseudo-decode — Pillow must never intercept those, nor real-decode
    a 16-bit PNG the pure path would fake); any Pillow failure falls
    back so the pure decoders' error contract (ValueError-or-decode,
    pinned by the fuzz tests) still governs."""
    mod = _pillow()
    if mod is None:
        return None
    if not _pure_decodable(blob):
        return None
    import io

    import numpy as np

    try:
        with mod.open(io.BytesIO(blob)) as im:
            return np.asarray(im.convert("RGB"), dtype=np.uint8)
    except Exception:
        return None


def _try_luma(blob: bytes, fake: bool):
    """One real-decode attempt for the raster formats this container
    CAN decode (BMP, PNG, GIF, baseline JPEG): returns the (h, w)
    float64 luma array, or None meaning 'take the deterministic fake
    path'. Under fake=True the fake path stays TOTAL — magic-prefixed
    garbage or unsupported variants (arithmetic-coded JPEG, 16-bit PNG)
    fall through instead of crashing the executor task; fake=False
    keeps the real decoders' strictness. When Pillow is installed the
    decode routes through it first (production fast path; identical
    pixels for the lossless formats, bounded-delta luma for JPEG —
    different IDCTs); the pure path remains the fallback."""
    px = _pillow_rgb(blob)
    if px is not None:
        return _png_luma(px)
    try:
        if blob[:2] == b"BM":
            return _decode_bmp(blob)
        if blob[:8] == _PNG_SIG:
            return _png_luma(_decode_png(blob))
        if blob[:6] in _GIF_SIGS:
            return _png_luma(_decode_gif(blob))
        if blob[:3] == _JPEG_SIG:
            from hadoop_fcfs_spark.llm.jpeg import decode_jpeg

            return _png_luma(decode_jpeg(blob))
    except ValueError:
        if not fake:
            raise
    return None


def attach_media_meta(df: DataFrame, binary_col: str = "payload") -> DataFrame:
    """Typed metadata from the blob itself — pure expressions, no
    Python: size, md5 digest, container format sniffed from magic
    bytes. Column pruning keeps blob-only scans away from queries that
    read just the metadata."""
    b = F.col(binary_col)
    fmt = F.lit("unknown")
    for magic, name in _MAGIC.items():
        hexpref = magic.hex()
        fmt = F.when(F.hex(F.substring(b, 1, len(magic))) == hexpref.upper(), F.lit(name)).otherwise(
            fmt
        )
    # RIFF is a container family: 'WEBP' at offset 8 refines it (plain
    # RIFF stays 'wav' — the oracled pseudo-decode gates depend on it)
    fmt = F.when(
        (F.hex(F.substring(b, 1, 4)) == b"RIFF".hex().upper())
        & (F.hex(F.substring(b, 9, 4)) == b"WEBP".hex().upper()),
        F.lit("webp"),
    ).otherwise(fmt)
    # ISO-BMFF's magic sits at offset 4 ('ftyp'), outside the prefix
    # table — but it only refines blobs NO leading magic claimed
    # (mirroring the WebP rule refining RIFF): a RIFF/WAV whose 4-byte
    # size field happens to spell 'ftyp' must stay 'wav'
    fmt = F.when(
        (fmt == "unknown")
        & (F.hex(F.substring(b, 5, 4)) == b"ftyp".hex().upper()),
        F.lit("mp4"),
    ).otherwise(fmt)
    return df.withColumn(
        "media_meta",
        F.struct(
            F.length(b).alias("size_bytes"),
            F.md5(b).alias("digest"),
            fmt.alias("format"),
        ),
    )


def decode_images(
    df: DataFrame, binary_col: str = "payload", id_col: str = "media_id", fake: bool = True
) -> DataFrame:
    """Decode image blobs → (id, width, height, mean_luma).

    24-bit uncompressed BMP (``_decode_bmp``, pure numpy), 8-bit
    non-interlaced PNG (``_decode_png``, stdlib zlib + numpy),
    GIF87a/89a (``_decode_gif``, pure-Python LZW), and JPEG — baseline
    AND progressive (``llm.jpeg.decode_jpeg``, pure Python+numpy
    Huffman/IDCT — r9) — decode FOR REAL, regardless of ``fake``. Formats with no native
    decoder left (none in the image tier; unknown blobs): fake=True
    gets the deterministic pseudo-decode (dimensions/luma derived from
    blob bytes — stable plumbing test); fake=False raises
    NotImplementedError.

    mapInPandas: Arrow-batched, one pandas frame per input batch —
    a full codec slots into the same loop unchanged.
    """

    out_schema = f"{id_col} long, width int, height int, mean_luma double"

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in batches:
            rows = []
            for mid, blob in zip(pdf[id_col], pdf[binary_col]):
                blob = bytes(blob)
                luma = _try_luma(blob, fake)
                if luma is not None:
                    rows.append(
                        {
                            id_col: mid,
                            "width": int(luma.shape[1]),
                            "height": int(luma.shape[0]),
                            # floor-to-micro for a stable comparable value
                            "mean_luma": (float(luma.mean()) / 255.0 * 1e6)
                            // 1
                            / 1e6,
                        }
                    )
                    continue
                if not fake:
                    raise NotImplementedError(
                        "no native decoder for this image format — BMP, "
                        "PNG, GIF and baseline JPEG decode natively; run "
                        "with fake=True or install a codec on the cluster"
                    )
                d = hashlib.md5(blob).digest()
                rows.append(
                    {
                        id_col: mid,
                        "width": 16 + d[0] % 64,
                        "height": 16 + d[1] % 64,
                        # floor-to-micro, not round(): Python round() is
                        # banker's and diverges from SQL ROUND at half-tails
                        "mean_luma": (d[2] / 255.0 * 1e6) // 1 / 1e6,
                    }
                )
            yield pd.DataFrame(rows, columns=[id_col, "width", "height", "mean_luma"])

    return df.select(id_col, binary_col).mapInPandas(decode, schema=out_schema)


def sample_frames(
    df: DataFrame,
    binary_col: str = "payload",
    id_col: str = "media_id",
    every_n_bytes: int = 1024,
    fake: bool = True,
) -> DataFrame:
    """Frame-sampling plumbing for video blobs: emits one row per
    sampled frame (UDTF shape — rows out ≥ rows in). Y4M (yuv4mpeg2 —
    text header + raw YUV frames, the one container decodable without
    any codec) extracts REAL frames: one row per FRAME marker with the
    md5 of the frame's Y plane as the digest, regardless of ``fake``.
    Animated GIF (r9) also extracts REAL frames — the full compositor
    (``_decode_gif_frames``: disposal methods, transparency, frame
    rects, per-frame delays) yields one row per composed canvas with
    the md5 of its RGB bytes; under fake=True a malformed GIF falls
    through to the byte-window stub (the _try_luma totality
    discipline), fake=False keeps decoder strictness. Other
    containers keep the stub: with fake=True frames are byte-window
    digests; real extraction (ffmpeg) slots into the same
    iterator."""

    out_schema = f"{id_col} long, frame_idx int, frame_digest string"

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        def y4m_frames(raw: bytes):
            nl = raw.find(b"\n")
            if nl < 0:
                raise ValueError("malformed Y4M: unterminated stream header")
            w = h = None
            c = "420"
            for tok in raw[9:nl].split(b" "):
                if tok[:1] == b"W":
                    w = int(tok[1:])
                elif tok[:1] == b"H":
                    h = int(tok[1:])
                elif tok[:1] == b"C":
                    c = tok[1:].decode("ascii", "replace")
            if not w or not h:
                raise ValueError("Y4M header missing W/H")
            ysize = w * h
            if c.startswith("420"):
                fsize = ysize + ysize // 2
            elif c.startswith("422"):
                fsize = ysize * 2
            elif c.startswith("444"):
                fsize = ysize * 3
            else:
                raise ValueError(f"unsupported Y4M chroma {c!r}")
            pos = nl + 1
            while pos < len(raw):
                # check the marker BEFORE looking for its newline — and
                # use find, not index, so trailing garbage with no
                # newline gets the explicit malformed-Y4M error instead
                # of a bare 'substring not found'
                if raw[pos : pos + 5] != b"FRAME":
                    raise ValueError("malformed Y4M: FRAME marker expected")
                fnl = raw.find(b"\n", pos)
                if fnl < 0:
                    raise ValueError("malformed Y4M: unterminated FRAME header")
                start = fnl + 1
                if start + fsize > len(raw):
                    raise ValueError("truncated Y4M frame")
                yield raw[start : start + ysize]  # Y plane
                pos = start + fsize

        for pdf in batches:
            rows = []
            for mid, blob in zip(pdf[id_col], pdf[binary_col]):
                raw = bytes(blob)
                if raw[:9] == b"YUV4MPEG2":
                    for i, yplane in enumerate(y4m_frames(raw)):
                        rows.append(
                            {
                                id_col: mid,
                                "frame_idx": i,
                                "frame_digest": hashlib.md5(yplane).hexdigest(),
                            }
                        )
                    continue
                if raw[:6] in _GIF_SIGS:
                    # stream the compositor: digest each canvas as it is
                    # yielded and drop it — peak memory is one canvas +
                    # one snapshot no matter how many frames. Errors are
                    # LAZY (generator), so the loop is what's guarded.
                    gif_rows = []
                    try:
                        for i, (frame, _delay) in enumerate(
                            _iter_gif_frames(raw)
                        ):
                            gif_rows.append(
                                {
                                    id_col: mid,
                                    "frame_idx": i,
                                    "frame_digest": hashlib.md5(
                                        frame.tobytes()
                                    ).hexdigest(),
                                }
                            )
                    except ValueError:
                        if not fake:
                            raise
                        gif_rows = None
                    if gif_rows is not None:
                        rows.extend(gif_rows)
                        continue
                if not fake:
                    raise NotImplementedError(
                        "frame extraction from compressed video requires "
                        "ffmpeg; only Y4M decodes natively"
                    )
                for i, off in enumerate(range(0, max(len(raw), 1), every_n_bytes)):
                    window = raw[off : off + every_n_bytes]
                    rows.append(
                        {
                            id_col: mid,
                            "frame_idx": i,
                            "frame_digest": hashlib.md5(window).hexdigest(),
                        }
                    )
            yield pd.DataFrame(rows, columns=[id_col, "frame_idx", "frame_digest"])

    return df.select(id_col, binary_col).mapInPandas(sample, schema=out_schema)


def resize_images(
    df: DataFrame,
    target_w: int,
    target_h: int,
    binary_col: str = "payload",
    id_col: str = "media_id",
    fake: bool = True,
) -> DataFrame:
    """Resize plumbing: binary in → binary out (+ recorded dims), the
    blob-transform shape (payload column is REPLACED, metadata updated
    downstream by re-running attach_media_meta). BMP, PNG and GIF
    payloads resize FOR REAL — pure-numpy nearest-neighbor on the
    decoded grid, re-encoded in kind as a valid 24-bit BMP / truecolor
    PNG / palette GIF (GIF resamples the INDEX grid and keeps its
    color table — no quantization step; round-trips through the
    matching decoder + attach_media_meta; PNG gray/alpha inputs
    re-encode truecolor, alpha dropped; JPEG re-encodes baseline 4:4:4
    q=90 via llm.jpeg — one recompression generation, like any
    thumbnailer). Unknown formats: with fake=True a deterministic
    digest-expansion sized ∝ target area; fake=False raises. Output
    schema: (id, payload, width, height)."""

    out_schema = f"{id_col} long, {binary_col} binary, width int, height int"
    if target_w < 1 or target_h < 1:
        raise ValueError(f"target dims must be >= 1, got {target_w}x{target_h}")

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        import numpy as np

        def bmp_resize(blob: bytes) -> bytes:
            off = int.from_bytes(blob[10:14], "little")
            w = int.from_bytes(blob[18:22], "little", signed=True)
            h0 = int.from_bytes(blob[22:26], "little", signed=True)
            flip = h0 > 0
            h = abs(h0)
            stride = ((w * 3 + 3) // 4) * 4
            px = (
                np.frombuffer(blob, dtype=np.uint8, count=stride * h, offset=off)
                .reshape(h, stride)[:, : w * 3]
                .reshape(h, w, 3)
            )
            if flip:
                px = px[::-1]
            yi = (np.arange(target_h) * h) // target_h
            xi = (np.arange(target_w) * w) // target_w
            out = px[yi][:, xi]  # nearest-neighbor
            ostride = ((target_w * 3 + 3) // 4) * 4
            body = np.zeros((target_h, ostride), dtype=np.uint8)
            body[:, : target_w * 3] = out[::-1].reshape(target_h, target_w * 3)
            ooff = 54
            hdr = (
                b"BM"
                + (ooff + body.size).to_bytes(4, "little")
                + b"\x00\x00\x00\x00"
                + ooff.to_bytes(4, "little")
                + (40).to_bytes(4, "little")
                + target_w.to_bytes(4, "little", signed=True)
                + target_h.to_bytes(4, "little", signed=True)
                + (1).to_bytes(2, "little")
                + (24).to_bytes(2, "little")
                + (0).to_bytes(4, "little")
                + int(body.size).to_bytes(4, "little")
                + b"\x00" * 16
            )
            return hdr + body.tobytes()

        def png_resize(blob: bytes) -> bytes:
            px = _decode_png(blob)
            c = px.shape[2]
            rgb = (
                np.ascontiguousarray(px[:, :, :3])
                if c >= 3
                else np.repeat(px[:, :, :1], 3, axis=2)
            )
            h, w = rgb.shape[:2]
            yi = (np.arange(target_h) * h) // target_h
            xi = (np.arange(target_w) * w) // target_w
            return _encode_png(np.ascontiguousarray(rgb[yi][:, xi]))

        def jpeg_resize(blob: bytes) -> bytes:
            # resize-in-kind: decode -> nearest-neighbor -> re-encode
            # baseline 4:4:4 (one recompression generation, like any
            # JPEG thumbnailer). Decode takes the Pillow fast path when
            # installed (the expensive leg); re-encode stays the pure
            # encoder. NOTE: unlike the lossless formats, JPEG output
            # bytes are environment-dependent — Pillow's IDCT rounds
            # differently from the pure decoder, so the re-encoded
            # pixels differ within the bounded-delta luma contract.
            from hadoop_fcfs_spark.llm.jpeg import decode_jpeg, encode_jpeg

            rgb = _pillow_rgb(blob)
            if rgb is None:
                rgb = decode_jpeg(blob)
            h, w = rgb.shape[:2]
            yi = (np.arange(target_h) * h) // target_h
            xi = (np.arange(target_w) * w) // target_w
            return encode_jpeg(rgb[yi][:, xi], quality=90)

        def gif_resize(blob: bytes) -> bytes:
            # nearest-neighbor in PALETTE space: resample the index
            # grid, keep the color table — resize-in-kind without any
            # quantization step (the palette is already the palette)
            idx, pal = _decode_gif_indexed(blob)
            h, w = idx.shape
            yi = (np.arange(target_h) * h) // target_h
            xi = (np.arange(target_w) * w) // target_w
            n = pal.shape[0]
            if n < 4 or n & (n - 1):  # encoder wants a power of two >= 4
                padded = np.zeros((max(4, 1 << (n - 1).bit_length()), 3),
                                  np.uint8)
                padded[:n] = pal
                pal = padded
            return _encode_gif(idx[yi][:, xi], pal)

        for pdf in batches:
            rows = []
            for mid, blob in zip(pdf[id_col], pdf[binary_col]):
                blob = bytes(blob)
                buf = None
                try:
                    if blob[:2] == b"BM":
                        _decode_bmp(blob)  # validate variant up front
                        buf = bmp_resize(blob)
                    elif blob[:8] == _PNG_SIG:
                        buf = png_resize(blob)
                    elif blob[:6] in _GIF_SIGS:
                        buf = gif_resize(blob)
                    elif blob[:3] == _JPEG_SIG:
                        buf = jpeg_resize(blob)
                except ValueError:
                    # keep fake=True total (see _try_luma)
                    if not fake:
                        raise
                if buf is None:
                    if not fake:
                        raise NotImplementedError(
                            "no native resize for this image format — "
                            "BMP, PNG, GIF and baseline JPEG resize "
                            "natively"
                        )
                    seed = hashlib.md5(blob).digest()
                    need = max(target_w * target_h // 8, 16)
                    buf = (seed * (need // len(seed) + 1))[:need]
                rows.append(
                    {id_col: mid, binary_col: buf, "width": target_w, "height": target_h}
                )
            yield pd.DataFrame(rows, columns=[id_col, binary_col, "width", "height"])

    return df.select(id_col, binary_col).mapInPandas(resize, schema=out_schema)


def extract_audio_features(
    df: DataFrame,
    n_features: int = 8,
    binary_col: str = "payload",
    id_col: str = "media_id",
    fake: bool = True,
) -> DataFrame:
    """Audio feature extraction: blob → fixed-width float feature vector
    (`array<float>`), the column shape the similarity-search tier
    consumes (llm.similarity.cosine_topk / rp_lsh_topk run on the output
    unchanged). WAV payloads (r9) extract REAL features, no codec
    library needed: the PCM samples (stdlib ``wave``, channel 0, 8/16
    bit) go through a numpy rFFT power spectrum, split into
    ``n_features`` log-spaced frequency bands (a coarse filterbank —
    the front half of an MFCC pipeline before the DCT), feature i =
    log10(1 + mean band power); duration is the real header value.
    Compressed audio (mp3/ogg) keeps the honest boundary: fake=True
    yields deterministic digest-derived pseudo-features, fake=False
    raises where librosa/torchaudio would slot in.
    Output: (id, duration_s, features array<float>)."""

    out_schema = f"{id_col} long, duration_s double, features array<float>"

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import audioop
        import hashlib
        import io
        import struct
        import wave

        import numpy as np

        def wav_features(raw: bytes):
            with wave.open(io.BytesIO(raw)) as w:
                nch, sw, sr = w.getnchannels(), w.getsampwidth(), w.getframerate()
                nf = w.getnframes()
                frames = w.readframes(nf)
            if sw == 2:
                x = np.frombuffer(frames, "<i2").astype(np.float64)
            elif sw == 1:
                x = np.frombuffer(frames, np.uint8).astype(np.float64) - 128.0
            else:
                raise ValueError(f"unsupported WAV sample width {sw}")
            x = x[::nch] if nch > 1 else x  # channel 0 of interleaved frames
            if len(x) < 4 * n_features or sr <= 0:
                raise ValueError("too short to extract spectral features")
            power = np.abs(np.fft.rfft(x)) ** 2 / len(x)
            # log-spaced band edges over the positive-frequency bins
            # (DC excluded) — a coarse mel-like filterbank
            edges = np.unique(
                np.geomspace(1, len(power) - 1, n_features + 1).astype(int)
            )
            while len(edges) < n_features + 1:  # tiny clips: pad linearly
                edges = np.unique(np.append(edges, edges[-1] + 1))
            feats = [
                round(float(np.log10(1.0 + power[lo:hi].mean())), 6)
                for lo, hi in zip(edges[:-1], edges[1:])
            ]
            return round(nf / sr, 6), feats

        for pdf in batches:
            rows = []
            for mid, blob in zip(pdf[id_col], pdf[binary_col]):
                raw = bytes(blob)
                try:
                    dur, feats = wav_features(raw)
                except (wave.Error, EOFError, ValueError, RuntimeError,
        OverflowError, struct.error, audioop.error):
                    if not fake:
                        raise NotImplementedError(
                            "feature extraction for compressed audio "
                            "requires a codec (e.g. librosa) — WAV "
                            "extracts natively"
                        )
                    d = hashlib.md5(raw).digest()
                    dur = round(len(raw) / 16000.0, 6)
                    feats = [
                        round((d[i] - 128) / 128.0, 6)
                        for i in range(n_features)
                    ]
                rows.append(
                    {id_col: mid, "duration_s": dur, "features": feats}
                )
            yield pd.DataFrame(rows, columns=[id_col, "duration_s", "features"])

    return df.select(id_col, binary_col).mapInPandas(extract, schema=out_schema)


def image_ahash(
    df: DataFrame, binary_col: str = "payload", id_col: str = "media_id", fake: bool = True
) -> DataFrame:
    """Perceptual average-hash per image: downsample to an 8x8 luma grid,
    hash = 64 bits of (cell > mean). Output (id, ahash long).

    BMP, PNG, GIF and baseline JPEG payloads take the REAL aHash path:
    native decode → true 8x8 average-pooled luma grid → threshold
    bits, so near-identical images (small pixel noise) genuinely
    collide and different pictures genuinely differ — across container
    formats too, since the hash is over decoded pixels. Unknown
    formats share decode_images' honest boundary: with fake=True an
    8x8 grid is derived deterministically from the blob bytes (chunk
    means — stable, content-sensitive); with fake=False this raises.
    The Spark-side shape — Arrow-batched mapInPandas, one long per
    image — is the real pipeline.
    """
    out_schema = f"{id_col} long, ahash long"

    def hash_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        def bits_to_long(bits) -> int:
            h = np.uint64(0)
            for bit in bits:
                h = np.uint64(h << np.uint64(1)) | np.uint64(bit)
            return int(np.int64(h.astype(np.int64)))

        for pdf in batches:
            ids, hashes = [], []
            for mid, blob in zip(pdf[id_col], pdf[binary_col]):
                blob = bytes(blob)
                luma = _try_luma(blob, fake)
                if luma is not None:
                    # true 8x8 average pool (array_split: any size)
                    grid = np.array(
                        [
                            float(cell.mean())
                            for rowband in np.array_split(luma, 8, axis=0)
                            for cell in np.array_split(rowband, 8, axis=1)
                        ]
                    )
                else:
                    if not fake:
                        raise NotImplementedError(
                            "no native decoder for this image format — "
                            "BMP, PNG, GIF and baseline JPEG hash "
                            "natively; fake=True exercises the plumbing "
                            "for other formats"
                        )
                    b = np.frombuffer(blob, dtype=np.uint8)
                    # deterministic 64-cell "downsample": 64 byte-chunk means
                    cells = np.array_split(b, 64) if len(b) >= 64 else [b] * 64
                    grid = np.array(
                        [float(c.mean()) if len(c) else 0.0 for c in cells]
                    )
                bits = (grid > grid.mean()).astype(np.uint64)
                ids.append(mid)
                hashes.append(bits_to_long(bits))
            yield pd.DataFrame({id_col: ids, "ahash": hashes})

    return df.mapInPandas(hash_batch, out_schema)


def _banded_hamming_pairs(
    h: DataFrame, id_col: str, hash_col: str, max_hamming: int
) -> DataFrame:
    """Shared banded-hamming candidate join over 64-bit signatures: 4 x
    16-bit bands; pigeonhole guarantees every pair at hamming <= 3
    shares an exact band, so candidates come from 4 equi-joins (never
    all-pairs) and are verified with an exact popcount."""
    if not 0 <= max_hamming <= 3:
        raise ValueError(f"max_hamming must be in [0, 3] (4-band pigeonhole), got {max_hamming}")
    bands = F.posexplode(
        F.array(*[
            F.shiftrightunsigned(F.col(hash_col), b * 16).bitwiseAND(F.lit(0xFFFF))
            for b in range(4)
        ])
    )
    banded = h.select(F.col(id_col).alias("id"), hash_col, bands.alias("band_idx", "band_val"))
    l = banded.select(F.col("id").alias("id_a"), F.col(hash_col).alias("__ha"), "band_idx", "band_val")
    r = banded.select(F.col("id").alias("id_b"), F.col(hash_col).alias("__hb"), "band_idx", "band_val")
    ham = F.bit_count(F.col("__ha").bitwiseXOR(F.col("__hb")))
    return (
        l.join(r, ["band_idx", "band_val"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", ham.alias("hamming"))
        .distinct()
        .filter(F.col("hamming") <= max_hamming)
    )


def image_near_dup_pairs(
    df: DataFrame,
    binary_col: str = "payload",
    id_col: str = "media_id",
    max_hamming: int = 3,
) -> DataFrame:
    """Image near-duplicate pairs: banded hamming join over perceptual
    hashes — the multimodal twin of simhash_pairs. Output
    (id_a, id_b, hamming)."""
    return _banded_hamming_pairs(image_ahash(df, binary_col, id_col), id_col, "ahash", max_hamming)


def decode_wav(
    df: DataFrame, binary_col: str = "payload", id_col: str = "media_id"
) -> DataFrame:
    """REAL audio decode for WAV containers — no external codec needed:
    the Python stdlib ``wave`` module parses the RIFF/WAVE header and
    ``audioop`` computes sample statistics. This replaces the fake-decode
    boundary for the one format the container can genuinely decode
    (mp3/ogg still need a codec and stay behind the stub).

    Output: (id, n_channels, sample_rate, sample_width, n_frames,
    duration_s, rms). Malformed blobs yield a row with NULL fields
    rather than failing the batch — ingest garbage routes downstream
    like read_json's quarantine policy.
    """
    out_schema = (
        f"{id_col} long, n_channels int, sample_rate int, sample_width int, "
        "n_frames long, duration_s double, rms double"
    )

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import audioop
        import io
        import struct
        import wave

        for pdf in batches:
            rows = []
            for mid, blob in zip(pdf[id_col], pdf[binary_col]):
                try:
                    if blob is None:
                        raise ValueError("null payload")
                    with wave.open(io.BytesIO(bytes(blob))) as w:
                        nch = w.getnchannels()
                        sw = w.getsampwidth()
                        sr = w.getframerate()
                        nf = w.getnframes()
                        frames = w.readframes(nf)
                    # hostile headers carry arbitrary 4-byte fields; an
                    # implausible rate would overflow the int32 column
                    # at the Arrow boundary and kill the task instead
                    # of quarantining the row
                    if not (
                        1 <= nch <= 1024 and 1 <= sw <= 4
                        and 1 <= sr <= 2**31 - 1 and 0 <= nf <= 2**62
                    ):
                        raise ValueError("implausible WAV header fields")
                    rows.append(
                        {
                            id_col: mid,
                            "n_channels": nch,
                            "sample_rate": sr,
                            "sample_width": sw,
                            "n_frames": nf,
                            "duration_s": nf / sr if sr else None,
                            "rms": float(audioop.rms(frames, sw)) if frames else 0.0,
                        }
                    )
                except (wave.Error, EOFError, ValueError, RuntimeError,
        OverflowError, struct.error, audioop.error):
                    rows.append(
                        {
                            id_col: mid,
                            "n_channels": None,
                            "sample_rate": None,
                            "sample_width": None,
                            "n_frames": None,
                            "duration_s": None,
                            "rms": None,
                        }
                    )
            yield pd.DataFrame(
                rows,
                columns=[
                    id_col, "n_channels", "sample_rate", "sample_width",
                    "n_frames", "duration_s", "rms",
                ],
            )

    return df.select(id_col, binary_col).mapInPandas(decode, out_schema)


def resample_wav(
    df: DataFrame,
    target_rate: int,
    binary_col: str = "payload",
    id_col: str = "media_id",
) -> DataFrame:
    """REAL WAV resampling via ``audioop.ratecv`` (stdlib linear
    interpolation): blob in → re-encoded WAV blob out at ``target_rate``,
    the blob-transform shape (same contract as resize_images but with a
    genuine codec). Malformed blobs pass through with NULL payload.
    Output: (id, payload, sample_rate)."""
    if target_rate <= 0:
        raise ValueError(f"target_rate must be > 0, got {target_rate}")

    out_schema = f"{id_col} long, {binary_col} binary, sample_rate int"

    def resample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import audioop
        import io
        import struct
        import wave

        for pdf in batches:
            rows = []
            for mid, blob in zip(pdf[id_col], pdf[binary_col]):
                try:
                    if blob is None:
                        raise ValueError("null payload")
                    with wave.open(io.BytesIO(bytes(blob))) as w:
                        nch, sw, sr = w.getnchannels(), w.getsampwidth(), w.getframerate()
                        frames = w.readframes(w.getnframes())
                    converted, _ = audioop.ratecv(frames, sw, nch, sr, target_rate, None)
                    buf = io.BytesIO()
                    with wave.open(buf, "wb") as out:
                        out.setnchannels(nch)
                        out.setsampwidth(sw)
                        out.setframerate(target_rate)
                        out.writeframes(converted)
                    rows.append(
                        {id_col: mid, binary_col: buf.getvalue(), "sample_rate": target_rate}
                    )
                except (wave.Error, EOFError, ValueError, RuntimeError,
        OverflowError, struct.error, audioop.error):
                    rows.append({id_col: mid, binary_col: None, "sample_rate": None})
            yield pd.DataFrame(rows, columns=[id_col, binary_col, "sample_rate"])

    return df.select(id_col, binary_col).mapInPandas(resample, out_schema)


def audio_fingerprint(
    df: DataFrame, binary_col: str = "payload", id_col: str = "media_id"
) -> DataFrame:
    """64-bit energy-contour fingerprint from REAL WAV decode (stdlib
    wave/audioop): the samples split into 64 equal time windows, bit b =
    (window b's RMS > median window RMS). Amplitude-invariant (scaling
    every sample scales the median equally) and deterministic — the
    audio twin of image_ahash, feeding the same banded-hamming join.
    Malformed blobs yield a NULL fingerprint. Output: (id, afp long)."""
    out_schema = f"{id_col} long, afp long"

    def fp(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import audioop
        import io
        import statistics
        import struct
        import wave

        for pdf in batches:
            rows = []
            for mid, blob in zip(pdf[id_col], pdf[binary_col]):
                try:
                    if blob is None:
                        raise ValueError("null payload")
                    with wave.open(io.BytesIO(bytes(blob))) as w:
                        sw = w.getsampwidth()
                        frames = w.readframes(w.getnframes())
                    n = len(frames) // sw
                    if n < 64:
                        raise ValueError("too short to fingerprint")
                    win = (n // 64) * sw  # bytes per window, frame-aligned
                    energies = [
                        audioop.rms(frames[i * win : (i + 1) * win], sw)
                        for i in range(64)
                    ]
                    med = statistics.median(energies)
                    h = 0
                    for e in energies:
                        h = (h << 1) | (1 if e > med else 0)
                    # two's-complement into signed 64-bit for LongType
                    if h >= 1 << 63:
                        h -= 1 << 64
                    rows.append({id_col: mid, "afp": h})
                except (wave.Error, EOFError, ValueError, RuntimeError,
        OverflowError, struct.error, audioop.error):
                    rows.append({id_col: mid, "afp": None})
            yield pd.DataFrame(rows, columns=[id_col, "afp"])

    return df.select(id_col, binary_col).mapInPandas(fp, out_schema)


def audio_near_dup_pairs(
    df: DataFrame,
    binary_col: str = "payload",
    id_col: str = "media_id",
    max_hamming: int = 3,
) -> DataFrame:
    """Audio near-duplicate pairs over the REAL-codec energy-contour
    fingerprints: same 4x16-band pigeonhole join as the image tier.
    Output (id_a, id_b, hamming)."""
    h = audio_fingerprint(df, binary_col, id_col).filter(F.col("afp").isNotNull())
    return _banded_hamming_pairs(h, id_col, "afp", max_hamming)
