"""Multimodal columns — SURVEY.md §2.12 north-star.

Pattern: media payloads are opaque `binary` columns (or object-store
pointers, the reference's external-table pattern — reference
backend/hive_manager.py:176) carried alongside typed metadata.  All
per-item compute (decode, feature-extract, resize, frame-sample) runs as
Arrow-batched pandas iterators via `mapInPandas`, so the Spark-side
plumbing — schema, partitioning, batch shape — is identical whether the
inner function calls Pillow/ffmpeg or a stub.

The actual codec libraries are NOT in this container, so codec-needing
formats (progressive/arithmetic JPEG, sub-byte PNG bit depths, FLAC/MP3
samples) raise NotImplementedError from `decode_image` and the pipeline
is exercised end-to-end with `fake_decode_image` — a deterministic
stand-in keyed on the payload's md5 (real plumbing, fake pixels).
Swapping in a real decoder changes ONE function and zero Spark code.

Exceptions (rounds 12-14): formats whose decode needs only stdlib +
numpy are REAL with zero new dependencies:

- 24-bit BMP (r12): `decode_bmp_image` — struct header parse + numpy
  row de-padding + luma downsample to the FEATURE_DIM strip.
- 8- and 16-bit PNG, ALL color types (gray/RGB/palette/alpha),
  sequential AND Adam7-interlaced (r13; 16-bit r14):
  `decode_png_image` — stdlib zlib inflates
  the IDAT stream (hard-capped at the header-implied size, so deflate
  bombs fail as ValueError not as allocations), scanlines unfilter per
  the public spec — None/Up/Sub vectorized in numpy, Average/Paeth as
  spec-faithful scalar loops (their left+up dependency is inherently
  sequential) — palette indices resolve through PLTE, same luma strip.
- GIF, interlaced or not (r13): `decode_gif_image` — pure-Python
  GIF-LZW over the first frame, palette lookup, 4-pass row
  de-interlace, same luma strip.
- integer-PCM WAV (r12): `decode_wav_samples` — RIFF chunk walk + numpy
  frame read + channel downmix, routed natively by `audio_rms_windows`.
- baseline sequential JPEG (r14): `decode_jpeg_image` — per-MCU huffman
  entropy decode (restart-interval aware) from the public T.81 spec,
  then a single vectorized float64 IDCT over all luma blocks; JFIF Y
  IS BT.601 luma, so the feature contract matches the other decoders.
  Progressive / arithmetic / 12-bit JPEG keep the loud codec stub.

All are routed natively by `decode_image`/`extract_features` even
without Pillow (dispatch: `native_image_decode`).  All four sniffed
image formats and one audio format are therefore fully real in this
container, pinning the feature contracts against actual pixel/sample
data.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), True),  # image | audio | video
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.LongType(), True),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), True),
        T.StructField("payload_md5", T.StringType(), True),
        T.StructField("payload_bytes", T.LongType(), True),
        T.StructField("feature", T.ArrayType(T.DoubleType()), True),
    ]
)

FEATURE_DIM = 8


def real_decoder_available() -> bool:
    """True when an image codec library (Pillow) is importable.  Checked
    lazily PER PYTHON WORKER, so a deployment that ships Pillow on its
    executors lights up the real decode path with zero code change."""
    try:
        import PIL.Image  # noqa: F401

        return True
    except Exception:
        return False


def _luma_strip(luma) -> list[float]:
    """(h, w) float64 luma plane → FEATURE_DIM column-pooled strip of
    [0,1] intensities: bucket b = columns [b·w/8, (b+1)·w/8), never
    empty.  ONE implementation shared by every native pixel decoder
    (BMP/PNG/GIF), so a format pair that decodes to the same pixels is
    guaranteed the same feature bits — fixed float64 reduction order,
    driver ≡ executor."""
    w = luma.shape[1]
    out = []
    for b in range(FEATURE_DIM):
        lo = (b * w) // FEATURE_DIM
        hi = max(((b + 1) * w) // FEATURE_DIM, lo + 1)
        out.append(float(luma[:, lo:hi].mean() / 255.0))
    return out


def is_plain_bmp(payload: bytes) -> bool:
    """True for an uncompressed 24-bit bottom-up/top-down BMP whose pixel
    array is fully present — the one image container decodable with no
    codec library (the pixel rows are raw BGR bytes behind a fixed
    54-byte header pair)."""
    p = payload
    if len(p) < 54 or p[:2] != b"BM":
        return False
    bpp = int.from_bytes(p[28:30], "little")
    compression = int.from_bytes(p[30:34], "little")
    if bpp != 24 or compression != 0:
        return False
    w = int.from_bytes(p[18:22], "little", signed=True)
    h = int.from_bytes(p[22:26], "little", signed=True)
    off = int.from_bytes(p[10:14], "little")
    if w <= 0 or h == 0 or off < 54:
        return False
    stride = (w * 3 + 3) & ~3
    return len(p) >= off + stride * abs(h)


def decode_bmp_image(payload: bytes) -> list[float]:
    """REAL pixel decode for uncompressed 24-bit BMP — no codec library:
    struct-parse the header (pixel offset, dims, bottom-up sign), numpy
    de-pad the 4-byte-aligned BGR rows, integer-exact BT.601 luma
    (299R+587G+114B)/1000, then mean-pool columns into the FEATURE_DIM
    strip (bucket b = columns [b·w/8, (b+1)·w/8), never empty), each
    value normalized to [0,1].  float64 throughout with a fixed
    reduction order, so driver and executors produce identical bits —
    the round-trip assert in ddl_multimodal_features relies on that."""
    import numpy as np

    if not is_plain_bmp(payload):
        raise ValueError("not an uncompressed 24-bit BMP")
    p = payload
    off = int.from_bytes(p[10:14], "little")
    w = int.from_bytes(p[18:22], "little", signed=True)
    h_signed = int.from_bytes(p[22:26], "little", signed=True)
    h = abs(h_signed)
    stride = (w * 3 + 3) & ~3
    rows = np.frombuffer(
        p, dtype=np.uint8, count=stride * h, offset=off
    ).reshape(h, stride)[:, : w * 3]
    px = rows.reshape(h, w, 3).astype(np.int64)  # BGR
    if h_signed > 0:  # bottom-up storage → flip to image order
        px = px[::-1]
    luma = (
        299 * px[:, :, 2] + 587 * px[:, :, 1] + 114 * px[:, :, 0]
    ) / 1000.0
    return _luma_strip(luma)


# PNG color type → samples per pixel IN THE FILTERED STREAM.  Palette
# (type 3) carries one index byte per pixel, resolved through the PLTE
# chunk after unfiltering — the same palette-lookup step as GIF.
_PNG_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def _png_parse(payload: bytes):
    """ONE structural chunk walk shared by the gate (is_plain_png) and
    the decoder (decode_png_pixels), so the two can never disagree on
    malformed payloads — the lesson from the r12 WAV advice, applied
    from the start here.  Returns (width, height, bit_depth, color_type,
    interlace, idat_bytes) for a structurally complete PNG (signature,
    13-byte IHDR first, every chunk length in bounds, ≥1 IDAT, IEND
    reached), else None.  CRCs are not validated — corrupt pixel data
    is caught by the zlib stream and the exact length check instead."""
    p = payload
    if len(p) < 8 + 25 or p[:8] != b"\x89PNG\r\n\x1a\n":
        return None
    ihdr = None
    plte = None
    idat = []
    seen_end = False
    i = 8
    while i + 8 <= len(p):
        clen = int.from_bytes(p[i : i + 4], "big")
        ctype = p[i + 4 : i + 8]
        if i + 12 + clen > len(p):
            return None
        body = p[i + 8 : i + 8 + clen]
        if ctype == b"IHDR":
            if clen != 13 or ihdr is not None or i != 8:
                return None
            ihdr = body
        elif ctype == b"PLTE":
            if clen % 3 != 0 or clen == 0:
                return None
            plte = body
        elif ctype == b"IDAT":
            idat.append(body)
        elif ctype == b"IEND":
            seen_end = True
            break
        i += 12 + clen
    if ihdr is None or not idat or not seen_end:
        return None
    w = int.from_bytes(ihdr[0:4], "big")
    h = int.from_bytes(ihdr[4:8], "big")
    bit_depth, color_type, compression, filter_method, interlace = ihdr[8:13]
    if compression != 0 or filter_method != 0:
        return None
    return (w, h, bit_depth, color_type, interlace, b"".join(idat), plte)


# Upper bound on pixels a native decoder will touch (16.7M ≈ 4096²):
# header-claimed dimensions size several allocations (decompress cap,
# index/palette buffers), so an absurd-dims header must fail the GATE —
# falling back to the deterministic fake — rather than attempt a
# multi-GB allocation that dies as MemoryError (which the pipeline's
# except-ValueError fallback could not catch).
_MAX_NATIVE_PIXELS = 1 << 24

# CPU-budget twins of the memory cap above (r13 ADVICE): the pixel cap
# bounds allocations, but two decode paths run interpreted per-byte
# Python loops whose COST the memory cap does not bound — GIF LZW
# (~one loop iteration per emitted index byte) and the PNG
# Average/Paeth scalar unfilter (one iteration per filtered byte).  An
# adversarial 16.7M-px Paeth RGBA PNG would cost ~67M interpreted
# iterations (minutes per executor task) while staying under the
# memory cap.  GIF cost is header-predictable (w*h), so its GATE caps
# at _MAX_SCALAR_PIXELS (4M px ≈ 2048²) and oversized frames fall to
# the codec path / deterministic fake like any other unsupported
# container.  PNG filter types are only known AFTER inflate, so the
# decoder meters scalar-filtered bytes against _MAX_SCALAR_FILTER_BYTES
# at runtime and raises ValueError on exhaustion (→ pipeline fake),
# bounding the loop at ~8M iterations.  Vectorized filters
# (None/Sub/Up) stay uncapped — numpy, not interpreter, cost.
_MAX_SCALAR_PIXELS = 1 << 22
_MAX_SCALAR_FILTER_BYTES = 1 << 23


def _png_supported(parsed) -> bool:
    """Gate conditions over an already-parsed chunk walk — ONE
    implementation consumed by is_plain_png and decode_png_pixels so
    they can never disagree, with no redundant re-parse in the decode
    hot path."""
    if parsed is None:
        return False
    w, h, depth, color, interlace, _idat, plte = parsed
    return (
        depth in (8, 16) and color in _PNG_CHANNELS
        and interlace in (0, 1)
        and w > 0 and h > 0 and w * h <= _MAX_NATIVE_PIXELS
        and (color != 3 or (plte is not None and depth == 8))
    )


def is_plain_png(payload: bytes) -> bool:
    """True for a natively-decodable PNG: 8- or 16-bit grayscale / RGB
    / gray+alpha / RGBA plus 8-bit palette (the spec only defines
    palette at depths ≤ 8), sequential OR Adam7-interlaced,
    structurally complete chunk list (palette requires a PLTE chunk),
    header dims within _MAX_NATIVE_PIXELS.  Only sub-byte bit depths
    keep the loud codec stub — the gate answers 'will
    decode_png_pixels accept this container', exactly as is_plain_bmp
    does for BMP (corrupt DEFLATE data inside a structurally valid
    container is the one case only decompression can catch; decode
    raises ValueError there)."""
    return _png_supported(_png_parse(payload))


# Adam7 interlace passes (PNG spec §8.2, public): (x0, y0, dx, dy) —
# each pass is an independently-filtered scanline sequence over the
# subgrid it owns, concatenated in this order inside the IDAT stream.
_ADAM7 = [
    (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
    (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2),
]


def _png_unfilter(
    raw: bytes,
    n_rows: int,
    rowlen: int,
    bpp: int,
    pos: int = 0,
    scalar_budget: list | None = None,
):
    """Unfilter n_rows scanlines of rowlen data bytes starting at
    raw[pos] (each row = 1 filter-type byte + rowlen bytes;
    None/Sub/Up/Average/Paeth per PNG spec §9).  Returns
    ((n_rows, rowlen) uint8 array, next offset).  ONE implementation
    shared by the sequential path and every Adam7 pass — a pass is its
    own filtered sequence with its own row width and its own
    prior-row state.  scalar_budget (a 1-element mutable list, shared
    across all Adam7 passes of one image) meters the bytes the
    interpreted Average/Paeth loops may process; exhaustion raises
    ValueError so an adversarial all-Paeth image costs a bounded loop,
    not minutes of executor CPU (see _MAX_SCALAR_FILTER_BYTES)."""
    import numpy as np

    out = np.empty((n_rows, rowlen), dtype=np.uint8)
    prev = np.zeros(rowlen, dtype=np.uint8)
    for y in range(n_rows):
        if pos + 1 + rowlen > len(raw):
            raise ValueError("PNG pixel stream truncated")
        ftype = raw[pos]
        line = np.frombuffer(
            raw, dtype=np.uint8, count=rowlen, offset=pos + 1
        ).copy()
        pos += 1 + rowlen
        if ftype in (3, 4) and scalar_budget is not None:
            scalar_budget[0] -= rowlen
            if scalar_budget[0] < 0:
                raise ValueError(
                    "PNG scalar-filter CPU budget exceeded"
                )
        if ftype == 0:  # None
            cur = line
        elif ftype == 2:  # Up — vectorized; uint8 addition wraps mod 256
            cur = line + prev
        elif ftype == 1:  # Sub — per-channel prefix sum; uint8
            # accumulate wraps mod 256, exactly the spec's arithmetic
            cur = np.add.accumulate(
                line.reshape(-1, bpp), axis=0, dtype=np.uint8
            ).reshape(-1)
        elif ftype == 3:  # Average
            cur = line
            for x in range(rowlen):
                left = int(cur[x - bpp]) if x >= bpp else 0
                cur[x] = (int(line[x]) + (left + int(prev[x])) // 2) & 0xFF
        elif ftype == 4:  # Paeth
            cur = line
            for x in range(rowlen):
                a = int(cur[x - bpp]) if x >= bpp else 0
                b = int(prev[x])
                c = int(prev[x - bpp]) if x >= bpp else 0
                pa, pb, pc = abs(b - c), abs(a - c), abs(a + b - 2 * c)
                if pa <= pb and pa <= pc:
                    pred = a
                elif pb <= pc:
                    pred = b
                else:
                    pred = c
                cur[x] = (int(line[x]) + pred) & 0xFF
        else:
            raise ValueError(f"unknown PNG filter type {ftype}")
        out[y] = cur
        prev = out[y]
    return out, pos


def decode_png_pixels(payload: bytes, _parsed=None):
    """REAL PNG pixel decode with zero new dependencies (r12 VERDICT
    task 1): the IDAT stream is zlib-deflate, which the stdlib inflates;
    per-scanline unfiltering (_png_unfilter) reconstructs the raw
    samples — sequentially, or pass-by-pass through the Adam7 subgrids
    for interlaced images; palette images (type 3) resolve their index
    bytes through the PLTE chunk.  Returns an (h, w, channels) array —
    uint8 for 8-bit color types, uint16 for 16-bit ones (the filter
    arithmetic is byte-wise either way per PNG spec §9, only the
    left-neighbor distance bpp scales; samples are big-endian in the
    stream) — interlaced or not; raises ValueError otherwise
    (including corrupt DEFLATE data or a pixel-stream length mismatch
    — loud, never a silent fake)."""
    import zlib

    import numpy as np

    parsed = _png_parse(payload) if _parsed is None else _parsed
    if not _png_supported(parsed):
        raise ValueError("not a natively-decodable PNG")
    w, h, depth, color, interlace, idat, plte = parsed
    ch = _PNG_CHANNELS[color]
    bpp = ch * (depth // 8)  # filter left-distance, in BYTES
    rowlen = w * bpp
    # expected filtered-stream size follows from the (gate-bounded)
    # header dims — computed BEFORE inflating so the decompressor can be
    # hard-capped at it: a deflate bomb (KBs of IDAT inflating to GBs)
    # stops at expected+1 bytes and fails the exact-length check as a
    # ValueError, never as an executor-killing allocation
    if interlace == 0:
        pass_dims = [(w, h)]
    else:
        pass_dims = [
            (
                (w - x0 + dx - 1) // dx if w > x0 else 0,
                (h - y0 + dy - 1) // dy if h > y0 else 0,
            )
            for x0, y0, dx, dy in _ADAM7
        ]
    expected = sum(
        ph * (1 + pw * bpp) for pw, ph in pass_dims if pw and ph
    )
    try:
        dobj = zlib.decompressobj()
        raw = dobj.decompress(idat, expected + 1)
    except zlib.error as exc:
        raise ValueError(f"corrupt PNG pixel stream: {exc}") from exc
    # dobj.eof keeps the old zlib.decompress strictness: a stream
    # truncated inside its adler32 trailer inflates to the right size
    # but never reaches end-of-stream — still corrupt, still loud.
    # unused_data catches the mirror case: a COMPLETE zlib stream with
    # trailing garbage (or a second stream) appended inside IDAT.
    if (
        len(raw) != expected or dobj.unconsumed_tail or not dobj.eof
        or dobj.unused_data
    ):
        raise ValueError("PNG pixel stream length mismatch")
    scalar_budget = [_MAX_SCALAR_FILTER_BYTES]  # spans all passes

    def samples(byte_rows, n_rows, n_cols):
        # unfiltered BYTE rows → (n_rows, n_cols, ch) sample array:
        # 16-bit samples are big-endian pairs in the filtered stream
        if depth == 16:
            arr = byte_rows.reshape(n_rows, -1).view(">u2")
            return arr.astype(np.uint16).reshape(n_rows, n_cols, ch)
        return byte_rows.reshape(n_rows, n_cols, ch)

    if interlace == 0:
        out, _pos = _png_unfilter(
            raw, h, rowlen, bpp, scalar_budget=scalar_budget
        )
        px = samples(out, h, w)
    else:  # Adam7: 7 subgrid passes, each its own filtered sequence
        px = np.zeros(
            (h, w, ch), dtype=np.uint16 if depth == 16 else np.uint8
        )
        pos = 0
        for (x0, y0, dx, dy), (pw, ph) in zip(_ADAM7, pass_dims):
            if pw == 0 or ph == 0:
                continue
            block, pos = _png_unfilter(
                raw, ph, pw * bpp, bpp, pos, scalar_budget=scalar_budget
            )
            px[y0::dy, x0::dx, :] = samples(block, ph, pw)
        if pos != len(raw):
            raise ValueError("PNG pixel stream length mismatch")
    if color == 3:  # palette indices → RGB through PLTE (the GIF step)
        palette = np.frombuffer(plte, dtype=np.uint8).reshape(-1, 3)
        idx = px.reshape(h, w)
        if int(idx.max()) >= palette.shape[0]:
            raise ValueError("PNG palette index out of range")
        return palette[idx]  # (h, w, 3) uint8
    return px


def decode_png_image(payload: bytes, _parsed=None) -> list[float]:
    """decode_png_pixels → BT.601 integer luma (gray channel passes
    through for grayscale; alpha ignored) → the shared FEATURE_DIM
    column strip.  Same (list[float], FEATURE_DIM) contract and the
    same float64 algebra as decode_bmp_image, so a PNG and a BMP of
    identical pixels produce identical feature bits.  16-bit samples
    scale by 1/257 (= 255/65535 exactly, since 257·255 = 65535) before
    the shared strip, so a 16-bit image whose samples are v·257 — the
    spec's exact widening of an 8-bit v — produces bit-identical
    features to its 8-bit twin (the integer luma stays exact in int64,
    and the scale folds into one float64 division)."""
    raw_px = decode_png_pixels(payload, _parsed)
    sixteen = raw_px.dtype.itemsize == 2
    px = raw_px.astype("int64")
    scale = 257.0 if sixteen else 1.0
    if px.shape[2] >= 3:  # RGB / RGBA — PNG sample order is R,G,B
        luma = (
            299 * px[:, :, 0] + 587 * px[:, :, 1] + 114 * px[:, :, 2]
        ) / (1000.0 * scale)
    else:  # grayscale / gray+alpha
        luma = px[:, :, 0] / scale
    return _luma_strip(luma)


def _gif_first_frame(payload: bytes):
    """ONE structural walk shared by the gate (is_plain_gif) and the
    decoder (decode_gif_image): header + logical screen descriptor +
    optional global color table, skip extension blocks, stop at the
    FIRST image descriptor and collect its LZW data sub-blocks.
    Returns (frame_w, frame_h, palette_bytes, lzw_min_code_size,
    lzw_data, interlace_flag) — palette is the local color table when
    the frame carries one, else the global table (None if neither).
    None when the payload is not a structurally complete GIF frame
    (truncated sub-block chain, missing terminator, trailer before any
    image, …)."""
    p = payload
    if len(p) < 14 or p[:6] not in (b"GIF87a", b"GIF89a"):
        return None
    packed = p[10]
    i = 13
    gct = None
    if packed & 0x80:
        n = 3 * (2 << (packed & 0x7))
        if i + n > len(p):
            return None
        gct = p[i : i + n]
        i += n
    while i < len(p):
        b0 = p[i]
        if b0 == 0x21:  # extension: introducer, label, then sub-blocks
            i += 2
            while i < len(p) and p[i] != 0:
                i += 1 + p[i]
            if i >= len(p):
                return None
            i += 1  # block terminator
        elif b0 == 0x2C:  # image descriptor
            if i + 10 > len(p):
                return None
            fw = int.from_bytes(p[i + 5 : i + 7], "little")
            fh = int.from_bytes(p[i + 7 : i + 9], "little")
            fpacked = p[i + 9]
            i += 10
            pal = gct
            if fpacked & 0x80:  # local color table wins
                n = 3 * (2 << (fpacked & 0x7))
                if i + n > len(p):
                    return None
                pal = p[i : i + n]
                i += n
            if i >= len(p):
                return None
            mcs = p[i]
            i += 1
            chunks = []
            while i < len(p) and p[i] != 0:
                ln = p[i]
                if i + 1 + ln > len(p):
                    return None
                chunks.append(p[i + 1 : i + 1 + ln])
                i += 1 + ln
            if i >= len(p):
                return None  # missing sub-block terminator
            return (fw, fh, pal, mcs, b"".join(chunks), (fpacked >> 6) & 1)
        else:  # trailer (0x3B) or garbage before any image descriptor
            return None
    return None


def _gif_supported(f) -> bool:
    """Gate conditions over an already-parsed first frame — ONE
    implementation consumed by is_plain_gif and decode_gif_image
    (the _png_supported pattern).  The pixel cap bounds BOTH the LZW
    expansion buffer (a 4-byte descriptor claiming 65535×65535 would
    otherwise let a tiny looping stream expand to GBs) and the LZW
    loop's interpreter cost (~one iteration per emitted index byte) —
    hence the tighter _MAX_SCALAR_PIXELS rather than the
    allocation-only _MAX_NATIVE_PIXELS the vectorized decoders use."""
    if f is None:
        return False
    fw, fh, pal, mcs, data, _interlace = f
    return (
        fw > 0 and fh > 0 and fw * fh <= _MAX_SCALAR_PIXELS
        and pal is not None and len(pal) >= 6
        and 2 <= mcs <= 8 and len(data) > 0
    )


def is_plain_gif(payload: bytes) -> bool:
    """True for a natively-decodable GIF: 87a/89a, a color table (global
    or frame-local), a structurally complete first frame, LZW minimum
    code size in [2, 8], header dims within _MAX_SCALAR_PIXELS.
    Interlaced frames decode too (GIF interlace is a fixed 4-pass ROW
    permutation — rows 0,8,…; 4,12,…; 2,6,…; odd — applied after the
    LZW+palette steps); corrupt LZW data inside a valid container
    raises ValueError from the decoder, exactly like a corrupt PNG
    DEFLATE stream."""
    return _gif_supported(_gif_first_frame(payload))


def _gif_lzw_decode(min_code_size: int, data: bytes, n_expected: int) -> bytes:
    """GIF-variant LZW decode (public spec, GIF89a appendix F): variable
    code width starting at min_code_size+1, LSB-first bit packing, CLEAR
    resets the table, codes grow the table by one entry each until the
    12-bit ceiling.  Pure bytes→bytes (palette indices); stops after
    n_expected pixels.  Raises ValueError on codes outside the table —
    loud on corrupt data, same contract as the PNG/BMP decoders."""
    clear = 1 << min_code_size
    end = clear + 1
    base = [bytes([i]) for i in range(clear)] + [b"", b""]
    table = list(base)
    code_size = min_code_size + 1
    out = bytearray()
    prev = None
    acc = nbits = pos = 0
    while len(out) < n_expected:
        while nbits < code_size:
            if pos >= len(data):
                return bytes(out[:n_expected])  # stream ended early
            acc |= data[pos] << nbits
            pos += 1
            nbits += 8
        code = acc & ((1 << code_size) - 1)
        acc >>= code_size
        nbits -= code_size
        if code == end:
            break
        if code == clear:
            table = list(base)
            code_size = min_code_size + 1
            prev = None
            continue
        if code < len(table):  # end/clear were consumed above
            entry = table[code]
        elif code == len(table) and prev is not None:
            entry = prev + prev[:1]  # the KwKwK case
        else:
            raise ValueError(f"corrupt GIF LZW stream (code {code})")
        out += entry
        if prev is not None and len(table) < 4096:
            table.append(prev + entry[:1])
            if len(table) == (1 << code_size) and code_size < 12:
                code_size += 1
        prev = entry
    return bytes(out[:n_expected])


def decode_gif_image(payload: bytes, _frame=None) -> list[float]:
    """REAL GIF pixel decode with zero new dependencies (r12 VERDICT
    task 6): stdlib-free LZW over the first frame's data sub-blocks,
    indexed pixels resolved through the (global or local) color table,
    then BT.601 luma and the shared FEATURE_DIM strip.  Same float64
    algebra as decode_bmp_image/decode_png_image, so identical pixels
    in any of the three formats give identical feature bits."""
    import numpy as np

    f = _gif_first_frame(payload) if _frame is None else _frame
    if not _gif_supported(f):
        raise ValueError("not a natively-decodable GIF")
    fw, fh, pal, mcs, data, interlace = f
    idx_bytes = _gif_lzw_decode(mcs, data, fw * fh)
    if len(idx_bytes) < fw * fh:
        raise ValueError("GIF pixel stream truncated")
    palette = (
        np.frombuffer(pal, dtype=np.uint8)
        .reshape(-1, 3)
        .astype(np.int64)
    )
    idx = np.frombuffer(idx_bytes, dtype=np.uint8).astype(np.int64)
    if int(idx.max()) >= palette.shape[0]:
        raise ValueError("GIF palette index out of range")
    px = palette[idx].reshape(fh, fw, 3)  # palette entries are R,G,B
    if interlace:  # stored row i is image row order[i] — scatter back
        order = [
            r
            for start, step in ((0, 8), (4, 8), (2, 4), (1, 2))
            for r in range(start, fh, step)
        ]
        img = np.empty_like(px)
        img[order] = px
        px = img
    luma = (
        299 * px[:, :, 0] + 587 * px[:, :, 1] + 114 * px[:, :, 2]
    ) / 1000.0
    return _luma_strip(luma)


# ---------------------------------------------------------------------------
# JPEG — baseline sequential JFIF, decoded from the public spec
# (ITU-T T.81 / ISO 10918-1: huffman entropy decode §F.2, DC extend
# §F.2.2.1, zigzag §A.3.6, IDCT §A.3.3) with stdlib + numpy only, the
# r13 VERDICT's top next-round item.  Same architecture as the
# PNG/GIF/WAV decoders: ONE structural parse (_jpeg_parse) consumed by
# the gate (is_plain_jpeg) and the decoder (decode_jpeg_pixels), so
# the two can never disagree; corrupt entropy data inside a valid
# container raises ValueError (loud → pipeline fake); progressive /
# arithmetic / 12-bit / multi-scan JPEGs fail the GATE and keep the
# loud codec stub.  Only the luma (Y) plane is reconstructed — Y in
# JFIF IS BT.601 luma, exactly the quantity every other decoder feeds
# _luma_strip — but every component's blocks are entropy-decoded to
# advance the bitstream correctly.

# zigzag scan position k → natural (row-major) coefficient index
_JPEG_ZIGZAG = (
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
)


def _jpeg_parse(payload: bytes):
    """ONE marker-segment walk shared by gate and decoder: collects
    quantization tables (zigzag order), huffman tables, the frame
    header, the (single) scan header, the restart interval, and the
    raw entropy-coded bytes (restart markers kept in-stream for the
    bit reader).  Returns a dict, or None when the payload is not a
    structurally complete single-scan JPEG (truncated segment, missing
    SOS/EOI, malformed table lengths, …)."""
    p = payload
    n = len(p)
    if n < 4 or p[:2] != b"\xff\xd8":
        return None
    qt: dict[int, tuple] = {}
    qt16 = False
    huff: dict[tuple, tuple] = {}
    sof = None
    scan = None
    dri = 0
    data = None
    eoi = False
    i = 2
    while i + 4 <= n:
        if p[i] != 0xFF:
            return None
        marker = p[i + 1]
        if marker == 0xFF:  # fill byte before a marker
            i += 1
            continue
        if marker == 0xD9:  # EOI before any scan: structurally short
            break
        seg_len = int.from_bytes(p[i + 2 : i + 4], "big")
        if seg_len < 2 or i + 2 + seg_len > n:
            return None
        body = p[i + 4 : i + 2 + seg_len]
        if marker == 0xDB:  # DQT — one or more tables per segment
            j = 0
            while j < len(body):
                pq, tq = body[j] >> 4, body[j] & 15
                size = 64 if pq == 0 else 128
                if j + 1 + size > len(body):
                    return None
                if pq == 0:
                    qt[tq] = tuple(body[j + 1 : j + 65])
                else:  # 16-bit table: illegal in baseline; gate flags
                    qt16 = True
                j += 1 + size
        elif marker == 0xC4:  # DHT — one or more tables per segment
            j = 0
            while j + 17 <= len(body):
                tc, th = body[j] >> 4, body[j] & 15
                counts = body[j + 1 : j + 17]
                nv = sum(counts)
                if j + 17 + nv > len(body):
                    return None
                huff[(tc, th)] = (
                    bytes(counts),
                    bytes(body[j + 17 : j + 17 + nv]),
                )
                j += 17 + nv
            if j != len(body):
                return None
        elif marker in _SOF_MARKERS:
            if sof is not None or len(body) < 6:
                return None
            nc = body[5]
            if len(body) != 6 + 3 * nc:
                return None
            comps = [
                (
                    body[6 + 3 * c],
                    body[7 + 3 * c] >> 4,
                    body[7 + 3 * c] & 15,
                    body[8 + 3 * c],
                )
                for c in range(nc)
            ]
            sof = (
                marker,
                body[0],
                int.from_bytes(body[1:3], "big"),
                int.from_bytes(body[3:5], "big"),
                comps,
            )
        elif marker == 0xDD:  # DRI
            if len(body) != 2:
                return None
            dri = int.from_bytes(body, "big")
        elif marker == 0xDA:  # SOS — entropy-coded data follows
            if len(body) < 4:
                return None
            ns = body[0]
            if len(body) != 1 + 2 * ns + 3:
                return None
            scomps = [
                (
                    body[1 + 2 * c],
                    body[2 + 2 * c] >> 4,
                    body[2 + 2 * c] & 15,
                )
                for c in range(ns)
            ]
            scan = (
                scomps,
                body[1 + 2 * ns],
                body[2 + 2 * ns],
                body[3 + 2 * ns] >> 4,
                body[3 + 2 * ns] & 15,
            )
            j = i + 2 + seg_len
            start = j
            # the entropy segment runs to the first marker that is not
            # byte-stuffing (FF00) or a restart (FFD0-FFD7)
            while j + 1 < n:
                if (
                    p[j] == 0xFF
                    and p[j + 1] != 0x00
                    and not (0xD0 <= p[j + 1] <= 0xD7)
                ):
                    break
                j += 1
            data = p[start:j]
            eoi = j + 1 < n and p[j + 1] == 0xD9
            break  # single-scan only; the gate enforces it via eoi
        # APPn / COM / other tables: skip
        i += 2 + seg_len
    if sof is None or scan is None or data is None:
        return None
    return {
        "marker": sof[0],
        "precision": sof[1],
        "h": sof[2],
        "w": sof[3],
        "comps": sof[4],
        "qt": qt,
        "qt16": qt16,
        "huff": huff,
        "scan": scan,
        "dri": dri,
        "data": data,
        "eoi": eoi,
    }


def _jpeg_supported(j) -> bool:
    """Gate over an already-parsed segment walk: baseline sequential
    huffman only (SOF0, 8-bit precision, 8-bit quant tables), 1 or 3
    components, sampling factors in {1, 2} with the first (luma)
    component at full resolution, one interleaved scan covering every
    component with Ss/Se/Ah/Al = 0/63/0/0, all referenced quant +
    huffman tables present, EOI reached, dims within
    _MAX_SCALAR_PIXELS (huffman decode is an interpreted per-symbol
    loop — the CPU-cost cap, like the GIF LZW gate).  Everything else
    — progressive (SOF2), arithmetic (SOF9+), 12-bit, multi-scan,
    hierarchical — keeps the loud codec stub."""
    if j is None or j["marker"] != 0xC0 or j["precision"] != 8 or j["qt16"]:
        return False
    w, h, comps = j["w"], j["h"], j["comps"]
    if not (0 < w and 0 < h and w * h <= _MAX_SCALAR_PIXELS):
        return False
    if len(comps) not in (1, 3) or not j["eoi"] or not j["data"]:
        return False
    if any(
        not (1 <= hs <= 2 and 1 <= vs <= 2) for _, hs, vs, _ in comps
    ):
        return False
    max_h = max(hs for _, hs, _, _ in comps)
    max_v = max(vs for _, _, vs, _ in comps)
    if comps[0][1] != max_h or comps[0][2] != max_v:
        return False
    if len(comps) == 1 and (max_h, max_v) != (1, 1):
        return False
    if any(tq not in j["qt"] for _, _, _, tq in comps):
        return False
    scomps, ss, se, ah, al = j["scan"]
    if (ss, se, ah, al) != (0, 63, 0, 0):
        return False
    if [cid for cid, _, _ in scomps] != [c[0] for c in comps]:
        return False
    return all(
        (0, td) in j["huff"] and (1, ta) in j["huff"]
        for _, td, ta in scomps
    )


def is_plain_jpeg(payload: bytes) -> bool:
    """True for a natively-decodable JPEG: baseline sequential huffman
    (SOF0), 8-bit, 1 or 3 components, sampling factors ≤ 2 with
    full-resolution luma, single interleaved scan, complete through
    EOI, dims within _MAX_SCALAR_PIXELS.  Same parse as the decoder by
    construction; corrupt entropy data inside a passing container
    raises ValueError from the decoder, exactly like a corrupt PNG
    DEFLATE stream."""
    return _jpeg_supported(_jpeg_parse(payload))


def _jpeg_huff_lut(counts: bytes, values: bytes) -> dict:
    """(BITS, HUFFVAL) → {(code_length, code): symbol}, the canonical
    code assignment of spec §C.2 (codes of each length count up from
    twice the previous length's ceiling)."""
    lut = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(counts[length - 1]):
            lut[(length, code)] = values[k]
            code += 1
            k += 1
        code <<= 1
    return lut


class _JpegBits:
    """MSB-first bit reader over the entropy-coded segment: un-stuffs
    FF00, treats any other in-stream marker as corruption, and resets
    to a byte boundary at expected restart markers."""

    __slots__ = ("d", "i", "acc", "n")

    def __init__(self, data: bytes):
        self.d = data
        self.i = 0
        self.acc = 0
        self.n = 0

    def _fill(self) -> None:
        d, i = self.d, self.i
        if i >= len(d):
            raise ValueError("JPEG entropy stream truncated")
        b = d[i]
        i += 1
        if b == 0xFF:
            if i >= len(d) or d[i] != 0x00:
                # a real marker where bits were expected: either a
                # restart arriving off-schedule or garbage
                raise ValueError("JPEG marker inside entropy data")
            i += 1  # stuffed zero byte
        self.i = i
        self.acc = (self.acc << 8) | b
        self.n += 8

    def bit(self) -> int:
        if self.n == 0:
            self._fill()
        self.n -= 1
        return (self.acc >> self.n) & 1

    def bits(self, cnt: int) -> int:
        v = 0
        for _ in range(cnt):
            v = (v << 1) | self.bit()
        return v

    def restart(self, idx: int) -> None:
        # discard pad bits to the byte boundary, then consume RST(idx)
        self.acc = 0
        self.n = 0
        d, i = self.d, self.i
        if i + 2 > len(d) or d[i] != 0xFF or d[i + 1] != 0xD0 + (idx & 7):
            raise ValueError("JPEG restart marker missing or mismatched")
        self.i = i + 2


def _jpeg_decode_sym(bits: _JpegBits, lut: dict) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | bits.bit()
        v = lut.get((length, code))
        if v is not None:
            return v
    raise ValueError("corrupt JPEG huffman stream")


def _jpeg_extend(v: int, s: int) -> int:
    # spec §F.2.2.1: s-bit magnitude v → signed coefficient
    return v - (1 << s) + 1 if v < (1 << (s - 1)) else v


def _jpeg_block(bits: _JpegBits, dclut: dict, aclut: dict, pred: int):
    """Decode one 8×8 block: DC diff + AC run-length pairs, returning
    (64 natural-order coefficients, new DC predictor)."""
    coef = [0] * 64
    s = _jpeg_decode_sym(bits, dclut)
    if s:
        if s > 11:
            raise ValueError("corrupt JPEG DC category")
        pred += _jpeg_extend(bits.bits(s), s)
    coef[0] = pred
    k = 1
    while k < 64:
        rs = _jpeg_decode_sym(bits, aclut)
        r, s = rs >> 4, rs & 15
        if s == 0:
            if r == 15:  # ZRL: sixteen zeros
                k += 16
                continue
            break  # EOB
        k += r
        if k > 63:
            raise ValueError("corrupt JPEG AC run")
        coef[_JPEG_ZIGZAG[k]] = _jpeg_extend(bits.bits(s), s)
        k += 1
    return coef, pred


def decode_jpeg_pixels(payload: bytes, _parsed=None):
    """REAL baseline-JPEG luma decode with zero new dependencies:
    huffman entropy decode per MCU (every component's blocks, so the
    bitstream stays in sync), DC-predictor restart handling, then for
    the luma component only: dequantize → vectorized float64 IDCT
    (one einsum over all blocks — the per-pixel math never touches the
    interpreter) → level shift → clip.  Returns the (h, w) uint8 luma
    plane; raises ValueError on corrupt entropy data (loud, never a
    silent fake).  Fixed float64 operation order, so driver and
    executors agree bit-for-bit."""
    import numpy as np

    j = _jpeg_parse(payload) if _parsed is None else _parsed
    if not _jpeg_supported(j):
        raise ValueError("not a natively-decodable JPEG")
    w, h, comps = j["w"], j["h"], j["comps"]
    max_h = max(c[1] for c in comps)
    max_v = max(c[2] for c in comps)
    scomps = j["scan"][0]
    luts = {
        cid: (
            _jpeg_huff_lut(*j["huff"][(0, td)]),
            _jpeg_huff_lut(*j["huff"][(1, ta)]),
        )
        for cid, td, ta in scomps
    }
    mcux = -(-w // (8 * max_h))
    mcuy = -(-h // (8 * max_v))
    y_cid, hy, vy, tq_y = comps[0]
    by_cols = mcux * hy
    by_rows = mcuy * vy
    ycoef = np.zeros((by_rows * by_cols, 64), dtype=np.int32)
    preds = dict.fromkeys(luts, 0)
    bits = _JpegBits(j["data"])
    dri = j["dri"]
    rst = 0
    for m in range(mcux * mcuy):
        if dri and m and m % dri == 0:
            bits.restart(rst)
            rst = (rst + 1) & 7
            preds = dict.fromkeys(preds, 0)
        my, mx = divmod(m, mcux)
        for cid, hs, vs, _tq in comps:
            dclut, aclut = luts[cid]
            for b in range(hs * vs):
                coef, preds[cid] = _jpeg_block(
                    bits, dclut, aclut, preds[cid]
                )
                if cid == y_cid:
                    bby, bbx = divmod(b, hs)
                    ycoef[
                        (my * vy + bby) * by_cols + mx * hy + bbx
                    ] = coef
    # dequantize luma: zigzag-order table → natural-order 8×8
    q_nat = np.zeros(64, dtype=np.float64)
    qtab = j["qt"][tq_y]
    for k in range(64):
        q_nat[_JPEG_ZIGZAG[k]] = qtab[k]
    blocks = ycoef.reshape(-1, 8, 8).astype(np.float64) * q_nat.reshape(
        8, 8
    )
    # orthonormal DCT-II basis: A[k, n] = c(k)/2 · cos((2n+1)kπ/16);
    # inverse transform P = Aᵀ C A, batched over every block at once
    k_idx = np.arange(8, dtype=np.float64)
    A = 0.5 * np.cos((2.0 * k_idx[None, :] + 1.0) * k_idx[:, None] * np.pi / 16.0)
    A[0, :] /= np.sqrt(2.0)
    px = np.einsum("kn,bkl,lm->bnm", A, blocks, A)
    px = np.clip(np.round(px + 128.0), 0.0, 255.0).astype(np.uint8)
    plane = (
        px.reshape(by_rows, by_cols, 8, 8)
        .transpose(0, 2, 1, 3)
        .reshape(by_rows * 8, by_cols * 8)
    )
    return plane[:h, :w]


def decode_jpeg_image(payload: bytes, _parsed=None) -> list[float]:
    """decode_jpeg_pixels → the shared FEATURE_DIM strip.  JFIF Y IS
    the BT.601 luma every other native decoder computes from RGB, so
    the feature contract is identical; JPEG being lossy, the
    cross-format guarantee is determinism (driver ≡ executor bits),
    not pixel equality with a PNG twin."""
    plane = decode_jpeg_pixels(payload, _parsed)
    return _luma_strip(plane.astype("float64"))


def native_image_decode(payload: bytes) -> list[float] | None:
    """Single dispatch for every dependency-free REAL pixel decoder
    (BMP → PNG → GIF, cheapest structural gate first).  Returns the
    feature strip when the payload is a complete instance of a natively
    decodable format, None when no native decoder claims it.  A gated
    payload whose compressed stream is corrupt raises ValueError — the
    pipeline caller (extract_features) maps that to the deterministic
    fake, the loud path (decode_image) lets it propagate.  Each
    container is structurally parsed ONCE — the gate runs on the parse
    result and the decoder receives it, so the hot path never re-walks
    chunk lists or re-joins multi-MB IDAT/LZW streams."""
    if is_plain_bmp(payload):  # O(1) header-field gate, no stream copy
        return decode_bmp_image(payload)
    parsed = _png_parse(payload)
    if _png_supported(parsed):
        return decode_png_image(payload, parsed)
    frame = _gif_first_frame(payload)
    if _gif_supported(frame):
        return decode_gif_image(payload, frame)
    if payload[:2] == b"\xff\xd8":  # 2-byte magic before the full walk
        jp = _jpeg_parse(payload)
        if _jpeg_supported(jp):
            return decode_jpeg_image(payload, jp)
    return None


def decode_image(payload: bytes) -> list[float]:
    """Real decode path: native struct/numpy/zlib decode for BMP, any
    8/16-bit PNG (gray/RGB/palette/alpha, Adam7 included), any GIF,
    and baseline sequential JPEG (always available — see
    decode_bmp_image / decode_png_image / decode_gif_image /
    decode_jpeg_image), Pillow for the remaining formats (progressive
    / arithmetic / 12-bit JPEG, sub-byte PNG depths); all
    downsample to a FEATURE_DIM grayscale strip of normalized
    intensities — the same (list[float], FEATURE_DIM) contract as
    fake_decode_image, so the mapInPandas plumbing is byte-identical
    either way.  Raises NotImplementedError for codec-needing formats
    when no codec library is installed (this container), ValueError on
    corrupt native-format data; fake_decode_image is the deterministic
    stand-in."""
    native = native_image_decode(payload)
    if native is not None:
        return native
    try:
        import PIL.Image
    except ImportError as exc:  # pragma: no cover - env without Pillow
        raise NotImplementedError(
            "progressive/arithmetic/12-bit JPEG and sub-byte PNG "
            "depths require a codec library (e.g. Pillow); BMP + any "
            "8/16-bit PNG + any GIF + baseline JPEG decode natively, "
            "and fake_decode_image covers plumbing tests"
        ) from exc
    import io

    img = PIL.Image.open(io.BytesIO(payload)).convert("L").resize(
        (FEATURE_DIM, 1)
    )
    return [px / 255.0 for px in list(img.getdata())[:FEATURE_DIM]]


def fake_decode_image(payload: bytes) -> list[float]:
    """Deterministic stand-in for decode+embed: derive FEATURE_DIM floats
    from the payload's md5.  Stable across processes/engines, so tests can
    assert exact values through the whole distributed pipeline."""
    digest = hashlib.md5(payload).digest()
    return [digest[i] / 255.0 for i in range(FEATURE_DIM)]


def extract_features(
    media: DataFrame, *, use_real_decoder: bool | None = None
) -> DataFrame:
    """media table → per-item features via mapInPandas (Arrow batches in,
    Arrow batches out; no per-row Python overhead).  Partition-parallel:
    no shuffle — feature extraction is embarrassingly parallel at 100 TB
    as long as payloads are stored splittable (one file per shard).

    use_real_decoder=None (the default) auto-detects per worker: real
    Pillow decode where the codec is installed, the deterministic fake
    elsewhere — EXCEPT BMP / plain PNG / plain GIF, which decode
    natively (real pixels) in any environment — so the same pipeline
    code runs in this codec-less container AND on a production image
    with Pillow baked in.  A payload that passes a native gate but
    carries a corrupt compressed stream falls back to the deterministic
    fake rather than failing the job — at 100 TB one bad file must not
    kill the stage, and the md5-fake is already the documented stand-in
    for undecodable payloads.  Pass True/False to force a branch (tests
    pin both; False forces the fake even for natively-decodable
    formats)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        real = (
            real_decoder_available()
            if use_real_decoder is None
            else use_real_decoder
        )
        for pdf in batches:
            payloads = pdf["payload"]
            feats = []
            for p in payloads:
                raw = bytes(p) if p is not None else b""
                feat = None
                if use_real_decoder is not False:
                    try:
                        feat = native_image_decode(raw)
                    except ValueError:
                        # a native gate CLAIMED the payload but its
                        # compressed stream is corrupt → deterministic
                        # fake, unconditionally — routing it onward to
                        # decode_image would just re-raise the same
                        # error inside the stage
                        feat = fake_decode_image(raw)
                if feat is None:
                    feat = decode_image(raw) if real else fake_decode_image(raw)
                feats.append(feat)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "payload_md5": [
                        hashlib.md5(bytes(p) if p is not None else b"").hexdigest()
                        for p in payloads
                    ],
                    "payload_bytes": [
                        len(bytes(p)) if p is not None else 0 for p in payloads
                    ],
                    "feature": feats,
                }
            )

    return media.mapInPandas(run, schema=FEATURE_SCHEMA)


def frame_sample_plan(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling *plan*: one output row per sampled frame
    timestamp (the decode of each frame is the stubbed step).  Shows the
    1-row → N-rows generator shape on binary media columns."""
    n_frames = (F.col("duration_ms") / every_ms).cast("long")
    return (
        media.filter(F.col("kind") == "video")
        .select(
            "media_id",
            F.explode(
                F.sequence(F.lit(0), F.greatest(n_frames - 1, F.lit(0)))
            ).alias("frame_idx"),
        )
        .withColumn("frame_ts_ms", F.col("frame_idx") * every_ms)
    )


def read_binary_dir(spark, path: str) -> DataFrame:
    """Directory of media files → (path, modificationTime, length, content)
    via Spark's binaryFile source — the pointers-in-table, bytes-in-store
    layout the reference uses for CSVs, generalized to media."""
    return spark.read.format("binaryFile").load(path)


AUDIO_RMS_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("window_idx", T.LongType(), True),
        T.StructField("n_samples", T.LongType(), True),
        T.StructField("rms", T.DoubleType(), True),
    ]
)


def _wav_pcm_chunks(payload: bytes):
    """ONE RIFF chunk walk shared by the gate (is_plain_wav_pcm) and the
    decoder (decode_wav_samples), so the two can never disagree on
    malformed payloads (r12 ADVICE): returns
    ((audio_format, channels, bits), data_start, data_len) for the LAST
    fmt chunk seen before the FIRST data chunk, or None when there is
    no complete data chunk / no RIFF-WAVE framing / no fmt chunk before
    data.  Honors the word-alignment pad byte on odd chunk lengths."""
    p = payload
    if len(p) < 12 or p[:4] != b"RIFF" or p[8:12] != b"WAVE":
        return None
    fmt = None
    i = 12
    while i + 8 <= len(p):
        cid = p[i : i + 4]
        clen = int.from_bytes(p[i + 4 : i + 8], "little")
        if cid == b"fmt ":
            # a fmt chunk shorter than the 16-byte PCM layout cannot
            # carry the fields read below — reading them anyway would
            # misinterpret the NEXT chunk's header bytes as format
            # fields (r13 ADVICE); malformed fmt rejects the payload
            if clen < 16 or i + 24 > len(p):
                return None
            fmt = (
                int.from_bytes(p[i + 8 : i + 10], "little"),
                int.from_bytes(p[i + 10 : i + 12], "little") or 1,
                int.from_bytes(p[i + 22 : i + 24], "little"),
            )
        elif cid == b"data":
            if fmt is None or i + 8 + clen > len(p):
                return None
            return (fmt, i + 8, clen)
        i += 8 + clen + (clen & 1)
    return None


def _wav_supported(parsed) -> bool:
    """Gate conditions over an already-walked chunk list — consumed by
    both is_plain_wav_pcm and decode_wav_samples (no re-walk in the
    decode hot path)."""
    if parsed is None:
        return False
    (audio_format, _chans, bits), _start, _len = parsed
    return audio_format == 1 and bits in (8, 16)


def is_plain_wav_pcm(payload: bytes) -> bool:
    """True for a RIFF/WAVE container with an integer-PCM fmt chunk
    (format code 1, 8 or 16 bits) and a fully-present data chunk — the
    audio twin of is_plain_bmp: raw samples behind a fixed header, no
    codec needed.  Same chunk walk as the decoder by construction."""
    return _wav_supported(_wav_pcm_chunks(payload))


def decode_wav_samples(payload: bytes, _parsed=None):
    """REAL PCM decode for integer-PCM WAV — no codec library: the
    shared RIFF walk (_wav_pcm_chunks) locates fmt and data, numpy
    reads the sample frames (u8 or <i2), normalizes to [-1, 1]
    (8-bit: (s-128)/128; 16-bit: s/32768), and downmixes channels by
    mean.  Returns a float64 mono waveform; float64 with a fixed
    reduction order, so driver and executors agree bit-for-bit (the
    ddl round-trip relies on that)."""
    import numpy as np

    parsed = _wav_pcm_chunks(payload) if _parsed is None else _parsed
    if not _wav_supported(parsed):
        raise ValueError("not an integer-PCM WAV")
    (_fmt, chans, bits), start, clen = parsed
    raw = payload[start : start + clen]
    if bits == 8:
        s = np.frombuffer(raw, dtype=np.uint8).astype(np.float64)
        s = (s - 128.0) / 128.0
    else:
        n = len(raw) // 2
        s = np.frombuffer(raw, dtype="<i2", count=n).astype(np.float64) / 32768.0
    n_frames = len(s) // chans
    return s[: n_frames * chans].reshape(n_frames, chans).mean(axis=1)


def audio_rms_windows(
    media: DataFrame, samples_per_window: int = 256
) -> DataFrame:
    """Audio feature extraction: windowed RMS over the decoded waveform —
    the 1-payload → N-feature-rows generator shape for audio.

    Integer-PCM WAV payloads are decoded FOR REAL (decode_wav_samples:
    RIFF chunk walk + numpy sample read + channel downmix — no codec
    library exists or is needed for PCM).  Other payloads keep the
    stubbed interpretation — bytes as unsigned 8-bit samples — which
    keeps the pipeline deterministic and exactly testable while
    compressed-audio decode awaits a codec lib (soundfile/ffmpeg, one
    line to swap in).  Partition-parallel, no shuffle — linear at
    100 TB."""
    import numpy as np

    def rms(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_id, out_w, out_n, out_rms = [], [], [], []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                raw = bytes(payload) if payload is not None else b""
                parsed = _wav_pcm_chunks(raw)  # one walk: gate + decode
                if _wav_supported(parsed):
                    wave = decode_wav_samples(raw, parsed)
                else:
                    wave = np.frombuffer(raw, dtype=np.uint8).astype(
                        np.float64
                    )
                for w in range(0, max(len(wave), 1), samples_per_window):
                    chunk = wave[w : w + samples_per_window]
                    out_id.append(int(mid))
                    out_w.append(w // samples_per_window)
                    out_n.append(len(chunk))
                    out_rms.append(
                        float(np.sqrt(np.mean(chunk**2))) if len(chunk) else 0.0
                    )
            yield pd.DataFrame(
                {
                    "media_id": out_id,
                    "window_idx": out_w,
                    "n_samples": out_n,
                    "rms": out_rms,
                }
            )

    return media.filter(F.col("kind") == "audio").mapInPandas(
        rms, schema=AUDIO_RMS_SCHEMA
    )


IMAGE_META_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("format", T.StringType(), True),
        T.StructField("px_width", T.IntegerType(), True),
        T.StructField("px_height", T.IntegerType(), True),
    ]
)

_SOF_MARKERS = {0xC0, 0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF}


def sniff_image_meta(payload: bytes) -> tuple[str | None, int | None, int | None]:
    """REAL header decode — format sniff + pixel dimensions straight from
    the container bytes (PNG IHDR, GIF logical screen, BMP info header,
    JPEG SOF scan).  No codec library involved: dimensions live in fixed
    header fields, so this is pure byte arithmetic and runs at full Arrow
    batch speed.  Pixel DATA decode remains the stubbed step
    (decode_image); header metadata does not need it.
    Returns (format, width, height), Nones when unrecognized/truncated.
    """
    p = payload
    if len(p) >= 24 and p[:8] == b"\x89PNG\r\n\x1a\n":
        return (
            "png",
            int.from_bytes(p[16:20], "big"),
            int.from_bytes(p[20:24], "big"),
        )
    if len(p) >= 10 and p[:6] in (b"GIF87a", b"GIF89a"):
        return (
            "gif",
            int.from_bytes(p[6:8], "little"),
            int.from_bytes(p[8:10], "little"),
        )
    if len(p) >= 26 and p[:2] == b"BM":
        return (
            "bmp",
            int.from_bytes(p[18:22], "little", signed=True),
            abs(int.from_bytes(p[22:26], "little", signed=True)),
        )
    if len(p) >= 4 and p[:2] == b"\xff\xd8":
        # JPEG: walk segments to the first start-of-frame marker
        i = 2
        while i + 9 < len(p):
            if p[i] != 0xFF:
                break
            marker = p[i + 1]
            if marker in _SOF_MARKERS:
                return (
                    "jpeg",
                    int.from_bytes(p[i + 7 : i + 9], "big"),
                    int.from_bytes(p[i + 5 : i + 7], "big"),
                )
            seg_len = int.from_bytes(p[i + 2 : i + 4], "big")
            i += 2 + seg_len
        return ("jpeg", None, None)
    return (None, None, None)


def image_dims(media: DataFrame) -> DataFrame:
    """Per-image format + pixel dimensions via mapInPandas over the binary
    payload column — the real (non-stub) metadata-extraction pass.
    Partition-parallel, no shuffle, Arrow-batched: linear at 100 TB."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            fmts, ws, hs = [], [], []
            for payload in pdf["payload"]:
                fmt, w, h = sniff_image_meta(
                    bytes(payload) if payload is not None else b""
                )
                fmts.append(fmt)
                ws.append(w)
                hs.append(h)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "format": fmts,
                    "px_width": pd.array(ws, dtype="Int32"),
                    "px_height": pd.array(hs, dtype="Int32"),
                }
            )

    return media.filter(F.col("kind") == "image").mapInPandas(
        run, schema=IMAGE_META_SCHEMA
    )


# ---------------------------------------------------------------------------
# Audio (WAV/RIFF) header decode — the audio twin of sniff_image_meta
# ---------------------------------------------------------------------------

AUDIO_META_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("format", T.StringType(), True),
        T.StructField("sample_rate", T.IntegerType(), True),
        T.StructField("channels", T.IntegerType(), True),
        T.StructField("bits_per_sample", T.IntegerType(), True),
        T.StructField("n_frames", T.LongType(), True),
        T.StructField("duration_ms", T.LongType(), True),
    ]
)


def sniff_wav_meta(
    payload: bytes,
) -> tuple[str | None, int | None, int | None, int | None, int | None, int | None]:
    """REAL WAV header decode: walk the RIFF chunk list to the fmt and
    data chunks and read sample rate, channel count, bit depth, frame
    count, and duration — fixed-offset little-endian fields, no codec
    library (the same byte-arithmetic discipline as sniff_image_meta;
    PCM sample decode stays stubbed).  Chunk walking matters: tools
    commonly insert LIST/INFO chunks before data, so fixed offsets past
    the fmt chunk are wrong on real files.
    Returns (format, sample_rate, channels, bits, n_frames, duration_ms).
    """
    p = payload
    none6 = (None, None, None, None, None, None)
    if len(p) < 12 or p[:4] != b"RIFF" or p[8:12] != b"WAVE":
        return none6
    rate = chans = bits = None
    data_len = None
    i = 12
    while i + 8 <= len(p):
        cid = p[i : i + 4]
        clen = int.from_bytes(p[i + 4 : i + 8], "little")
        if cid == b"fmt " and i + 24 <= len(p):
            chans = int.from_bytes(p[i + 10 : i + 12], "little")
            rate = int.from_bytes(p[i + 12 : i + 16], "little")
            bits = int.from_bytes(p[i + 22 : i + 24], "little")
        elif cid == b"data":
            data_len = clen
        # chunks are word-aligned: odd lengths carry a pad byte
        i += 8 + clen + (clen & 1)
    if rate is None:
        return ("wav", None, None, None, None, None)
    frame_bytes = (chans or 1) * ((bits or 8) // 8)
    n_frames = data_len // frame_bytes if data_len is not None and frame_bytes else None
    duration_ms = (n_frames * 1000) // rate if n_frames is not None and rate else None
    return ("wav", rate, chans, bits, n_frames, duration_ms)


# MPEG1 Layer III constants (ISO/IEC 11172-3, public): bitrate table
# index 1..14 in kbps, sample-rate table index 0..2.
_MP3_BITRATES = (
    None, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320,
)
_MP3_RATES = (44100, 48000, 32000)


def sniff_flac_meta(
    payload: bytes,
) -> tuple[str | None, int | None, int | None, int | None, int | None, int | None]:
    """REAL FLAC STREAMINFO decode (format spec is public): after the
    fLaC magic, walk the metadata-block list (1-byte header: last-flag
    bit + 7-bit type; 3-byte big-endian length) to the type-0
    STREAMINFO block and unpack the bit-packed fields — sample rate
    (20 bits), channels-1 (3 bits), bits-per-sample-1 (5 bits), total
    samples (36 bits).  Same 6-tuple contract as sniff_wav_meta; audio
    sample decode stays stubbed, exactly like pixel decode."""
    p = payload
    none6 = (None, None, None, None, None, None)
    if len(p) < 4 or p[:4] != b"fLaC":
        return none6
    i = 4
    while i + 4 <= len(p):
        hdr = p[i]
        blen = int.from_bytes(p[i + 1 : i + 4], "big")
        if (hdr & 0x7F) == 0 and i + 4 + 34 <= len(p) and blen >= 34:
            b = p[i + 4 : i + 4 + 34]
            sr = (b[10] << 12) | (b[11] << 4) | (b[12] >> 4)
            ch = ((b[12] >> 1) & 0x7) + 1
            bps = (((b[12] & 1) << 4) | (b[13] >> 4)) + 1
            total = ((b[13] & 0xF) << 32) | int.from_bytes(
                b[14:18], "big"
            )
            dur = (total * 1000) // sr if sr else None
            return ("flac", sr, ch, bps, total, dur)
        if hdr & 0x80:  # last-metadata-block flag
            break
        i += 4 + blen
    return ("flac", None, None, None, None, None)


def sniff_mp3_meta(
    payload: bytes,
) -> tuple[str | None, int | None, int | None, int | None, int | None, int | None]:
    """REAL MP3 frame-header decode (MPEG1 Layer III, the standard
    case): skip an ID3v2 tag if present (syncsafe 28-bit size), find
    the 11-bit frame sync, and read sample rate, channel mode, and the
    bitrate index; frame count and duration follow from the CBR frame
    length 144·bitrate/rate (+padding) over the audio byte span —
    byte arithmetic only, no codec.  bits_per_sample is None (MP3 is
    not PCM).  Non-MPEG1-L3 syncs return the format with None fields
    rather than guessing."""
    p = payload
    none6 = (None, None, None, None, None, None)
    off = 0
    if len(p) >= 10 and p[:3] == b"ID3":
        size = (
            ((p[6] & 0x7F) << 21)
            | ((p[7] & 0x7F) << 14)
            | ((p[8] & 0x7F) << 7)
            | (p[9] & 0x7F)
        )
        off = 10 + size
    if off + 4 > len(p) or p[off] != 0xFF or (p[off + 1] & 0xE0) != 0xE0:
        return none6
    h1, h2, h3 = p[off + 1], p[off + 2], p[off + 3]
    version = (h1 >> 3) & 0x3   # 3 = MPEG1
    layer = (h1 >> 1) & 0x3     # 1 = Layer III
    if version != 3 or layer != 1:
        return ("mp3", None, None, None, None, None)
    br_idx = (h2 >> 4) & 0xF
    sr_idx = (h2 >> 2) & 0x3
    if br_idx in (0, 15) or sr_idx == 3:
        return ("mp3", None, None, None, None, None)
    rate = _MP3_RATES[sr_idx]
    kbps = _MP3_BITRATES[br_idx]
    channels = 1 if ((h3 >> 6) & 0x3) == 3 else 2
    padding = (h2 >> 1) & 0x1
    frame_len = (144 * kbps * 1000) // rate + padding
    n_frames = (len(p) - off) // frame_len if frame_len else None
    dur = (
        (n_frames * 1152 * 1000) // rate if n_frames is not None else None
    )
    return ("mp3", rate, channels, None, n_frames, dur)


def sniff_audio_meta(
    payload: bytes,
) -> tuple[str | None, int | None, int | None, int | None, int | None, int | None]:
    """Container dispatch on magic bytes: RIFF/WAVE → wav, fLaC → flac,
    ID3 tag or raw MPEG sync → mp3 — one entry point so audio_meta
    handles every supported audio container through the same Arrow
    pipeline."""
    p = payload
    if p[:4] == b"RIFF":
        return sniff_wav_meta(p)
    if p[:4] == b"fLaC":
        return sniff_flac_meta(p)
    if p[:3] == b"ID3" or (
        len(p) >= 2 and p[0] == 0xFF and (p[1] & 0xE0) == 0xE0
    ):
        return sniff_mp3_meta(p)
    return (None, None, None, None, None, None)


def audio_meta(media: DataFrame) -> DataFrame:
    """Per-clip audio metadata (WAV / FLAC / MP3 container headers) via
    mapInPandas over the binary payload — partition-parallel, no
    shuffle, Arrow-batched; linear at 100 TB."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = [
                sniff_audio_meta(bytes(x) if x is not None else b"")
                for x in pdf["payload"]
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "format": [r[0] for r in rows],
                    "sample_rate": pd.array([r[1] for r in rows], dtype="Int32"),
                    "channels": pd.array([r[2] for r in rows], dtype="Int32"),
                    "bits_per_sample": pd.array([r[3] for r in rows], dtype="Int32"),
                    "n_frames": pd.array([r[4] for r in rows], dtype="Int64"),
                    "duration_ms": pd.array([r[5] for r in rows], dtype="Int64"),
                }
            )

    return media.filter(F.col("kind") == "audio").mapInPandas(
        run, schema=AUDIO_META_SCHEMA
    )


# ---------------------------------------------------------------------------
# Video (ISO-BMFF / MP4) container metadata — REAL box walking
# ---------------------------------------------------------------------------

VIDEO_META_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("format", T.StringType(), True),
        T.StructField("major_brand", T.StringType(), True),
        T.StructField("timescale", T.LongType(), True),
        T.StructField("duration_ms", T.LongType(), True),
        T.StructField("n_tracks", T.IntegerType(), True),
    ]
)


def _walk_boxes(p: bytes, start: int, end: int):
    """Yield (box_type, payload_start, payload_end) for ISO-BMFF boxes in
    p[start:end].  Handles 64-bit largesize (size==1) and
    box-extends-to-eof (size==0); stops on malformed sizes."""
    i = start
    while i + 8 <= end:
        size = int.from_bytes(p[i : i + 4], "big")
        btype = p[i + 4 : i + 8]
        hdr = 8
        if size == 1:
            if i + 16 > end:
                return
            size = int.from_bytes(p[i + 8 : i + 16], "big")
            hdr = 16
        elif size == 0:
            size = end - i
        if size < hdr or i + size > end:
            return
        yield btype, i + hdr, i + size
        i += size


def sniff_mp4_meta(
    payload: bytes,
) -> tuple[str | None, str | None, int | None, int | None, int | None]:
    """REAL MP4/ISO-BMFF container metadata: walk the top-level box list
    to ftyp (major brand) and moov, then moov's children for mvhd
    (movie timescale + duration, version 0/1 layouts) and the trak
    count — pure byte arithmetic, no codec library, same discipline as
    sniff_image_meta/sniff_wav_meta (sample decode stays stubbed).
    Box walking matters for the same reason WAV chunk walking does:
    real files put free/udta boxes anywhere, so fixed offsets are wrong.
    Returns (format, major_brand, timescale, duration_ms, n_tracks).
    """
    p = payload
    none5 = (None, None, None, None, None)
    if len(p) < 12:
        return none5
    boxes = list(_walk_boxes(p, 0, len(p)))
    if not boxes or boxes[0][0] != b"ftyp":
        return none5
    brand = p[boxes[0][1] : boxes[0][1] + 4].decode("ascii", "replace").strip()
    timescale = duration = None
    n_tracks = 0
    for btype, s, e in boxes:
        if btype != b"moov":
            continue
        for ctype, cs, ce in _walk_boxes(p, s, e):
            if ctype == b"trak":
                n_tracks += 1
            elif ctype == b"mvhd" and ce - cs >= 4:
                version = p[cs]
                if version == 1 and ce - cs >= 4 + 8 + 8 + 4 + 8:
                    timescale = int.from_bytes(p[cs + 20 : cs + 24], "big")
                    duration = int.from_bytes(p[cs + 24 : cs + 32], "big")
                elif version == 0 and ce - cs >= 4 + 4 + 4 + 4 + 4:
                    timescale = int.from_bytes(p[cs + 12 : cs + 16], "big")
                    duration = int.from_bytes(p[cs + 16 : cs + 20], "big")
    duration_ms = (
        (duration * 1000) // timescale if duration is not None and timescale else None
    )
    return ("mp4", brand, timescale, duration_ms, n_tracks)


def video_meta(media: DataFrame) -> DataFrame:
    """Per-clip MP4 metadata via mapInPandas over the binary payload —
    partition-parallel, no shuffle, Arrow-batched; linear at 100 TB."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = [
                sniff_mp4_meta(bytes(x) if x is not None else b"")
                for x in pdf["payload"]
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "format": [r[0] for r in rows],
                    "major_brand": [r[1] for r in rows],
                    "timescale": pd.array([r[2] for r in rows], dtype="Int64"),
                    "duration_ms": pd.array([r[3] for r in rows], dtype="Int64"),
                    "n_tracks": pd.array([r[4] for r in rows], dtype="Int32"),
                }
            )

    return media.filter(F.col("kind") == "video").mapInPandas(
        run, schema=VIDEO_META_SCHEMA
    )


# ---------------------------------------------------------------------------
# Deterministic container synthesis — REAL bytes for every supported
# format, keyed on media_id, so the registry's multimodal op exercises
# the actual header decoders (not just the stubbed pixel path) with
# payloads whose parsed metadata is predictable.
# ---------------------------------------------------------------------------


def _png_bytes(width: int, height: int, seed: int = 0) -> bytes:
    """A COMPLETE 8-bit RGB PNG with deterministic seed-derived pixels —
    the SAME (y, x) → RGB formula as _bmp_bytes, so a PNG and a BMP of
    equal (width, height, seed) decode to identical luma strips (the
    cross-format test relies on that).  Filter-0 scanlines, real CRCs,
    one IDAT chunk; generation is numpy-vectorized so the synth runs at
    Arrow batch speed inside executors."""
    import struct
    import zlib

    import numpy as np

    def chunk(ctype: bytes, body: bytes) -> bytes:
        return (
            struct.pack(">I", len(body))
            + ctype
            + body
            + struct.pack(">I", zlib.crc32(ctype + body))
        )

    ihdr = struct.pack(">IIBBBBB", width, height, 8, 2, 0, 0, 0)
    v = (seed * 31 + np.arange(height * width, dtype=np.int64)) * 97
    px = (
        np.stack([(v + 170) % 256, (v + 85) % 256, v % 256], axis=-1)
        .astype(np.uint8)
        .reshape(height, width * 3)
    )
    scan = np.zeros((height, 1 + width * 3), dtype=np.uint8)
    # _bmp_bytes stores formula-row 0 as the BOTTOM image row (bottom-up
    # BMP); flip here so a PNG of the same (w, h, seed) shows the SAME
    # image top-to-bottom — identical luma matrices, identical feature
    # bits (float reduction order included)
    scan[:, 1:] = px[::-1]  # filter byte 0 (None) on every row
    idat = zlib.compress(scan.tobytes())
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", idat)
        + chunk(b"IEND", b"")
    )


def _png_palette_bytes(width: int, height: int, seed: int = 0) -> bytes:
    """A COMPLETE 8-bit PALETTE PNG (color type 3): PLTE carries the
    same 256-entry table as _gif_bytes and the index plane is the same
    seed-derived pattern, so a palette PNG, a GIF, and a BMP of equal
    (width, height, seed) decode to identical luma strips — the
    cross-format tests pin all three."""
    import struct
    import zlib

    import numpy as np

    def chunk(ctype: bytes, body: bytes) -> bytes:
        return (
            struct.pack(">I", len(body))
            + ctype
            + body
            + struct.pack(">I", zlib.crc32(ctype + body))
        )

    plte = bytes(
        b
        for j in range(256)
        for b in ((j * 97 + 170) % 256, (j * 97 + 85) % 256, (j * 97) % 256)
    )
    idx = (
        ((seed * 31 + np.arange(height * width, dtype=np.int64)) % 256)
        .astype(np.uint8)
        .reshape(height, width)[::-1]  # match _bmp_bytes' bottom-up image
    )
    scan = np.zeros((height, 1 + width), dtype=np.uint8)
    scan[:, 1:] = idx  # filter byte 0 (None) on every row
    ihdr = struct.pack(">IIBBBBB", width, height, 8, 3, 0, 0, 0)
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"PLTE", plte)
        + chunk(b"IDAT", zlib.compress(scan.tobytes()))
        + chunk(b"IEND", b"")
    )


def _gif_lzw_encode_literal(min_code_size: int, indices) -> bytes:
    """'Uncompressed' GIF LZW (the classic literal-code trick): emit
    CLEAR, then every pixel index as a literal code, re-emitting CLEAR
    before the decoder's table growth would force a code-width bump —
    so every code is exactly min_code_size+1 bits and the whole stream
    packs in one vectorized numpy pass.  Valid LZW output with zero
    compression logic; ~12% larger than raw indices at 8-bit."""
    import numpy as np

    clear = 1 << min_code_size
    end = clear + 1
    # After CLEAR the decoder table holds clear+2 entries; the first
    # literal adds none, each later literal adds one, and the width
    # bumps when the table reaches 2^(min_code_size+1).  clear-2
    # literals per group keeps the table at capacity-1, width fixed.
    group = max(clear - 2, 1)
    codes: list[int] = [clear]
    for g in range(0, len(indices), group):
        if g:
            codes.append(clear)
        codes.extend(int(x) for x in indices[g : g + group])
    codes.append(end)
    width = min_code_size + 1
    arr = np.asarray(codes, dtype=np.uint32)
    bits = (
        (arr[:, None] >> np.arange(width, dtype=np.uint32)) & 1
    ).astype(np.uint8)
    return np.packbits(bits.reshape(-1), bitorder="little").tobytes()


def _gif_bytes(width: int, height: int, seed: int = 0) -> bytes:
    """A COMPLETE GIF89a: 256-entry global color table + one
    non-interlaced full-frame image whose LZW data encodes deterministic
    seed-derived palette indices.  Palette entry j is the RGB that
    _bmp_bytes/_png_bytes assign to luma value v = j·97 — with pixel
    index (seed·31 + y·w + x) mod 256 the decoded colors are IDENTICAL
    to a BMP/PNG of the same (width, height, seed), so all three native
    decoders can be cross-checked bit-for-bit."""
    import struct

    import numpy as np

    idx = (
        ((seed * 31 + np.arange(height * width, dtype=np.int64)) % 256)
        .astype(np.uint8)
        .reshape(height, width)[::-1]  # match _bmp_bytes' bottom-up image
        .reshape(-1)
    )
    data = _gif_lzw_encode_literal(8, idx)
    palette = bytes(
        b
        for j in range(256)
        for b in ((j * 97 + 170) % 256, (j * 97 + 85) % 256, (j * 97) % 256)
    )
    out = bytearray(b"GIF89a")
    out += struct.pack("<HH", width, height)
    out += bytes([0xF7, 0, 0])  # GCT flag set, 2^(7+1) = 256 entries
    out += palette
    out += b"\x2C" + struct.pack("<HHHH", 0, 0, width, height) + b"\x00"
    out += bytes([8])  # LZW minimum code size
    for i in range(0, len(data), 255):
        block = data[i : i + 255]
        out += bytes([len(block)]) + block
    out += b"\x00\x3B"  # sub-block terminator + trailer
    return bytes(out)


def _bmp_bytes(width: int, height: int, seed: int) -> bytes:
    """A COMPLETE uncompressed 24-bit bottom-up BMP with deterministic
    seed-derived BGR pixels — unlike the header-only PNG/GIF synth
    payloads, this one carries a real pixel array so the native decode
    path (decode_bmp_image) runs against actual data."""
    import struct

    stride = (width * 3 + 3) & ~3
    img_size = stride * height
    header = (
        b"BM"
        + struct.pack("<IHHI", 54 + img_size, 0, 0, 54)
        + struct.pack(
            "<IiiHHIIiiII", 40, width, height, 1, 24, 0, img_size,
            2835, 2835, 0, 0,
        )
    )
    rows = bytearray()
    for y in range(height):  # bottom-up row order
        row = bytearray()
        for x in range(width):
            v = (seed * 31 + y * width + x) * 97
            row += bytes(((v) % 256, (v + 85) % 256, (v + 170) % 256))
        row += b"\x00" * (stride - len(row))
        rows += row
    return header + bytes(rows)


def _wav_bytes(
    rate: int, chans: int, bits: int, n_frames: int, seed: int | None = None
) -> bytes:
    import struct

    if seed is None:
        data = b"\x00" * (n_frames * chans * (bits // 8))
    elif bits == 8:
        data = bytes(
            ((seed * 31 + j) * 2654435761) % 256
            for j in range(n_frames * chans)
        )
    else:  # 16-bit little-endian signed PCM, deterministic per (seed, j)
        data = b"".join(
            struct.pack(
                "<h", ((seed * 31 + j) * 2654435761) % 65536 - 32768
            )
            for j in range(n_frames * chans)
        )
    fmt = b"fmt " + struct.pack(
        "<IHHIIHH",
        16, 1, chans, rate, rate * chans * bits // 8,
        chans * bits // 8, bits,
    )
    body = b"WAVE" + fmt + b"data" + struct.pack("<I", len(data)) + data
    return b"RIFF" + struct.pack("<I", len(body)) + body


def _flac_bytes(rate: int, chans: int, bits: int, total: int) -> bytes:
    import struct

    b = bytearray(34)
    struct.pack_into(">HH", b, 0, 4096, 4096)
    b[10] = (rate >> 12) & 0xFF
    b[11] = (rate >> 4) & 0xFF
    b[12] = ((rate & 0xF) << 4) | (((chans - 1) & 0x7) << 1) | (
        ((bits - 1) >> 4) & 0x1
    )
    b[13] = (((bits - 1) & 0xF) << 4) | ((total >> 32) & 0xF)
    b[14:18] = struct.pack(">I", total & 0xFFFFFFFF)
    return b"fLaC" + bytes([0x80]) + len(b).to_bytes(3, "big") + bytes(b)


def _mp3_bytes(kbps: int, rate: int, n_frames: int, channels: int) -> bytes:
    br_idx = _MP3_BITRATES.index(kbps)
    sr_idx = _MP3_RATES.index(rate)
    mode = 3 if channels == 1 else 0
    hdr = bytes([0xFF, 0xFB, (br_idx << 4) | (sr_idx << 2), mode << 6])
    frame_len = (144 * kbps * 1000) // rate
    return (hdr + b"\x00" * (frame_len - 4)) * n_frames


def _mp4_bytes(timescale: int, duration: int, n_tracks: int) -> bytes:
    import struct

    def box(btype: bytes, payload: bytes) -> bytes:
        return struct.pack(">I", len(payload) + 8) + btype + payload

    mvhd = bytes(12) + struct.pack(">II", timescale, duration) + bytes(80)
    moov = box(
        b"moov", box(b"mvhd", mvhd) + b"".join(
            box(b"trak", b"") for _ in range(n_tracks)
        )
    )
    return box(b"ftyp", b"isom\x00\x00\x02\x00isomiso2") + moov


# fixed canonical huffman tables for the synthesizer below: 12 DC
# categories at 4 bits, the full 162 AC (run, size) alphabet at
# 8 bits — deliberately uniform-length (suboptimal compression, dead
# simple), fully legal canonical tables any spec-conforming decoder
# accepts.  values order defines symbol-per-code-index; the decoder
# rebuilds the same assignment from (counts, values) via §C.2.
_JPEG_SYNTH_DC = (
    bytes([0, 0, 0, 12] + [0] * 12),
    bytes(range(12)),
)
_JPEG_SYNTH_AC = (
    bytes([0] * 7 + [162] + [0] * 8),
    bytes(
        [0x00, 0xF0]
        + [(r << 4) | s for r in range(16) for s in range(1, 11)]
    ),
)


def _jpeg_bytes(width: int, height: int, seed: int = 0) -> bytes:
    """A COMPLETE baseline sequential grayscale JPEG (SOF0, single
    component, flat quant table of 16s, the fixed canonical huffman
    tables above) with deterministic seed-derived pixels — the
    synthesizer twin of _png_bytes/_gif_bytes for the distributed
    round-trip: forward DCT is one vectorized float64 einsum, the
    per-block entropy encode mirrors spec §F.1 (DC diff categories,
    AC run-length with ZRL/EOB, FF00 byte stuffing, 1-padding to the
    byte boundary)."""
    import struct

    import numpy as np

    v = (seed * 31 + np.arange(height * width, dtype=np.int64)) * 97
    px = (v % 256).astype(np.float64).reshape(height, width)
    bw, bh = -(-width // 8), -(-height // 8)
    padded = np.zeros((bh * 8, bw * 8), dtype=np.float64)
    padded[:height, :width] = px
    padded[height:, :width] = px[-1:, :]  # edge-replicate pad
    padded[:, width:] = padded[:, width - 1 : width]
    blocks = (
        padded.reshape(bh, 8, bw, 8).transpose(0, 2, 1, 3).reshape(-1, 8, 8)
        - 128.0
    )
    k_idx = np.arange(8, dtype=np.float64)
    A = 0.5 * np.cos(
        (2.0 * k_idx[None, :] + 1.0) * k_idx[:, None] * np.pi / 16.0
    )
    A[0, :] /= np.sqrt(2.0)
    # forward: C = A P Aᵀ (the decoder inverts with P = Aᵀ C A)
    coefs = np.einsum("kn,bnm,lm->bkl", A, blocks, A)
    q = 16.0
    quant = np.round(coefs / q).astype(np.int64)

    dclut = {
        s: (4, c) for c, s in enumerate(_JPEG_SYNTH_DC[1])
    }  # symbol → (len, code)
    aclut = {s: (8, c) for c, s in enumerate(_JPEG_SYNTH_AC[1])}

    buf = bytearray()
    state = [0, 0]  # bit accumulator, bit count

    def put(val: int, nbits: int) -> None:
        acc, n = state
        for b in range(nbits - 1, -1, -1):
            acc = (acc << 1) | ((val >> b) & 1)
            n += 1
            if n == 8:
                buf.append(acc)
                if acc == 0xFF:
                    buf.append(0x00)  # byte stuffing
                acc = 0
                n = 0
        state[0], state[1] = acc, n

    def put_sym(lut, sym: int) -> None:
        ln, code = lut[sym]
        put(code, ln)

    def put_coef(lut, run_sym_base: int, x: int) -> None:
        s = abs(x).bit_length()
        put_sym(lut, run_sym_base | s)
        if s:
            put(x if x > 0 else x + (1 << s) - 1, s)

    pred = 0
    for blk in quant:
        zz = [int(blk.reshape(-1)[_JPEG_ZIGZAG[k]]) for k in range(64)]
        put_coef(dclut, 0, zz[0] - pred)
        pred = zz[0]
        run = 0
        for k in range(1, 64):
            if zz[k] == 0:
                run += 1
                continue
            while run > 15:
                put_sym(aclut, 0xF0)  # ZRL
                run -= 16
            put_coef(aclut, run << 4, zz[k])
            run = 0
        if run:
            put_sym(aclut, 0x00)  # EOB
    while state[1]:
        put(1, 1)  # 1-pad to byte boundary

    out = bytearray(b"\xff\xd8")  # SOI
    out += b"\xff\xdb" + struct.pack(">H", 67) + bytes([0x00]) + bytes(
        [16] * 64
    )
    out += (
        b"\xff\xc0"
        + struct.pack(">H", 11)
        + bytes([8])
        + struct.pack(">HH", height, width)
        + bytes([1, 1, 0x11, 0])
    )
    for tcth, (counts, values) in (
        (0x00, _JPEG_SYNTH_DC),
        (0x10, _JPEG_SYNTH_AC),
    ):
        out += (
            b"\xff\xc4"
            + struct.pack(">H", 2 + 1 + 16 + len(values))
            + bytes([tcth])
            + counts
            + values
        )
    out += (
        b"\xff\xda"
        + struct.pack(">H", 8)
        + bytes([1, 1, 0x00, 0, 63, 0])
    )
    out += buf
    out += b"\xff\xd9"  # EOI
    return bytes(out)


def synth_media_payload(media_id: int, kind: str) -> bytes:
    """Deterministic REAL container bytes for (media_id, kind): images
    rotate full-pixel PNG / GIF / BMP / JPEG by id so every image
    sniffer AND all four native pixel decoders are exercised against
    actual pixel data; audio rotates WAV / FLAC / MP3 by id so every
    audio decoder is exercised; video is a minimal ISO-BMFF file
    (ftyp + moov/mvhd + one trak).  Parsed metadata is a pure function
    of media_id — the registry op asserts it round-trips through the
    distributed decode pipeline.  GIF/BMP/JPEG dims stay modest
    (≤64×48: uncompressed-sized pixel payloads / interpreted huffman
    decode); PNG deflates its periodic pattern to a few KB, so it
    keeps the full 640×480 domain."""
    m = int(media_id)
    if kind == "image":
        v = (m // 3) % 4
        if v == 0:
            # alternate truecolor / palette PNG by id so BOTH native
            # PNG paths run through the distributed round-trip
            builder = _png_palette_bytes if (m // 9) % 2 else _png_bytes
            return builder((m % 640) + 1, (m % 480) + 1, seed=m)
        if v == 1:
            return _gif_bytes((m % 64) + 1, (m % 48) + 1, seed=m)
        if v == 2:
            return _bmp_bytes((m % 64) + 1, (m % 48) + 1, m)
        return _jpeg_bytes((m % 64) + 1, (m % 48) + 1, seed=m)
    if kind == "audio":
        # rotate on m//3, not m%3: the caller assigns kind by m%3, so
        # every audio id shares the same residue
        v = (m // 3) % 3
        if v == 0:
            # seed=m → REAL nonzero PCM frames, so the native decode in
            # audio_rms_windows chews actual sample data (r12)
            return _wav_bytes(
                16000, (m % 2) + 1, 16, (m % 100) * 10 + 160, seed=m
            )
        if v == 1:
            return _flac_bytes(44100, 2, 16, (m % 50) * 441 + 441)
        return _mp3_bytes(128, 44100, (m % 5) + 1, 2)
    if kind == "video":
        return _mp4_bytes(1000, (m % 60) * 500 + 500, (m % 2) + 1)
    return hashlib.md5(f"{kind}:{m}".encode()).digest() * 4
