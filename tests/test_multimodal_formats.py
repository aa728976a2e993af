"""FLAC / MP3 container-header decoders (r11): byte-constructed valid
containers parse back exactly through the pure functions AND through the
audio_meta mapInPandas pipeline, which now dispatches on magic bytes
(WAV / FLAC / MP3 through one Arrow-batched op)."""

import struct

from hypothesis import given, settings
from hypothesis import strategies as st

from data_warehouse_hive_spark.sources.multimodal import (
    audio_meta,
    sniff_audio_meta,
    sniff_flac_meta,
    sniff_mp3_meta,
)


def flac(rate, chans, bits, total, pre_blocks=b""):
    """Minimal valid FLAC: magic + optional benign metadata blocks +
    STREAMINFO built bit-by-bit per the public spec."""
    b = bytearray(34)
    struct.pack_into(">HH", b, 0, 4096, 4096)  # min/max blocksize
    b[10] = (rate >> 12) & 0xFF
    b[11] = (rate >> 4) & 0xFF
    b[12] = ((rate & 0xF) << 4) | (((chans - 1) & 0x7) << 1) | (
        ((bits - 1) >> 4) & 0x1
    )
    b[13] = (((bits - 1) & 0xF) << 4) | ((total >> 32) & 0xF)
    b[14:18] = struct.pack(">I", total & 0xFFFFFFFF)
    streaminfo = bytes([0x80]) + len(b).to_bytes(3, "big") + bytes(b)
    return b"fLaC" + pre_blocks + streaminfo


def padding_block(n):
    # type 1 = PADDING, not last
    return bytes([0x01]) + n.to_bytes(3, "big") + b"\x00" * n


def mp3_frames(kbps, rate, n_frames, channels=2, id3=b""):
    """CBR MPEG1 Layer III frames: real 4-byte headers + zero payload."""
    from data_warehouse_hive_spark.sources.multimodal import (
        _MP3_BITRATES,
        _MP3_RATES,
    )

    br_idx = _MP3_BITRATES.index(kbps)
    sr_idx = _MP3_RATES.index(rate)
    mode = 3 if channels == 1 else 0
    hdr = bytes(
        [0xFF, 0xFB, (br_idx << 4) | (sr_idx << 2), mode << 6]
    )  # 0xFB = MPEG1, Layer III, no CRC
    frame_len = (144 * kbps * 1000) // rate
    frame = hdr + b"\x00" * (frame_len - 4)
    return id3 + frame * n_frames


def id3v2(size):
    return b"ID3\x04\x00\x00" + bytes(
        [(size >> 21) & 0x7F, (size >> 14) & 0x7F, (size >> 7) & 0x7F,
         size & 0x7F]
    ) + b"\x00" * size


def test_flac_streaminfo_decode():
    assert sniff_flac_meta(flac(44100, 2, 16, 441000)) == (
        "flac", 44100, 2, 16, 441000, 10000,
    )
    # STREAMINFO after a padding block still found by the walker
    assert sniff_flac_meta(
        b"fLaC" + padding_block(17) + flac(48000, 1, 24, 48000)[4:]
    ) == ("flac", 48000, 1, 24, 48000, 1000)
    assert sniff_flac_meta(b"fLaCxx") == (
        "flac", None, None, None, None, None,
    )
    assert sniff_flac_meta(b"junk") == (None,) * 6


@settings(max_examples=50, deadline=None)
@given(
    rate=st.sampled_from([8000, 16000, 22050, 44100, 48000, 96000]),
    chans=st.integers(1, 8),
    bits=st.sampled_from([8, 12, 16, 20, 24, 32]),
    total=st.integers(0, 2**36 - 1),
)
def test_flac_roundtrip_property(rate, chans, bits, total):
    fmt, r, c, b, n, dur = sniff_flac_meta(flac(rate, chans, bits, total))
    assert (fmt, r, c, b, n) == ("flac", rate, chans, bits, total)
    assert dur == (total * 1000) // rate


def test_mp3_frame_header_decode():
    # 128 kbps 44.1 kHz stereo, 10 frames, behind an ID3v2 tag
    p = mp3_frames(128, 44100, 10, id3=id3v2(57))
    fmt, rate, ch, bits, n, dur = sniff_mp3_meta(p)
    assert (fmt, rate, ch, bits, n) == ("mp3", 44100, 2, None, 10)
    assert dur == (10 * 1152 * 1000) // 44100
    # mono, no tag
    assert sniff_mp3_meta(mp3_frames(64, 32000, 3, channels=1))[:3] == (
        "mp3", 32000, 1,
    )
    # free-format / bad sync degrade to None fields, not garbage
    assert sniff_mp3_meta(b"\xff\xe0junk")[0] == "mp3" or sniff_mp3_meta(
        b"\xff\xe0junk"
    ) == (None,) * 6
    assert sniff_mp3_meta(b"notmp3") == (None,) * 6


def test_audio_meta_dispatches_all_formats(spark):
    rows = [
        (1, "audio", flac(44100, 2, 16, 44100)),
        (2, "audio", mp3_frames(128, 44100, 5, id3=id3v2(10))),
        (3, "audio", b"RIFFxxxxJUNK"),
        (4, "audio", b"not audio"),
        (5, "image", b"\x89PNG"),  # filtered out by kind
    ]
    media = spark.createDataFrame(
        rows, "media_id long, kind string, payload binary"
    )
    got = {r["media_id"]: r for r in audio_meta(media).collect()}
    assert set(got) == {1, 2, 3, 4}
    assert (got[1]["format"], got[1]["sample_rate"], got[1]["n_frames"]) == (
        "flac", 44100, 44100,
    )
    assert (got[2]["format"], got[2]["channels"], got[2]["n_frames"]) == (
        "mp3", 2, 5,
    )
    assert got[3]["sample_rate"] is None  # RIFF but not a WAVE body
    assert got[4]["format"] is None


def test_dispatch_magic():
    assert sniff_audio_meta(flac(8000, 1, 8, 0))[0] == "flac"
    assert sniff_audio_meta(mp3_frames(32, 48000, 1))[0] == "mp3"
    assert sniff_audio_meta(b"")[0] is None


# ---------------------------------------------------------------------------
# r12: native BMP pixel decode — the one image format whose pixel array
# needs no codec library, now REALLY decoded (struct + numpy).
# ---------------------------------------------------------------------------


def test_bmp_bytes_sniff_and_gate():
    from data_warehouse_hive_spark.sources.multimodal import (
        _bmp_bytes,
        is_plain_bmp,
        sniff_image_meta,
    )

    p = _bmp_bytes(17, 9, seed=42)
    assert sniff_image_meta(p) == ("bmp", 17, 9)
    assert is_plain_bmp(p)
    # header-only / truncated payloads must NOT pass the gate
    assert not is_plain_bmp(p[:53])
    assert not is_plain_bmp(p[:-1])
    assert not is_plain_bmp(b"BM" + b"\x00" * 60)  # bpp 0


def test_bmp_pixel_decode_matches_independent_reference():
    """decode_bmp_image's numpy fast path vs a pure-python per-pixel
    reference over a sweep of widths (padding edge cases) and heights."""
    from data_warehouse_hive_spark.sources.multimodal import (
        FEATURE_DIM,
        _bmp_bytes,
        decode_bmp_image,
    )

    def reference(w, h, seed):
        # same deterministic pixel formula as _bmp_bytes, decoded by hand
        luma_cols = [[] for _ in range(w)]
        for y in range(h):
            for x in range(w):
                v = (seed * 31 + y * w + x) * 97
                bch, gch, rch = v % 256, (v + 85) % 256, (v + 170) % 256
                luma_cols[x].append(
                    (299 * rch + 587 * gch + 114 * bch) / 1000.0
                )
        out = []
        for b in range(FEATURE_DIM):
            lo = (b * w) // FEATURE_DIM
            hi = max(((b + 1) * w) // FEATURE_DIM, lo + 1)
            vals = [v for x in range(lo, hi) for v in luma_cols[x]]
            out.append(sum(vals) / len(vals) / 255.0)
        return out

    for w, h, seed in [(1, 1, 0), (3, 2, 7), (8, 8, 1), (13, 5, 99),
                       (16, 3, 4), (64, 48, 11)]:
        got = decode_bmp_image(_bmp_bytes(w, h, seed))
        exp = reference(w, h, seed)
        assert len(got) == FEATURE_DIM
        assert all(0.0 <= g <= 1.0 for g in got)
        assert all(abs(g - e) < 1e-9 for g, e in zip(got, exp)), (w, h)


def test_bmp_decode_top_down_storage():
    """Negative biHeight = top-down row order; luma strip must be
    identical to the bottom-up encoding of the same image only when the
    pixel content is row-symmetric — here we just assert the decoder
    honors the sign by comparing against a manual flip."""
    import struct

    from data_warehouse_hive_spark.sources.multimodal import (
        _bmp_bytes,
        decode_bmp_image,
    )

    w, h, seed = 5, 3, 13
    p = bytearray(_bmp_bytes(w, h, seed))
    # flip to top-down: negate height and reverse the stored row order
    struct.pack_into("<i", p, 22, -h)
    stride = (w * 3 + 3) & ~3
    body = p[54:]
    rows = [bytes(body[i * stride:(i + 1) * stride]) for i in range(h)]
    p[54:] = b"".join(reversed(rows))
    assert decode_bmp_image(bytes(p)) == decode_bmp_image(
        _bmp_bytes(w, h, seed)
    )


def test_extract_features_native_bmp_without_pillow(spark):
    from data_warehouse_hive_spark.sources.multimodal import (
        _bmp_bytes,
        decode_bmp_image,
        extract_features,
        fake_decode_image,
        real_decoder_available,
    )

    payload = _bmp_bytes(32, 24, seed=5)
    media = spark.createDataFrame(
        [(1, "image", payload), (2, "image", b"\x89PNG header-only")],
        "media_id long, kind string, payload binary",
    )
    got = {
        r["media_id"]: list(r["feature"])
        for r in extract_features(media).collect()
    }
    # BMP decodes natively (real pixels) even with no codec lib present
    assert got[1] == decode_bmp_image(payload)
    # the non-native payload falls back to the deterministic fake ONLY
    # when no codec lib is installed (r12 ADVICE: with Pillow present,
    # auto-detect routes it to the real decoder, which raises on the
    # truncated bytes — don't assert the fake there)
    if not real_decoder_available():
        assert got[2] == fake_decode_image(b"\x89PNG header-only")
    # explicit False forces the fake branch for everything (pin contract)
    forced = {
        r["media_id"]: list(r["feature"])
        for r in extract_features(media, use_real_decoder=False).collect()
    }
    assert forced[1] == fake_decode_image(payload)


# ---------------------------------------------------------------------------
# r13: native PNG pixel decode — stdlib zlib inflate + scanline
# unfiltering (r12 VERDICT task 1).
# ---------------------------------------------------------------------------


def _png_with_filters(pxmat, filters):
    """Independent PNG encoder for the tests: per-row filter types from
    `filters` (cycled), encoding each row with a straight-line reference
    implementation of the spec's filter equations — decoder must invert
    every one of them."""
    import zlib

    import numpy as np

    h, w, ch = pxmat.shape
    raw = bytearray()
    prev = np.zeros(w * ch, np.int64)
    for y in range(h):
        line = pxmat[y].reshape(-1).astype(np.int64)
        ft = filters[y % len(filters)]
        raw.append(ft)
        for x in range(w * ch):
            a = int(line[x - ch]) if x >= ch else 0
            b = int(prev[x])
            c = int(prev[x - ch]) if x >= ch else 0
            if ft == 0:
                pred = 0
            elif ft == 1:
                pred = a
            elif ft == 2:
                pred = b
            elif ft == 3:
                pred = (a + b) // 2
            else:
                pa, pb, pc = abs(b - c), abs(a - c), abs(a + b - 2 * c)
                pred = a if pa <= pb and pa <= pc else (b if pb <= pc else c)
            raw.append((int(line[x]) - pred) % 256)
        prev = line

    def chunk(t, body):
        return (
            struct.pack(">I", len(body)) + t + body
            + struct.pack(">I", zlib.crc32(t + body))
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(raw)))
        + chunk(b"IEND", b"")
    )


def test_png_bytes_sniff_and_gate():
    from data_warehouse_hive_spark.sources.multimodal import (
        _png_bytes,
        is_plain_png,
        sniff_image_meta,
    )

    p = _png_bytes(17, 9, seed=42)
    assert sniff_image_meta(p) == ("png", 17, 9)
    assert is_plain_png(p)
    # truncated / header-only payloads must NOT pass the gate
    assert not is_plain_png(p[:-5])
    assert not is_plain_png(p[:33])
    assert not is_plain_png(b"\x89PNG...")


def test_png_unfilter_all_filter_types():
    import numpy as np

    from data_warehouse_hive_spark.sources.multimodal import (
        decode_png_pixels,
    )

    rng = np.random.RandomState(7)
    pxmat = rng.randint(0, 256, size=(9, 11, 3)).astype(np.uint8)
    for filters in ([0], [1], [2], [3], [4], [0, 1, 2, 3, 4]):
        got = decode_png_pixels(_png_with_filters(pxmat, filters))
        assert (got == pxmat).all(), filters


def test_png_grayscale_and_rgba_decode():
    """Color types 0 (gray) and 6 (RGBA) take the non-RGB luma paths:
    gray passes through, alpha is ignored."""
    import zlib

    import numpy as np

    from data_warehouse_hive_spark.sources.multimodal import (
        FEATURE_DIM,
        decode_png_image,
        decode_png_pixels,
    )

    def png(color_type, ch, pxflat, w, h):
        def chunk(t, body):
            return (
                struct.pack(">I", len(body)) + t + body
                + struct.pack(">I", zlib.crc32(t + body))
            )

        raw = bytearray()
        for y in range(h):
            raw.append(0)
            raw += bytes(pxflat[y * w * ch : (y + 1) * w * ch])
        ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
        return (
            b"\x89PNG\r\n\x1a\n"
            + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(bytes(raw)))
            + chunk(b"IEND", b"")
        )

    # 4x2 grayscale ramp: strip buckets pool single columns
    gray_vals = [0, 51, 102, 153, 204, 255, 34, 68]
    g = png(0, 1, gray_vals, 4, 2)
    px = decode_png_pixels(g)
    assert px.shape == (2, 4, 1)
    feat = decode_png_image(g)
    assert len(feat) == FEATURE_DIM
    cols = np.array(gray_vals, dtype=np.float64).reshape(2, 4)
    # FEATURE_DIM=8 > w=4: bucket b covers max(1) column starting b*4//8
    for b in range(FEATURE_DIM):
        lo = (b * 4) // FEATURE_DIM
        hi = max(((b + 1) * 4) // FEATURE_DIM, lo + 1)
        assert abs(feat[b] - cols[:, lo:hi].mean() / 255.0) < 1e-12
    # RGBA: alpha must not influence the luma
    rgba = [10, 20, 30, 0, 10, 20, 30, 255]  # same RGB, opposite alpha
    r = png(6, 4, rgba, 2, 1)
    f = decode_png_image(r)
    lum = (299 * 10 + 587 * 20 + 114 * 30) / 1000.0 / 255.0
    assert all(abs(x - lum) < 1e-12 for x in f)


def test_png_palette_decode_cross_format():
    """8-bit palette PNG (color type 3): index bytes unfilter like any
    scanline, then resolve through PLTE — built here with the exact
    palette/index scheme _gif_bytes uses, so the palette PNG must
    decode bit-identically to the GIF and BMP of the same (w, h,
    seed)."""
    from data_warehouse_hive_spark.sources.multimodal import (
        _bmp_bytes,
        _gif_bytes,
        _png_palette_bytes as palette_png,
        decode_bmp_image,
        decode_gif_image,
        decode_png_image,
        is_plain_png,
    )

    for w, h, seed in [(1, 1, 0), (13, 5, 99), (64, 48, 11)]:
        p = palette_png(w, h, seed)
        assert is_plain_png(p)
        fp = decode_png_image(p)
        assert fp == decode_gif_image(_gif_bytes(w, h, seed=seed))
        assert fp == decode_bmp_image(_bmp_bytes(w, h, seed))
    # palette type WITHOUT a PLTE chunk fails the gate, not the decoder
    broken = palette_png(4, 4, 1)
    i = broken.index(b"PLTE")
    no_plte = broken[: i - 4] + broken[i + 4 + 768 + 4 :]
    assert not is_plain_png(no_plte)


def test_png_corrupt_stream_raises_value_error():
    from data_warehouse_hive_spark.sources.multimodal import (
        _png_bytes,
        decode_png_image,
        is_plain_png,
    )
    import pytest

    p = bytearray(_png_bytes(10, 10, seed=2))
    i = p.index(b"IDAT")
    p[i + 10] ^= 0xFF
    p[i + 11] ^= 0xFF
    corrupt = bytes(p)
    assert is_plain_png(corrupt)  # structurally complete…
    with pytest.raises(ValueError):  # …but the DEFLATE stream is junk
        decode_png_image(corrupt)


# ---------------------------------------------------------------------------
# r13: native GIF pixel decode — pure-Python GIF-LZW + palette lookup
# (r12 VERDICT task 6).
# ---------------------------------------------------------------------------


def test_gif_bytes_sniff_and_gate():
    from data_warehouse_hive_spark.sources.multimodal import (
        _gif_bytes,
        is_plain_gif,
        sniff_image_meta,
    )

    p = _gif_bytes(17, 9, seed=42)
    assert sniff_image_meta(p) == ("gif", 17, 9)
    assert is_plain_gif(p)
    assert not is_plain_gif(p[:-3])  # truncated sub-block chain
    assert not is_plain_gif(b"GIF89a" + struct.pack("<HH", 4, 4) + b"\x00\x00\x00")


@settings(max_examples=25, deadline=None)
@given(
    mcs=st.integers(2, 8),
    n=st.integers(1, 700),
    data=st.data(),
)
def test_gif_lzw_literal_roundtrip_property(mcs, n, data):
    """The literal-code encoder must produce streams the (independent)
    decoder inverts exactly, for every minimum code size — including
    the CLEAR-before-width-bump boundary."""
    from data_warehouse_hive_spark.sources.multimodal import (
        _gif_lzw_decode,
        _gif_lzw_encode_literal,
    )

    idx = bytes(
        data.draw(
            st.lists(
                st.integers(0, (1 << mcs) - 1), min_size=n, max_size=n
            )
        )
    )
    enc = _gif_lzw_encode_literal(mcs, idx)
    assert _gif_lzw_decode(mcs, enc, n) == idx


def test_gif_lzw_decode_real_compression():
    """The decoder must handle genuinely compressed streams (table-entry
    codes, KwKwK case, width growth), not just our literal encoding —
    hand-build one: with mcs=2, codes CLEAR,1,1,… exercise entry reuse."""
    from data_warehouse_hive_spark.sources.multimodal import (
        _gif_lzw_decode,
    )

    # mcs=2: clear=4, end=5, width starts at 3.
    # Emit: CLEAR(4), 1, 6 — code 6 is the first table entry; at the
    # time it arrives the table has exactly 6 entries so it's the KwKwK
    # case: entry = prev + prev[0] = b"\x11".
    import numpy as np

    codes = [4, 1, 6, 5]
    width = 3
    bits = (
        (np.asarray(codes, dtype=np.uint32)[:, None]
         >> np.arange(width, dtype=np.uint32)) & 1
    ).astype(np.uint8)
    stream = np.packbits(bits.reshape(-1), bitorder="little").tobytes()
    assert _gif_lzw_decode(2, stream, 3) == b"\x01\x01\x01"


def test_gif_pixel_decode_cross_format_equality():
    """A GIF, PNG, and BMP of the same (w, h, seed) render the SAME
    image by construction — all three native decoders must emit
    bit-identical feature strips."""
    from data_warehouse_hive_spark.sources.multimodal import (
        _bmp_bytes,
        _gif_bytes,
        _png_bytes,
        decode_bmp_image,
        decode_gif_image,
        decode_png_image,
    )

    for w, h, seed in [(1, 1, 0), (3, 2, 7), (13, 5, 99), (64, 48, 11)]:
        fb = decode_bmp_image(_bmp_bytes(w, h, seed))
        fp = decode_png_image(_png_bytes(w, h, seed=seed))
        fg = decode_gif_image(_gif_bytes(w, h, seed=seed))
        assert fb == fp == fg, (w, h, seed)


def test_extract_features_native_png_gif(spark):
    """The distributed pipeline routes PNG and GIF through the native
    decoders with no codec lib — and corrupt gated payloads degrade to
    the deterministic fake instead of failing the stage."""
    from data_warehouse_hive_spark.sources.multimodal import (
        _gif_bytes,
        _png_bytes,
        decode_gif_image,
        decode_png_image,
        extract_features,
        fake_decode_image,
    )

    png = _png_bytes(20, 10, seed=3)
    gif = _gif_bytes(20, 10, seed=3)
    corrupt = bytearray(png)
    i = corrupt.index(b"IDAT")
    corrupt[i + 10] ^= 0xFF
    corrupt[i + 11] ^= 0xFF
    corrupt = bytes(corrupt)
    media = spark.createDataFrame(
        [(1, "image", png), (2, "image", gif), (3, "image", corrupt)],
        "media_id long, kind string, payload binary",
    )
    got = {
        r["media_id"]: list(r["feature"])
        for r in extract_features(media).collect()
    }
    assert got[1] == decode_png_image(png)
    assert got[2] == decode_gif_image(gif)
    assert got[1] == got[2]  # same (w, h, seed) → same image
    assert got[3] == fake_decode_image(corrupt)
    forced = {
        r["media_id"]: list(r["feature"])
        for r in extract_features(media, use_real_decoder=False).collect()
    }
    assert forced[1] == fake_decode_image(png)
    assert forced[2] == fake_decode_image(gif)


# ---------------------------------------------------------------------------
# r12: native WAV PCM sample decode — the audio twin of the BMP path.
# ---------------------------------------------------------------------------


def test_wav_pcm_decode_matches_hand_computation():
    import numpy as np

    from data_warehouse_hive_spark.sources.multimodal import (
        _wav_bytes,
        decode_wav_samples,
        is_plain_wav_pcm,
    )

    # 16-bit stereo: downmix = per-frame channel mean
    p = _wav_bytes(8000, 2, 16, 4, seed=3)
    assert is_plain_wav_pcm(p)
    wave = decode_wav_samples(p)
    assert wave.shape == (4,)
    exp = []
    for i in range(4):
        vals = [
            (((3 * 31 + i * 2 + c) * 2654435761) % 65536 - 32768) / 32768.0
            for c in range(2)
        ]
        exp.append(sum(vals) / 2.0)
    assert np.allclose(wave, exp, atol=1e-12)
    # zero-filled payload (seed=None) decodes to silence
    assert not decode_wav_samples(_wav_bytes(8000, 1, 16, 5)).any()
    # non-PCM / truncated payloads fail the gate
    assert not is_plain_wav_pcm(p[:-1])
    assert not is_plain_wav_pcm(b"RIFFxxxxWAVE")


def test_wav_pcm_8bit_and_chunk_walk():
    from data_warehouse_hive_spark.sources.multimodal import (
        decode_wav_samples,
        is_plain_wav_pcm,
    )
    import struct

    # hand-built 8-bit mono WAV with a LIST chunk BEFORE data — the
    # decoder must walk chunks, not assume fixed offsets
    samples = bytes([128, 255, 0, 128])
    fmt = b"fmt " + struct.pack("<IHHIIHH", 16, 1, 1, 8000, 8000, 1, 8)
    lst = b"LIST" + struct.pack("<I", 4) + b"INFO"
    body = b"WAVE" + fmt + lst + b"data" + struct.pack("<I", 4) + samples
    p = b"RIFF" + struct.pack("<I", len(body)) + body
    assert is_plain_wav_pcm(p)
    wave = decode_wav_samples(p)
    assert list(wave) == [0.0, 127 / 128.0, -1.0, 0.0]


def test_audio_rms_windows_native_wav(spark):
    import numpy as np

    from data_warehouse_hive_spark.sources.multimodal import (
        _wav_bytes,
        audio_rms_windows,
        decode_wav_samples,
    )

    payload = _wav_bytes(16000, 2, 16, 600, seed=9)
    media = spark.createDataFrame(
        [(1, "audio", payload), (2, "audio", bytes(range(256)))],
        "media_id long, kind string, payload binary",
    )
    got = {
        (r["media_id"], r["window_idx"]): (r["n_samples"], r["rms"])
        for r in audio_rms_windows(media, samples_per_window=256).collect()
    }
    wave = decode_wav_samples(payload)
    assert len(wave) == 600
    for w in range(0, 600, 256):
        chunk = wave[w : w + 256]
        assert got[(1, w // 256)] == (
            len(chunk), float(np.sqrt(np.mean(chunk ** 2))),
        )
    # non-WAV payload keeps the stubbed u8 interpretation
    import math
    assert got[(2, 0)][1] == float(
        math.sqrt(sum(b * b for b in range(256)) / 256)
    )


# ---------------------------------------------------------------------------
# r13: interlaced containers — Adam7 PNG and 4-pass GIF row interlace.
# ---------------------------------------------------------------------------

_ADAM7_TEST = [
    (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
    (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2),
]


def _interlaced_png(pxmat, filters=(0,)):
    """Independent Adam7 encoder: scatter the image into the 7 passes,
    filter each pass's scanlines with the reference filter equations
    (cycled per row), concatenate."""
    import zlib

    import numpy as np

    h, w, ch = pxmat.shape
    raw = bytearray()
    for x0, y0, dx, dy in _ADAM7_TEST:
        sub = pxmat[y0::dy, x0::dx, :]
        ph, pw = sub.shape[0], sub.shape[1]
        if ph == 0 or pw == 0:
            continue
        prev = np.zeros(pw * ch, np.int64)
        for y in range(ph):
            line = sub[y].reshape(-1).astype(np.int64)
            ft = filters[y % len(filters)]
            raw.append(ft)
            for x in range(pw * ch):
                a = int(line[x - ch]) if x >= ch else 0
                b = int(prev[x])
                c = int(prev[x - ch]) if x >= ch else 0
                if ft == 0:
                    pred = 0
                elif ft == 1:
                    pred = a
                elif ft == 2:
                    pred = b
                elif ft == 3:
                    pred = (a + b) // 2
                else:
                    pa, pb, pc = abs(b - c), abs(a - c), abs(a + b - 2 * c)
                    pred = (
                        a if pa <= pb and pa <= pc else (b if pb <= pc else c)
                    )
                raw.append((int(line[x]) - pred) % 256)
            prev = line

    def chunk(t, body):
        return (
            struct.pack(">I", len(body)) + t + body
            + struct.pack(">I", zlib.crc32(t + body))
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 1)  # interlace=1
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(raw)))
        + chunk(b"IEND", b"")
    )


def test_png_adam7_interlaced_decode():
    import numpy as np

    from data_warehouse_hive_spark.sources.multimodal import (
        decode_png_pixels,
        is_plain_png,
    )

    rng = np.random.RandomState(11)
    for w, h in [(1, 1), (2, 3), (7, 5), (8, 8), (13, 9), (64, 48)]:
        img = rng.randint(0, 256, size=(h, w, 3)).astype(np.uint8)
        for filters in ((0,), (2,), (0, 1, 2, 3, 4)):
            p = _interlaced_png(img, filters)
            assert is_plain_png(p), (w, h)
            got = decode_png_pixels(p)
            assert (got == img).all(), (w, h, filters)


def test_png_adam7_matches_sequential_feature_bits():
    """The SAME image encoded interlaced and sequential must give the
    SAME feature strip — interlacing is storage order, not content."""
    import numpy as np

    from data_warehouse_hive_spark.sources.multimodal import (
        _png_bytes,
        decode_png_image,
        decode_png_pixels,
    )

    seq = _png_bytes(13, 5, seed=99)
    img = decode_png_pixels(seq)
    assert decode_png_image(_interlaced_png(img)) == decode_png_image(seq)


def test_gif_interlaced_decode():
    """GIF interlace = fixed 4-pass row permutation (rows 0,8,…; 4,12,…;
    2,6,…; odd).  Build one by reordering the index rows and setting
    the interlace flag; decode must equal the sequential twin."""
    import numpy as np

    from data_warehouse_hive_spark.sources.multimodal import (
        _gif_bytes,
        _gif_lzw_encode_literal,
        decode_gif_image,
        is_plain_gif,
    )

    def interlaced_gif(w, h, seed):
        idx = (
            ((seed * 31 + np.arange(h * w, dtype=np.int64)) % 256)
            .astype(np.uint8)
            .reshape(h, w)[::-1]  # same image as _gif_bytes
        )
        order = [
            r
            for start, step in ((0, 8), (4, 8), (2, 4), (1, 2))
            for r in range(start, h, step)
        ]
        stored = idx[order].reshape(-1)  # rows in interlaced order
        data = _gif_lzw_encode_literal(8, stored)
        palette = bytes(
            b
            for j in range(256)
            for b in (
                (j * 97 + 170) % 256, (j * 97 + 85) % 256, (j * 97) % 256,
            )
        )
        out = bytearray(b"GIF89a")
        out += struct.pack("<HH", w, h)
        out += bytes([0xF7, 0, 0])
        out += palette
        # image descriptor with the INTERLACE flag (0x40)
        out += b"\x2C" + struct.pack("<HHHH", 0, 0, w, h) + b"\x40"
        out += bytes([8])
        for i in range(0, len(data), 255):
            block = data[i : i + 255]
            out += bytes([len(block)]) + block
        out += b"\x00\x3B"
        return bytes(out)

    for w, h, seed in [(5, 1, 2), (9, 4, 3), (13, 5, 99), (64, 48, 11)]:
        p = interlaced_gif(w, h, seed)
        assert is_plain_gif(p)
        assert decode_gif_image(p) == decode_gif_image(
            _gif_bytes(w, h, seed=seed)
        ), (w, h, seed)


@settings(max_examples=30, deadline=None)
@given(
    w=st.integers(1, 20),
    h=st.integers(1, 16),
    interlaced=st.booleans(),
    data=st.data(),
)
def test_png_decode_roundtrip_property(w, h, interlaced, data):
    """Property: ANY 8-bit RGB image, encoded with ANY per-row filter
    choice, sequential or Adam7-interlaced, decodes back bit-exact."""
    import numpy as np

    from data_warehouse_hive_spark.sources.multimodal import (
        decode_png_pixels,
        is_plain_png,
    )

    flat = data.draw(
        st.lists(
            st.integers(0, 255), min_size=w * h * 3, max_size=w * h * 3
        )
    )
    img = np.asarray(flat, dtype=np.uint8).reshape(h, w, 3)
    filters = tuple(
        data.draw(st.lists(st.integers(0, 4), min_size=1, max_size=5))
    )
    p = (
        _interlaced_png(img, filters)
        if interlaced
        else _png_with_filters(img, list(filters))
    )
    assert is_plain_png(p)
    assert (decode_png_pixels(p) == img).all()


def test_bogus_dimension_headers_fail_closed():
    """A tiny payload claiming absurd dimensions must fail the GATE
    (→ deterministic fake downstream), not die as a multi-GB
    allocation; an IDAT stream inflating past the header-implied size
    (deflate bomb) must raise ValueError from the capped decompressor."""
    import zlib

    from data_warehouse_hive_spark.sources.multimodal import (
        _gif_bytes,
        _png_bytes,
        decode_png_image,
        fake_decode_image,
        is_plain_gif,
        is_plain_png,
        native_image_decode,
    )

    # PNG claiming 100000×100000 (> _MAX_NATIVE_PIXELS): gate rejects
    p = bytearray(_png_bytes(4, 4, seed=1))
    struct.pack_into(">II", p, 16, 100000, 100000)  # IHDR w,h
    assert not is_plain_png(bytes(p))
    assert native_image_decode(bytes(p)) is None  # falls to fake/Pillow

    # GIF frame descriptor claiming 65535×65535: gate rejects.  The
    # descriptor sits at a fixed offset here: 13-byte header + 768-byte
    # global color table (0x2C bytes occur inside the palette, so
    # searching would hit the wrong spot).
    g = bytearray(_gif_bytes(4, 4, seed=1))
    i = 13 + 768
    assert g[i] == 0x2C
    struct.pack_into("<HH", g, i + 5, 65535, 65535)
    assert not is_plain_gif(bytes(g))

    # deflate bomb inside legit dims: IDAT inflates past the
    # header-implied size → ValueError (capped decompress), never a
    # giant allocation; the pipeline fallback is the deterministic fake
    def chunk(t, body):
        return (
            struct.pack(">I", len(body)) + t + body
            + struct.pack(">I", zlib.crc32(t + body))
        )

    ihdr = struct.pack(">IIBBBBB", 4, 4, 8, 2, 0, 0, 0)
    oversized = zlib.compress(bytes(4 * (1 + 12)) + b"\x00" * 100000)
    bomb = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", oversized)
        + chunk(b"IEND", b"")
    )
    assert is_plain_png(bomb)  # structurally fine…
    import pytest

    with pytest.raises(ValueError):
        decode_png_image(bomb)
    # …and the documented pipeline-side behavior is the fake
    assert fake_decode_image(bomb) is not None


def test_png_truncated_adler_trailer_raises():
    """A zlib stream cut inside its adler32 trailer inflates to exactly
    the expected byte count but never reaches end-of-stream — the capped
    decompressor must stay as strict as zlib.decompress was (dobj.eof),
    keeping corrupt data loud."""
    import zlib

    import pytest

    from data_warehouse_hive_spark.sources.multimodal import (
        _png_bytes,
        decode_png_image,
        is_plain_png,
    )

    def chunk(t, body):
        return (
            struct.pack(">I", len(body)) + t + body
            + struct.pack(">I", zlib.crc32(t + body))
        )

    p = _png_bytes(4, 4, seed=1)
    i = p.index(b"IDAT") - 4
    ln = int.from_bytes(p[i : i + 4], "big")
    idat = p[i + 8 : i + 8 + ln]
    rebuilt = p[:i] + chunk(b"IDAT", idat[:-4]) + chunk(b"IEND", b"")
    assert is_plain_png(rebuilt)  # structurally complete…
    with pytest.raises(ValueError):  # …but the stream never finishes
        decode_png_image(rebuilt)


def test_png_trailing_garbage_after_zlib_stream_raises():
    """A COMPLETE valid zlib stream with garbage (or a second stream)
    appended inside IDAT inflates to exactly the expected byte count
    with eof reached — only dobj.unused_data distinguishes it from a
    clean payload.  'Corrupt data stays loud' (r13 ADVICE): it must
    raise, never decode silently."""
    import struct
    import zlib

    import pytest

    from data_warehouse_hive_spark.sources.multimodal import (
        _png_bytes,
        decode_png_image,
        is_plain_png,
    )

    def chunk(t, body):
        return (
            struct.pack(">I", len(body)) + t + body
            + struct.pack(">I", zlib.crc32(t + body))
        )

    p = _png_bytes(4, 4, seed=3)
    i = p.index(b"IDAT") - 4
    ln = int.from_bytes(p[i : i + 4], "big")
    idat = p[i + 8 : i + 8 + ln]
    for tail in (b"\x00garbage after the stream", idat):
        rebuilt = (
            p[:i] + chunk(b"IDAT", idat + tail) + chunk(b"IEND", b"")
        )
        assert is_plain_png(rebuilt)  # structurally complete…
        with pytest.raises(ValueError):  # …but the payload is dirty
            decode_png_image(rebuilt)


def test_png_scalar_filter_cpu_budget(monkeypatch):
    """The Average/Paeth unfilter loops are interpreted per-byte; the
    byte budget (r13 ADVICE) bounds their cost so an adversarial
    all-Paeth image raises ValueError (→ pipeline fake) instead of
    stalling an executor for minutes.  Vectorized filter rows
    (None/Sub/Up) are numpy cost and must stay unmetered."""
    import numpy as np
    import pytest

    from data_warehouse_hive_spark.sources import multimodal as mm

    rng = np.random.RandomState(11)
    pxmat = rng.randint(0, 256, size=(9, 11, 3)).astype(np.uint8)
    monkeypatch.setattr(mm, "_MAX_SCALAR_FILTER_BYTES", 64)
    for scalar in ([3], [4]):  # 9 rows × 33 bytes = 297 > 64
        with pytest.raises(ValueError, match="CPU budget"):
            mm.decode_png_pixels(_png_with_filters(pxmat, scalar))
    for vector in ([0], [1], [2]):  # unmetered vectorized paths
        got = mm.decode_png_pixels(_png_with_filters(pxmat, vector))
        assert (got == pxmat).all()
    # one scalar row under the budget still decodes — the budget meters
    # cumulative scalar bytes, not the mere presence of a scalar filter
    got = mm.decode_png_pixels(_png_with_filters(pxmat, [4] + [0] * 8))
    assert (got == pxmat).all()


def test_gif_gate_caps_lzw_pixels():
    """GIF decode cost is ~one interpreted loop iteration per pixel, so
    its gate caps at _MAX_SCALAR_PIXELS (4M), tighter than the
    allocation-only _MAX_NATIVE_PIXELS the vectorized decoders use: a
    frame descriptor claiming 3000×3000 (9M px — fine memory-wise,
    minutes of LZW CPU) must fail the gate and fall to the codec
    path / deterministic fake."""
    import struct

    from data_warehouse_hive_spark.sources.multimodal import (
        _MAX_SCALAR_PIXELS,
        _gif_bytes,
        is_plain_gif,
        native_image_decode,
    )

    assert 3000 * 3000 > _MAX_SCALAR_PIXELS
    g = bytearray(_gif_bytes(4, 4, seed=2))
    i = 13 + 768  # fixed offset: header + global color table
    assert g[i] == 0x2C
    struct.pack_into("<HH", g, i + 5, 3000, 3000)
    assert not is_plain_gif(bytes(g))
    assert native_image_decode(bytes(g)) is None


def test_wav_short_fmt_chunk_rejected():
    """A fmt chunk whose declared length is under the 16-byte PCM
    layout cannot carry the format fields; reading them anyway would
    misinterpret the NEXT chunk's header bytes as format fields (r13
    ADVICE).  The shared chunk walk must reject the payload, for the
    gate and therefore the decoder."""
    import struct

    from data_warehouse_hive_spark.sources.multimodal import (
        _wav_pcm_chunks,
        is_plain_wav_pcm,
    )

    samples = struct.pack("<4h", 100, -200, 300, -400)
    # fmt claims clen=4: the bytes that a fixed-offset read would
    # interpret as bits-per-sample actually belong to the data header
    bad_fmt = b"fmt " + struct.pack("<I", 4) + struct.pack("<HH", 1, 1)
    data = b"data" + struct.pack("<I", len(samples)) + samples
    body = b"WAVE" + bad_fmt + data
    payload = b"RIFF" + struct.pack("<I", len(body)) + body
    assert _wav_pcm_chunks(payload) is None
    assert not is_plain_wav_pcm(payload)

    # control: the same container with a full 16-byte fmt chunk passes
    good_fmt = b"fmt " + struct.pack("<I", 16) + struct.pack(
        "<HHIIHH", 1, 1, 8000, 16000, 2, 16
    )
    body = b"WAVE" + good_fmt + data
    payload = b"RIFF" + struct.pack("<I", len(body)) + body
    assert is_plain_wav_pcm(payload)


def _png16_with_filters(pxmat16, filters, color_type):
    """Independent 16-bit PNG encoder for the tests (big-endian
    samples, byte-wise filters with bpp = channels*2 per spec §9),
    straight-line like _png_with_filters so the decoder must invert a
    second implementation, not itself."""
    import zlib

    import numpy as np

    h, w, ch = pxmat16.shape
    bpp = ch * 2
    raw = bytearray()
    prev = np.zeros(w * bpp, np.int64)
    for y in range(h):
        line = np.frombuffer(
            pxmat16[y].astype(">u2").tobytes(), dtype=np.uint8
        ).astype(np.int64)
        ft = filters[y % len(filters)]
        raw.append(ft)
        out_line = np.zeros(w * bpp, np.int64)
        for x in range(w * bpp):
            a = int(out_line[x - bpp]) if x >= bpp else 0
            b = int(prev[x])
            c = int(prev[x - bpp]) if x >= bpp else 0
            if ft == 0:
                pred = 0
            elif ft == 1:
                pred = a
            elif ft == 2:
                pred = b
            elif ft == 3:
                pred = (a + b) // 2
            else:
                pa, pb, pc = abs(b - c), abs(a - c), abs(a + b - 2 * c)
                pred = a if pa <= pb and pa <= pc else (b if pb <= pc else c)
            raw.append((int(line[x]) - pred) % 256)
            out_line[x] = line[x]
        prev = line

    def chunk(t, body):
        return (
            struct.pack(">I", len(body)) + t + body
            + struct.pack(">I", zlib.crc32(t + body))
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 16, color_type, 0, 0, 0)
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(raw)))
        + chunk(b"IEND", b"")
    )


def test_png_16bit_decode_all_filters():
    """16-bit PNG (r13 VERDICT task 4): gate accepts depth 16 for the
    non-palette color types, decode returns exact uint16 samples
    through every filter type — the filter arithmetic is byte-wise
    with the left-distance scaled to channels*2."""
    import numpy as np

    from data_warehouse_hive_spark.sources.multimodal import (
        decode_png_pixels,
        is_plain_png,
    )

    rng = np.random.RandomState(23)
    for ch, ctype in ((1, 0), (3, 2), (2, 4), (4, 6)):
        pxmat = rng.randint(0, 65536, size=(7, 9, ch)).astype(np.uint16)
        for filters in ([0], [1], [2], [3], [4], [0, 1, 2, 3, 4]):
            p = _png16_with_filters(pxmat, filters, ctype)
            assert is_plain_png(p), (ctype, filters)
            got = decode_png_pixels(p)
            assert got.dtype == np.uint16
            assert (got == pxmat).all(), (ctype, filters)


def test_png_16bit_feature_bits_match_8bit_twin():
    """A 16-bit image whose samples are v·257 (the spec's exact
    widening of 8-bit v) must produce bit-identical features to its
    8-bit twin — the 1/257 scale is exact in float64 because
    257·255 = 65535."""
    import numpy as np

    from data_warehouse_hive_spark.sources.multimodal import (
        decode_png_image,
    )

    rng = np.random.RandomState(29)
    px8 = rng.randint(0, 256, size=(6, 10, 3)).astype(np.uint8)
    p8 = _png_with_filters(px8, [0, 2, 1])
    p16 = _png16_with_filters(
        (px8.astype(np.uint16) * 257), [0, 2, 1], 2
    )
    assert decode_png_image(p16) == decode_png_image(p8)


def test_png_16bit_palette_rejected():
    """Depth-16 palette is illegal per the PNG spec (index depth ≤ 8);
    the gate must reject it rather than hand the decoder a palette
    lookup on 16-bit indices."""
    from data_warehouse_hive_spark.sources.multimodal import (
        is_plain_png,
    )

    # take a valid 16-bit grayscale container and flip its color type
    # to 3 with a PLTE bolted on — structurally complete, semantically
    # illegal
    import struct as _s
    import zlib

    import numpy as np

    px = np.zeros((2, 2, 1), dtype=np.uint16)
    p = bytearray(_png16_with_filters(px, [0], 0))
    p[8 + 4 + 4 + 9] = 3  # IHDR color-type byte

    def chunk(t, body):
        return (
            _s.pack(">I", len(body)) + t + body
            + _s.pack(">I", zlib.crc32(t + body))
        )

    i = bytes(p).index(b"IDAT") - 4
    rebuilt = bytes(p[:i]) + chunk(b"PLTE", b"\x00" * 768) + bytes(p[i:])
    assert not is_plain_png(rebuilt)


# ---------------------------------------------------------------------------
# JPEG (r14): independent straight-line baseline encoder — double-loop
# DCT, its own huffman table layout and bit packer — so the decoder
# must invert a second implementation, not itself (the
# _png_with_filters pattern).


def _jpeg_ref_tables():
    """Uniform-length canonical tables: 12 DC categories at 4 bits,
    the full 162-symbol AC alphabet at 8 bits — legal per spec §C.2
    and trivially independent of the decoder's table builder."""
    dc_counts = bytes([0, 0, 0, 12] + [0] * 12)
    dc_values = bytes(range(12))
    ac_counts = bytes([0] * 7 + [162] + [0] * 8)
    ac_values = bytes(
        [0x00, 0xF0]
        + [(r << 4) | s for r in range(16) for s in range(1, 11)]
    )
    return (dc_counts, dc_values), (ac_counts, ac_values)


_JPEG_REF_ZZ = [
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
]


class _JpegRefWriter:
    """MSB-first bit packer with FF00 stuffing + restart emission."""

    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def put(self, val, nbits):
        for b in range(nbits - 1, -1, -1):
            self.acc = (self.acc << 1) | ((val >> b) & 1)
            self.n += 1
            if self.n == 8:
                self.out.append(self.acc)
                if self.acc == 0xFF:
                    self.out.append(0x00)
                self.acc = 0
                self.n = 0

    def pad_and_rst(self, idx):
        while self.n:
            self.put(1, 1)
        self.out += bytes([0xFF, 0xD0 + (idx & 7)])

    def done(self):
        while self.n:
            self.put(1, 1)
        return bytes(self.out)


def _jpeg_ref_fdct_quant(block, q):
    """Straight-line double-loop DCT-II + quantize: independent of the
    decoder's einsum path."""
    import math

    out = [[0] * 8 for _ in range(8)]
    for u in range(8):
        for v in range(8):
            s = 0.0
            for x in range(8):
                for y in range(8):
                    s += (
                        (block[x][y] - 128.0)
                        * math.cos((2 * x + 1) * u * math.pi / 16)
                        * math.cos((2 * y + 1) * v * math.pi / 16)
                    )
            cu = 1 / math.sqrt(2) if u == 0 else 1.0
            cv = 1 / math.sqrt(2) if v == 0 else 1.0
            out[u][v] = round(0.25 * cu * cv * s / q)
    return out


def _jpeg_ref_encode_block(w, coefs, pred, dclut, aclut):
    flat = [coefs[i // 8][i % 8] for i in range(64)]
    zz = [flat[_JPEG_REF_ZZ[k]] for k in range(64)]

    def put_val(x, sym_base, lut):
        s = abs(x).bit_length()
        ln, code = lut[sym_base | s]
        w.put(code, ln)
        if s:
            w.put(x if x > 0 else x + (1 << s) - 1, s)

    put_val(zz[0] - pred, 0, dclut)
    run = 0
    for k in range(1, 64):
        if zz[k] == 0:
            run += 1
            continue
        while run > 15:
            ln, code = aclut[0xF0]
            w.put(code, ln)
            run -= 16
        put_val(zz[k], run << 4, aclut)
        run = 0
    if run:
        ln, code = aclut[0x00]
        w.put(code, ln)
    return zz[0]


def _jpeg_ref_bytes(
    ypx, q=8, subsample=False, cb=None, cr=None, dri=0
):
    """Independent baseline encoder: grayscale by default; with
    subsample=True, a 3-component 4:2:0 frame whose chroma planes
    default to flat 128 (all-zero coefficients).  Returns the payload
    AND the quantized luma coefficient blocks (natural order) so the
    test can compute the expected decode independently."""
    import struct

    h = len(ypx)
    w_ = len(ypx[0])
    (dcc, dcv), (acc_, acv) = _jpeg_ref_tables()
    dclut = {s: (4, c) for c, s in enumerate(dcv)}
    aclut = {s: (8, c) for c, s in enumerate(acv)}

    mh = 2 if subsample else 1
    bw = -(-w_ // (8 * mh)) * mh
    bh = -(-h // (8 * mh)) * mh

    def block_at(px, by, bx, default=128):
        return [
            [
                (
                    px[min(by * 8 + x, len(px) - 1)][
                        min(bx * 8 + y, len(px[0]) - 1)
                    ]
                    if px
                    else default
                )
                for y in range(8)
            ]
            for x in range(8)
        ]

    wtr = _JpegRefWriter()
    ycoef_blocks = {}
    preds = {1: 0, 2: 0, 3: 0}
    mcux = bw // mh
    mcuy = bh // mh
    rst = 0
    for m in range(mcux * mcuy):
        if dri and m and m % dri == 0:
            wtr.pad_and_rst(rst)
            rst = (rst + 1) & 7
            preds = {1: 0, 2: 0, 3: 0}
        my, mx = divmod(m, mcux)
        for by in range(mh):
            for bx in range(mh):
                c = _jpeg_ref_fdct_quant(
                    block_at(ypx, my * mh + by, mx * mh + bx), q
                )
                ycoef_blocks[(my * mh + by, mx * mh + bx)] = c
                preds[1] = _jpeg_ref_encode_block(
                    wtr, c, preds[1], dclut, aclut
                )
        if subsample:
            for cid, plane in ((2, cb), (3, cr)):
                c = _jpeg_ref_fdct_quant(
                    block_at(plane or [], my, mx), q
                )
                preds[cid] = _jpeg_ref_encode_block(
                    wtr, c, preds[cid], dclut, aclut
                )
    data = wtr.done()

    ncomp = 3 if subsample else 1
    out = bytearray(b"\xff\xd8")
    out += (
        b"\xff\xdb" + struct.pack(">H", 67) + bytes([0]) + bytes([q] * 64)
    )
    sof = bytes([8]) + struct.pack(">HH", h, w_) + bytes([ncomp])
    sof += bytes([1, (mh << 4) | mh, 0])
    if subsample:
        sof += bytes([2, 0x11, 0, 3, 0x11, 0])
    out += b"\xff\xc0" + struct.pack(">H", 2 + len(sof)) + sof
    for tcth, (counts, values) in ((0x00, (dcc, dcv)), (0x10, (acc_, acv))):
        out += (
            b"\xff\xc4"
            + struct.pack(">H", 2 + 1 + 16 + len(values))
            + bytes([tcth])
            + counts
            + values
        )
    if dri:
        out += b"\xff\xdd" + struct.pack(">HH", 4, dri)
    sos = bytes([ncomp])
    for cid in range(1, ncomp + 1):
        sos += bytes([cid, 0x00])
    sos += bytes([0, 63, 0])
    out += b"\xff\xda" + struct.pack(">H", 2 + len(sos)) + sos
    out += data + b"\xff\xd9"
    return bytes(out), ycoef_blocks


def _jpeg_ref_expected_plane(ycoef_blocks, q, h, w_):
    """Independent IDCT of the quantized coefficients (double loop) —
    what a correct decoder must produce, up to float64 rounding at
    exact-.5 boundaries."""
    import math

    bh = max(k[0] for k in ycoef_blocks) + 1
    bw = max(k[1] for k in ycoef_blocks) + 1
    plane = [[0] * (bw * 8) for _ in range(bh * 8)]
    for (by, bx), c in ycoef_blocks.items():
        for x in range(8):
            for y in range(8):
                s = 0.0
                for u in range(8):
                    for v in range(8):
                        cu = 1 / math.sqrt(2) if u == 0 else 1.0
                        cv = 1 / math.sqrt(2) if v == 0 else 1.0
                        s += (
                            cu * cv * c[u][v] * q
                            * math.cos((2 * x + 1) * u * math.pi / 16)
                            * math.cos((2 * y + 1) * v * math.pi / 16)
                        )
                val = round(0.25 * s + 128)
                plane[by * 8 + x][bx * 8 + y] = min(255, max(0, val))
    return [row[:w_] for row in plane[:h]]


def test_jpeg_sniff_and_gate():
    from data_warehouse_hive_spark.sources.multimodal import (
        _jpeg_bytes,
        is_plain_jpeg,
        sniff_image_meta,
    )

    p = _jpeg_bytes(17, 9, seed=42)
    assert sniff_image_meta(p) == ("jpeg", 17, 9)
    assert is_plain_jpeg(p)
    # truncated payloads (no EOI / mid-segment cut) must fail the gate
    assert not is_plain_jpeg(p[:-2])
    assert not is_plain_jpeg(p[:20])
    assert not is_plain_jpeg(b"\xff\xd8\xff\xd9")
    # progressive (SOF2) and 12-bit precision stay behind the stub
    prog = bytearray(p)
    i = prog.index(b"\xff\xc0")
    prog[i + 1] = 0xC2
    assert not is_plain_jpeg(bytes(prog))
    twelve = bytearray(p)
    twelve[i + 4] = 12  # precision byte
    assert not is_plain_jpeg(bytes(twelve))


def test_jpeg_decode_matches_independent_reference():
    """Decoder (huffman → dequant → einsum IDCT) vs the test's own
    double-loop IDCT of the same quantized coefficients: every pixel
    within ±1 (float64 summation-order at exact-.5 boundaries), and
    the overwhelming majority exact."""
    import numpy as np

    from data_warehouse_hive_spark.sources.multimodal import (
        decode_jpeg_pixels,
        is_plain_jpeg,
    )

    rng = np.random.RandomState(31)
    ypx = rng.randint(0, 256, size=(21, 13)).tolist()
    payload, ycoefs = _jpeg_ref_bytes(ypx, q=8)
    assert is_plain_jpeg(payload)
    got = decode_jpeg_pixels(payload)
    exp = np.array(_jpeg_ref_expected_plane(ycoefs, 8, 21, 13))
    diff = np.abs(got.astype(np.int64) - exp)
    assert diff.max() <= 1
    assert (diff == 0).mean() > 0.95


def test_jpeg_420_subsampling_luma():
    """3-component 4:2:0: the decoder must walk chroma blocks to stay
    bit-synchronized, and its luma output must match the grayscale
    encoding of the same Y plane (chroma flat at 128 → zero
    coefficients)."""
    import numpy as np

    from data_warehouse_hive_spark.sources.multimodal import (
        decode_jpeg_pixels,
        is_plain_jpeg,
    )

    rng = np.random.RandomState(37)
    ypx = rng.randint(0, 256, size=(19, 22)).tolist()
    color, _ = _jpeg_ref_bytes(ypx, q=8, subsample=True)
    gray, _ = _jpeg_ref_bytes(ypx, q=8)
    assert is_plain_jpeg(color) and is_plain_jpeg(gray)
    got_color = decode_jpeg_pixels(color)
    got_gray = decode_jpeg_pixels(gray)
    assert got_color.shape == (19, 22)
    # 4:2:0 pads the luma grid to 16-pixel MCUs; the cropped planes
    # agree wherever both encoders saw the same source block
    assert (got_color[:16, :16] == got_gray[:16, :16]).all()


def test_jpeg_restart_markers():
    """A DRI=2 stream (RST markers every 2 MCUs, DC predictors reset)
    must decode to exactly the same plane as the unrestarted stream."""
    import numpy as np

    from data_warehouse_hive_spark.sources.multimodal import (
        decode_jpeg_pixels,
    )

    rng = np.random.RandomState(41)
    ypx = rng.randint(0, 256, size=(24, 32)).tolist()
    plain, _ = _jpeg_ref_bytes(ypx, q=8)
    restarted, _ = _jpeg_ref_bytes(ypx, q=8, dri=2)
    assert b"\xff\xd0" in restarted or b"\xff\xd1" in restarted
    assert (
        decode_jpeg_pixels(plain) == decode_jpeg_pixels(restarted)
    ).all()


def test_jpeg_corrupt_stream_raises():
    import pytest

    from data_warehouse_hive_spark.sources.multimodal import (
        _jpeg_bytes,
        decode_jpeg_pixels,
        is_plain_jpeg,
    )

    p = _jpeg_bytes(32, 24, seed=5)
    i = p.index(b"\xff\xda") + 10  # inside the entropy segment
    # replace the tail of the entropy data with a byte pattern whose
    # first full AC lookup is code 162 at length 8 — outside the
    # 162-entry table (codes 0..161), and no longer code matches either
    corrupt = p[:i] + b"\xa2" * (len(p) - i - 2) + b"\xff\xd9"
    assert is_plain_jpeg(corrupt)  # structurally complete…
    with pytest.raises(ValueError):  # …but the huffman stream is junk
        decode_jpeg_pixels(corrupt)


def test_jpeg_cpu_pixel_cap_gates():
    """JPEG huffman decode is an interpreted per-symbol loop, so the
    gate caps at _MAX_SCALAR_PIXELS like GIF LZW."""
    import struct

    from data_warehouse_hive_spark.sources.multimodal import (
        _MAX_SCALAR_PIXELS,
        _jpeg_bytes,
        is_plain_jpeg,
        native_image_decode,
    )

    p = bytearray(_jpeg_bytes(8, 8, seed=1))
    i = bytes(p).index(b"\xff\xc0")
    struct.pack_into(">HH", p, i + 5, 3000, 3000)  # h, w in SOF
    assert 3000 * 3000 > _MAX_SCALAR_PIXELS
    assert not is_plain_jpeg(bytes(p))
    assert native_image_decode(bytes(p)) is None


def test_extract_features_native_jpeg(spark):
    """Distributed extract_features over synthesized baseline JPEGs
    must equal the driver-side decode of the same bytes bit-for-bit —
    the same contract the BMP/PNG/GIF twins pin."""
    from pyspark.sql import Row

    from data_warehouse_hive_spark.sources.multimodal import (
        _jpeg_bytes,
        decode_jpeg_image,
        extract_features,
    )

    rows = [
        Row(
            media_id=m,
            kind="image",
            payload=_jpeg_bytes((m * 13) % 60 + 4, (m * 7) % 40 + 4, seed=m),
        )
        for m in range(1, 9)
    ]
    media = spark.createDataFrame(rows)
    got = {
        r["media_id"]: list(r["feature"])
        for r in extract_features(media).collect()
    }
    assert len(got) == 8
    for m in range(1, 9):
        exp = decode_jpeg_image(
            _jpeg_bytes((m * 13) % 60 + 4, (m * 7) % 40 + 4, seed=m)
        )
        assert got[m] == exp, m
