"""Extension-operator semantics beyond the oracle checks: planted
near-duplicates for MinHash/SimHash recall, IVF recall vs brute force,
multimodal stub contract."""

from __future__ import annotations

import pytest

from pyspark.sql import Row
from pyspark.sql import functions as F

from data_warehouse_hive_spark.extensions.dedup import (
    LSH_BANDS,
    LSH_ROWS,
    MINHASH_K,
    normalized_text,
    shingles,
    signature,
)
from data_warehouse_hive_spark.registry import load_all
from data_warehouse_hive_spark.tables import t

REGISTRY = load_all()


def test_minhash_finds_planted_near_duplicates(spark):
    base = (
        "the quick brown fox jumps over the lazy dog while the rain "
        "falls gently on the quiet green hills of the northern valley "
        "and the river runs slowly toward the distant silver sea"
    )
    near_dup = base.replace("silver", "golden")  # 1-word edit
    unrelated = (
        "completely different content about database engines columnar "
        "storage vectorized execution adaptive query planning and the "
        "cost based optimization of distributed analytical workloads"
    )
    docs = spark.createDataFrame(
        [
            Row(doc_id=1, text=base),
            Row(doc_id=2, text=near_dup),
            Row(doc_id=3, text=unrelated),
            Row(doc_id=4, text=base),  # exact dup
        ]
    )
    sig = signature(docs)
    rows = {r["doc_id"]: [r[f"mh_{j}"] for j in range(MINHASH_K)] for r in sig.collect()}
    assert rows[1] == rows[4]  # exact dup → identical signature
    # near-dup shares most minhashes; unrelated shares ~none
    shared_near = sum(a == b for a, b in zip(rows[1], rows[2]))
    shared_far = sum(a == b for a, b in zip(rows[1], rows[3]))
    assert shared_near >= MINHASH_K // 2 > shared_far
    # and at least one full band collides for the near-dup pair
    bands_1 = [tuple(rows[1][b * LSH_ROWS : (b + 1) * LSH_ROWS]) for b in range(LSH_BANDS)]
    bands_2 = [tuple(rows[2][b * LSH_ROWS : (b + 1) * LSH_ROWS]) for b in range(LSH_BANDS)]
    assert any(x == y for x, y in zip(bands_1, bands_2))


def test_shingles_cover_short_docs(spark):
    docs = spark.createDataFrame([Row(doc_id=1, text="only two")])
    sh = docs.select(shingles(normalized_text("text"), 3).alias("s")).collect()[0]["s"]
    assert sh == ["only two"]


def test_ivf_recall_on_planted_clusters(spark):
    """IVF recall ≈ 1.0 when cells reflect real neighborhood structure
    (10 planted clusters, points = center + small noise)."""
    import random

    from data_warehouse_hive_spark.extensions.similarity import (
        brute_force_topk,
        ivf_topk,
    )

    rng = random.Random(7)
    dim, n_clusters, per_cluster = 16, 10, 30
    centers = [
        [rng.uniform(-1, 1) for _ in range(dim)] for _ in range(n_clusters)
    ]
    rows = []
    vid = 0
    for c_idx, center in enumerate(centers):
        for _ in range(per_cluster):
            vec = [x + rng.gauss(0, 0.05) for x in center]
            rows.append(Row(vec_id=vid, label=c_idx, e=vec))
            vid += 1
    v = spark.createDataFrame(rows)
    q = v.filter(F.col("vec_id") % per_cluster == 0).select(
        F.col("vec_id").alias("query_id"), F.col("e").alias("qe")
    )
    exact = {
        (r["query_id"], r["vec_id"]) for r in brute_force_topk(v, q, 5).collect()
    }
    approx = {
        (r["query_id"], r["vec_id"]) for r in ivf_topk(v, q, 5, n_probe=1).collect()
    }
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.9, f"IVF recall {recall:.2f}"


def test_ivf_fixture_pipeline_invariants(spark, sf_dir):
    """On the driver fixture (random labels → no cluster structure) the
    IVF *pipeline* invariants still hold: ≤k results per query, ranks
    contiguous from 1, cosine non-increasing in rank."""
    out = REGISTRY["q_sim_search_ivf"].fn(spark, sf_dir).collect()
    assert out
    by_q = {}
    for r in out:
        by_q.setdefault(r["query_id"], []).append(r)
    for rows in by_q.values():
        rows.sort(key=lambda r: r["rk"])
        assert [r["rk"] for r in rows] == list(range(1, len(rows) + 1))
        cosines = [r["cosine"] for r in rows]
        assert cosines == sorted(cosines, reverse=True)


def test_simhash_hamming_close_for_near_dups(spark):
    a = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    b = a.replace("kappa", "lambda")
    c = "totally different words describing unrelated subject matter entirely"
    docs = spark.createDataFrame(
        [Row(doc_id=1, text=a), Row(doc_id=2, text=b), Row(doc_id=3, text=c)]
    )
    docs.createOrReplaceTempView("_simhash_docs")
    import data_warehouse_hive_spark.extensions.dedup as dd

    # reuse the registered query's logic by swapping the table
    orig_t = dd.t
    dd.t = lambda spark_, sf_, name_: docs
    try:
        out = {r["doc_id"]: r["simhash16"] for r in REGISTRY["q_dedup_simhash"].fn(spark, "unused").collect()}
    finally:
        dd.t = orig_t
    ham_ab = bin(out[1] ^ out[2]).count("1")
    ham_ac = bin(out[1] ^ out[3]).count("1")
    assert ham_ab < ham_ac


def test_multimodal_real_decoder_is_stubbed(spark):
    from data_warehouse_hive_spark.sources.multimodal import (
        decode_image,
        extract_features,
        fake_decode_image,
        real_decoder_available,
    )

    assert not real_decoder_available()  # this container ships no codec
    with pytest.raises(NotImplementedError):
        decode_image(b"\x89PNG...")
    # deterministic fake: same payload → same feature, cross-process
    assert fake_decode_image(b"abc") == fake_decode_image(b"abc")
    media = spark.createDataFrame(
        [Row(media_id=1, kind="image", payload=b"abc", width=1, height=1, duration_ms=0)]
    )
    # default (auto-detect) degrades to the fake here
    feats = extract_features(media).collect()
    assert len(feats) == 1 and len(feats[0]["feature"]) == 8
    with pytest.raises(Exception):
        extract_features(media, use_real_decoder=True).collect()


def test_multimodal_real_decoder_branch_plumbing(monkeypatch):
    """Exercise the REAL-decoder branch by monkeypatching a fake Pillow:
    decode_image must honor the (list[float], FEATURE_DIM) contract the
    mapInPandas schema expects, so a deployment with the codec installed
    changes zero Spark code."""
    import sys
    import types

    from data_warehouse_hive_spark.sources import multimodal as mm

    class _FakeImg:
        def convert(self, mode):
            assert mode == "L"
            return self

        def resize(self, wh):
            assert wh == (mm.FEATURE_DIM, 1)
            return self

        def getdata(self):
            return list(range(mm.FEATURE_DIM))

    fake_image_mod = types.ModuleType("PIL.Image")
    fake_image_mod.open = lambda fp: _FakeImg()
    fake_pil = types.ModuleType("PIL")
    fake_pil.Image = fake_image_mod
    monkeypatch.setitem(sys.modules, "PIL", fake_pil)
    monkeypatch.setitem(sys.modules, "PIL.Image", fake_image_mod)

    assert mm.real_decoder_available()
    feat = mm.decode_image(b"\x89PNG fake payload")
    assert len(feat) == mm.FEATURE_DIM
    assert all(isinstance(x, float) for x in feat)
    assert feat == [i / 255.0 for i in range(mm.FEATURE_DIM)]


def test_minhash_capped_equals_uncapped_at_infinite_cap(spark, sf_dir):
    """The capped generator is the SAME algebra as q_dedup_minhash with an
    admission filter — so with a cap no bucket reaches, the pair set must
    equal the uncapped one exactly and the audit must be all-zero."""
    from data_warehouse_hive_spark.extensions.dedup import (
        minhash_candidate_pairs,
        minhash_candidate_pairs_capped,
    )

    docs = t(spark, sf_dir, "documents")
    pairs, audit = minhash_candidate_pairs_capped(docs, cap=10**6)
    a = audit.collect()[0]
    assert (a["skipped_buckets"], a["skipped_pair_work"], a["skipped_docs"]) == (
        0, 0, 0,
    )
    uncapped = minhash_candidate_pairs(docs)
    assert pairs.exceptAll(uncapped).count() == 0
    assert uncapped.exceptAll(pairs).count() == 0


def test_minhash_capped_bounds_pair_work(spark, sf_dir):
    """With cap c, no emitted pair can come from a bucket of size > c —
    equivalently, pairs(cap) ⊆ pairs(∞) and the emitted count at the demo
    cap is strictly below the uncapped count when any bucket was skipped."""
    from data_warehouse_hive_spark.extensions.dedup import (
        _CAPPED_DEMO_CAP,
        minhash_candidate_pairs,
        minhash_candidate_pairs_capped,
    )

    docs = t(spark, sf_dir, "documents")
    pairs, audit = minhash_candidate_pairs_capped(docs, cap=_CAPPED_DEMO_CAP)
    a = audit.collect()[0]
    n_capped = pairs.count()
    n_uncapped = minhash_candidate_pairs(docs).count()
    assert pairs.exceptAll(minhash_candidate_pairs(docs)).count() == 0
    if a["skipped_buckets"] > 0:
        assert n_capped < n_uncapped


def test_exact_dedup_survivor_is_min_doc_id(spark, sf_dir):
    out = REGISTRY["q_dedup_exact"].fn(spark, sf_dir)
    dupes = out.filter(F.col("n_copies") > 1)
    # fixture corpus may or may not contain exact dups; invariant holds
    # either way: every group's survivor is its min doc_id and fingerprint
    # count equals distinct normalized texts
    n_docs = t(spark, sf_dir, "documents").count()
    assert out.agg(F.sum("n_copies")).collect()[0][0] == n_docs
    assert dupes.filter(F.col("keep_doc_id").isNull()).count() == 0


def test_arrow_brute_force_matches_jvm(spark, sf_dir):
    """The numpy/mapInPandas brute-force path returns the same top-k sets
    and (6-dp) cosines as the JVM zip_with/aggregate fold."""
    from data_warehouse_hive_spark.extensions.similarity import (
        TOP_K,
        _fixture_corpus,
        brute_force_topk,
        brute_force_topk_arrow,
    )

    v, q = _fixture_corpus(spark, sf_dir)
    jvm = brute_force_topk(v, q, TOP_K).toPandas()
    arrow = brute_force_topk_arrow(v, q, TOP_K).toPandas()
    key = ["query_id", "rk"]
    jvm = jvm.sort_values(key).reset_index(drop=True)
    arrow = arrow.sort_values(key).reset_index(drop=True)
    assert len(jvm) == len(arrow) > 0
    assert (jvm["vec_id"].values == arrow["vec_id"].values).all()
    assert (abs(jvm["cosine"].values - arrow["cosine"].values) <= 1e-6).all()


def test_audio_rms_windows_exact(spark):
    """Windowed RMS over byte-derived samples: distributed result equals
    plain-Python computation for a known payload."""
    import math

    from data_warehouse_hive_spark.sources.multimodal import audio_rms_windows

    payload = bytes(range(256)) * 2  # 512 samples -> 2 windows of 256
    media = spark.createDataFrame(
        [(1, "audio", bytearray(payload)), (2, "image", bytearray(b"xx"))],
        "media_id long, kind string, payload binary",
    )
    out = audio_rms_windows(media, samples_per_window=256).toPandas()
    # image row filtered out; audio row yields exactly 2 windows
    assert sorted(out["window_idx"]) == [0, 1]
    expected = math.sqrt(sum(b * b for b in range(256)) / 256)
    assert all(abs(r - expected) < 1e-9 for r in out["rms"])
    assert list(out["n_samples"]) == [256, 256]


def test_lsh_recall_on_planted_clusters(spark):
    """LSH-bucket recall on planted clusters: tight clusters land in the
    same hyperplane bucket with high probability, so bucket-restricted
    top-k recovers most of the exact neighbors; and every LSH result must
    be a subset-correct cosine (scores match brute force exactly)."""
    import random

    from data_warehouse_hive_spark.extensions.similarity import (
        brute_force_topk,
        lsh_topk,
    )

    rng = random.Random(11)
    dim, n_clusters, per_cluster = 64, 8, 40
    centers = [
        [rng.uniform(-1, 1) for _ in range(dim)] for _ in range(n_clusters)
    ]
    rows = []
    vid = 0
    for c_idx, center in enumerate(centers):
        for _ in range(per_cluster):
            vec = [x + rng.gauss(0, 0.03) for x in center]
            rows.append(Row(vec_id=vid, label=c_idx, e=vec))
            vid += 1
    v = spark.createDataFrame(rows)
    q = v.filter(F.col("vec_id") % per_cluster == 0).select(
        F.col("vec_id").alias("query_id"), F.col("e").alias("qe")
    )
    exact = brute_force_topk(v, q, 5).collect()
    lsh = lsh_topk(v, q, 5).collect()
    exact_pairs = {(r["query_id"], r["vec_id"]) for r in exact}
    lsh_pairs = {(r["query_id"], r["vec_id"]) for r in lsh}
    recall = len(exact_pairs & lsh_pairs) / len(exact_pairs)
    assert recall >= 0.7, f"LSH recall {recall:.2f}"
    # scores are EXACT wherever both returned the same pair
    exact_scores = {(r["query_id"], r["vec_id"]): r["cosine"] for r in exact}
    for r in lsh:
        key = (r["query_id"], r["vec_id"])
        if key in exact_scores:
            assert r["cosine"] == exact_scores[key]


def test_label_propagation_chain_and_iteration_guard(spark):
    """A long-chain component (worst-case diameter) must converge with a
    correct single group and a reported iteration count; a cap below the
    diameter must raise instead of returning unconverged labels."""
    from data_warehouse_hive_spark.extensions.dedup import min_label_propagation

    n = 9
    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)], "src long, dst long"
    )
    labels, iters = min_label_propagation(chain)
    rows = {r["doc"]: r["group_id"] for r in labels.collect()}
    assert rows == {i: 0 for i in range(n)}  # one component, min label 0
    assert 1 <= iters <= n  # diameter-bounded

    with pytest.raises(RuntimeError, match="did not converge"):
        min_label_propagation(chain, max_iterations=2)


def test_gopher_quality_rules_on_planted_docs(spark):
    """Each Gopher rule must independently reject its pathological doc and
    keep the one good doc (the fixture corpus never trips the rules, so
    the rejection paths need planted rows)."""
    from data_warehouse_hive_spark.extensions.curation import gopher_quality

    good = "the quick brown fox and the lazy dog " * 10  # ~90 words, stopwords
    rows = [
        ("good", good),
        ("too_short", "the and tiny"),
        ("symbols", "### " + "# ".join(["the and of a is to"] * 10)),
        ("bullets", "\n".join("- the item and of a is to here now" for _ in range(20))),
        ("no_stop", " ".join(f"zzz{i}" for i in range(80))),
    ]
    df = spark.createDataFrame(rows, "doc_id string, text string")
    out = {r["doc_id"]: r for r in gopher_quality(df).collect()}
    assert out["good"]["keep"] is True
    assert out["too_short"]["keep"] is False and out["too_short"]["n_tok"] < 50
    assert out["symbols"]["keep"] is False and out["symbols"]["symbol_ratio"] > 0.1
    assert out["bullets"]["keep"] is False and out["bullets"]["bullet_ratio"] > 0.9
    assert out["no_stop"]["keep"] is False and out["no_stop"]["stopword_hits"] == 0


def test_pii_redaction_on_planted_docs(spark):
    """Counts and redaction for each PII class, and the ordering guarantee
    (emails/phones labeled before the bare digit-run catch-all)."""
    from data_warehouse_hive_spark.extensions.curation import pii_stats

    rows = [
        ("e", "mail me at jane.doe+x@example.co.uk today"),
        ("p", "call +1 555-123-4567 or 555.987.6543"),
        ("n", "account 9876543210123 ok"),
        ("clean", "nothing sensitive here"),
    ]
    df = spark.createDataFrame(rows, "doc_id string, text string")
    out = {r["doc_id"]: r for r in pii_stats(df).collect()}
    assert out["e"]["n_emails"] == 1 and "<EMAIL>" in out["e"]["redacted"]
    assert "jane" not in out["e"]["redacted"]
    assert out["p"]["n_phones"] == 2 and out["p"]["redacted"].count("<PHONE>") == 2
    assert out["n"]["n_longnums"] == 1 and "<NUM>" in out["n"]["redacted"]
    assert out["clean"]["redacted"] == out["clean"]["text"]


def test_portable_hash_sampling_is_deterministic(spark):
    """The sampling hash must be stable across sessions (it IS the
    reproducibility contract) — pin exact values."""
    from data_warehouse_hive_spark.extensions.curation import portable_hash
    from pyspark.sql import functions as F

    df = spark.range(0, 1000).select(portable_hash(F.col("id")).alias("h"))
    got = [r["h"] for r in df.collect()]
    assert got[:4] == [
        0,
        2654435761 % 2147483648,
        (2 * 2654435761) % 2147483648,
        (3 * 2654435761) % 2147483648,
    ]
    # keep-rule selects ~5%
    kept = sum(1 for h in got if h % 100 < 5)
    assert 20 <= kept <= 80


def test_image_header_decode_real_formats(spark):
    """sniff_image_meta is a REAL decoder for header metadata: construct
    valid PNG/GIF/BMP/JPEG containers byte-by-byte and extract their true
    pixel dimensions through the distributed mapInPandas pass."""
    import struct
    import zlib

    from data_warehouse_hive_spark.sources.multimodal import (
        image_dims,
        sniff_image_meta,
    )

    def png(w, h):
        ihdr = struct.pack(">II5B", w, h, 8, 2, 0, 0, 0)
        chunk = b"IHDR" + ihdr
        return (
            b"\x89PNG\r\n\x1a\n"
            + struct.pack(">I", 13)
            + chunk
            + struct.pack(">I", zlib.crc32(chunk))
        )

    def gif(w, h):
        return b"GIF89a" + struct.pack("<HH", w, h) + b"\x00\x00\x00"

    def bmp(w, h):
        return (
            b"BM" + b"\x00" * 16 + struct.pack("<ii", w, h) + b"\x00" * 20
        )

    def jpeg(w, h):
        app0 = b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00" + b"\x00" * 9
        sof0 = b"\xff\xc0" + struct.pack(">HBHH", 17, 8, h, w) + b"\x00" * 10
        return b"\xff\xd8" + app0 + sof0

    # direct (driver-side) decode
    assert sniff_image_meta(png(640, 480)) == ("png", 640, 480)
    assert sniff_image_meta(gif(13, 37)) == ("gif", 13, 37)
    assert sniff_image_meta(bmp(800, 600)) == ("bmp", 800, 600)
    assert sniff_image_meta(jpeg(1920, 1080)) == ("jpeg", 1920, 1080)
    assert sniff_image_meta(b"not an image") == (None, None, None)

    # distributed (Arrow/mapInPandas) decode
    rows = [
        (1, "image", png(640, 480)),
        (2, "image", gif(13, 37)),
        (3, "image", bmp(800, 600)),
        (4, "image", jpeg(1920, 1080)),
        (5, "image", b"junk"),
        (6, "audio", b"\x00\x01"),  # filtered out by kind
    ]
    media = spark.createDataFrame(
        rows, "media_id long, kind string, payload binary"
    )
    got = {r["media_id"]: r for r in image_dims(media).collect()}
    assert set(got) == {1, 2, 3, 4, 5}
    assert (got[1]["format"], got[1]["px_width"], got[1]["px_height"]) == ("png", 640, 480)
    assert (got[2]["px_width"], got[2]["px_height"]) == (13, 37)
    assert (got[3]["px_width"], got[3]["px_height"]) == (800, 600)
    assert (got[4]["px_width"], got[4]["px_height"]) == (1920, 1080)
    assert got[5]["format"] is None and got[5]["px_width"] is None


def test_wav_header_decode_real_format(spark):
    """sniff_wav_meta walks real RIFF chunk lists: construct valid WAV
    containers byte-by-byte — including one with a LIST chunk *before*
    data, where fixed offsets would misread — and extract true sample
    rate / channels / bit depth / duration through mapInPandas."""
    import struct

    from data_warehouse_hive_spark.sources.multimodal import (
        audio_meta,
        sniff_wav_meta,
    )

    def wav(rate, chans, bits, n_frames, pre_chunks=b""):
        data = b"\x00" * (n_frames * chans * (bits // 8))
        fmt = b"fmt " + struct.pack(
            "<IHHIIHH",
            16, 1, chans, rate, rate * chans * bits // 8, chans * bits // 8, bits,
        )
        body = b"WAVE" + fmt + pre_chunks + b"data" + struct.pack("<I", len(data)) + data
        return b"RIFF" + struct.pack("<I", len(body)) + body

    lst = b"LIST" + struct.pack("<I", 11) + b"INFOhello-x"[:11] + b"\x00"  # odd+pad

    assert sniff_wav_meta(wav(16000, 1, 16, 16000)) == (
        "wav", 16000, 1, 16, 16000, 1000,
    )
    assert sniff_wav_meta(wav(44100, 2, 16, 22050, pre_chunks=lst)) == (
        "wav", 44100, 2, 16, 22050, 500,
    )
    assert sniff_wav_meta(b"RIFFxxxxJUNK") == (None, None, None, None, None, None)
    assert sniff_wav_meta(b"") == (None, None, None, None, None, None)

    rows = [
        (1, "audio", wav(16000, 1, 16, 8000)),
        (2, "audio", wav(48000, 2, 24, 48000, pre_chunks=lst)),
        (3, "audio", b"not audio"),
        (4, "image", b"\x89PNG"),  # filtered out by kind
    ]
    media = spark.createDataFrame(
        rows, "media_id long, kind string, payload binary"
    )
    got = {r["media_id"]: r for r in audio_meta(media).collect()}
    assert set(got) == {1, 2, 3}
    assert (got[1]["sample_rate"], got[1]["channels"], got[1]["duration_ms"]) == (
        16000, 1, 500,
    )
    assert (got[2]["sample_rate"], got[2]["bits_per_sample"], got[2]["n_frames"]) == (
        48000, 24, 48000,
    )
    assert got[3]["format"] is None and got[3]["sample_rate"] is None


def test_wav_header_roundtrip_property():
    """Property: any (rate, channels, bits, frames) combination written
    through a well-formed RIFF container — with arbitrary benign chunks
    before data — parses back exactly."""
    import struct

    from hypothesis import given, settings
    from hypothesis import strategies as st

    from data_warehouse_hive_spark.sources.multimodal import sniff_wav_meta

    def wav(rate, chans, bits, n_frames, junk):
        data = b"\x00" * (n_frames * chans * (bits // 8))
        fmt = b"fmt " + struct.pack(
            "<IHHIIHH",
            16, 1, chans, rate, rate * chans * bits // 8, chans * bits // 8, bits,
        )
        pre = b"LIST" + struct.pack("<I", len(junk)) + junk + (
            b"\x00" if len(junk) % 2 else b""
        )
        body = (
            b"WAVE" + fmt + pre + b"data" + struct.pack("<I", len(data)) + data
        )
        return b"RIFF" + struct.pack("<I", len(body)) + body

    @settings(max_examples=50, deadline=None)
    @given(
        rate=st.sampled_from([8000, 16000, 22050, 44100, 48000]),
        chans=st.integers(1, 8),
        bits=st.sampled_from([8, 16, 24, 32]),
        n_frames=st.integers(0, 4096),
        junk=st.binary(min_size=0, max_size=64).filter(
            lambda b: b[:4] not in (b"fmt ", b"data")
        ),
    )
    def check(rate, chans, bits, n_frames, junk):
        fmt, r, c, b, n, dur = sniff_wav_meta(wav(rate, chans, bits, n_frames, junk))
        assert (fmt, r, c, b, n) == ("wav", rate, chans, bits, n_frames)
        assert dur == (n_frames * 1000) // rate

    check()


def test_mp4_header_decode_real_format(spark):
    """sniff_mp4_meta walks real ISO-BMFF box lists: construct valid MP4
    containers byte-by-byte (including a free box before moov and a
    version-1 mvhd) and confirm the walker reads brand, timescale,
    duration, and track count from structure, not fixed offsets."""
    from data_warehouse_hive_spark.sources.multimodal import (
        sniff_mp4_meta,
        video_meta,
    )

    def box(btype: bytes, payload: bytes) -> bytes:
        return (8 + len(payload)).to_bytes(4, "big") + btype + payload

    def mvhd_v0(timescale: int, duration: int) -> bytes:
        body = (
            b"\x00" + b"\x00\x00\x00"          # version 0, flags
            + (0).to_bytes(4, "big") * 2        # creation, modification
            + timescale.to_bytes(4, "big")
            + duration.to_bytes(4, "big")
        )
        return box(b"mvhd", body)

    def mvhd_v1(timescale: int, duration: int) -> bytes:
        body = (
            b"\x01" + b"\x00\x00\x00"
            + (0).to_bytes(8, "big") * 2
            + timescale.to_bytes(4, "big")
            + duration.to_bytes(8, "big")
        )
        return box(b"mvhd", body)

    ftyp = box(b"ftyp", b"isom" + (512).to_bytes(4, "big") + b"isomiso2")
    trak = box(b"trak", b"")
    moov0 = box(b"moov", mvhd_v0(1000, 5500) + trak + trak)
    mp4_v0 = ftyp + box(b"free", b"\x00" * 7) + moov0
    assert sniff_mp4_meta(mp4_v0) == ("mp4", "isom", 1000, 5500, 2)

    moov1 = box(b"moov", mvhd_v1(90000, 90000 * 3) + trak)
    mp4_v1 = ftyp + moov1
    assert sniff_mp4_meta(mp4_v1) == ("mp4", "isom", 90000, 3000, 1)

    assert sniff_mp4_meta(b"not a video") == (None, None, None, None, None)

    from data_warehouse_hive_spark.sources.multimodal import MEDIA_SCHEMA

    media = spark.createDataFrame(
        [
            (1, "video", bytearray(mp4_v0), None, None, None),
            (2, "video", bytearray(mp4_v1), None, None, None),
            (3, "audio", bytearray(b"RIFF"), None, None, None),
        ],
        schema=MEDIA_SCHEMA,
    )
    out = {r["media_id"]: r for r in video_meta(media).collect()}
    assert set(out) == {1, 2}
    assert out[1]["duration_ms"] == 5500 and out[1]["n_tracks"] == 2
    assert out[2]["timescale"] == 90000 and out[2]["major_brand"] == "isom"


def test_observe_metrics_match_aggregates(spark, sf_dir):
    """df.observe(): pipeline metrics collected DURING execution (one
    pass, no second scan) must equal the separately-computed aggregates.
    The carrier sum inside the observation keeps the metric exact."""
    from pyspark.sql import Observation
    from pyspark.sql import functions as F

    from data_warehouse_hive_spark.tables import t as tbl

    obs = Observation("ingest_metrics")
    df = (
        tbl(spark, sf_dir, "orders")
        .filter(F.col("o_totalprice") > 100000.0)
        .observe(
            obs,
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(
                F.floor(F.col("o_totalprice") * F.lit(1e6) + F.lit(0.5)).cast(
                    "long"
                )
            ).alias("price_carrier"),
        )
    )
    n_out = df.count()  # triggers execution; observation fills in
    got = obs.get
    expected = (
        tbl(spark, sf_dir, "orders")
        .filter(F.col("o_totalprice") > 100000.0)
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(
                F.floor(F.col("o_totalprice") * F.lit(1e6) + F.lit(0.5)).cast(
                    "long"
                )
            ).alias("price_carrier"),
        )
        .collect()[0]
    )
    assert got["n_rows"] == n_out == expected["n_rows"]
    assert got["price_carrier"] == expected["price_carrier"]
