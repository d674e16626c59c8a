"""LLM-op verification: probabilistic operators vs exact baselines."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from kafka_stream_aggregator_spark.llm.dedup import (
    exact_dedup,
    minhash_near_dup,
    simhash,
    simhash_near_dup,
)
from kafka_stream_aggregator_spark.llm.similarity import (
    as_double,
    brute_force_topk,
    ivf_topk,
    pseudo_centroids,
)
from kafka_stream_aggregator_spark.llm.text import lang_id, quality_score, token_stats
from kafka_stream_aggregator_spark.tables import load_table


def _docs_with_dups(spark):
    base = "the quick brown fox jumps over the lazy dog again and again"
    rows = [
        (1, base),
        (2, base),                                  # exact dup
        (3, base.replace("lazy", "sleepy")),        # near dup
        (4, "completely different text about spark query engines at scale"),
        (5, "THE  quick   brown fox jumps over the lazy dog again and again"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_exact_dedup(spark):
    out = exact_dedup(_docs_with_dups(spark), "doc_id", "text")
    canon = {r["doc_id"]: r["is_canonical"] for r in out.collect()}
    # 1,2,5 normalize to the same text -> only 1 canonical
    assert canon[1] and not canon[2] and not canon[5]
    assert canon[3] and canon[4]


def test_minhash_finds_near_dups(spark):
    pairs = {
        (r["id_a"], r["id_b"])
        for r in minhash_near_dup(
            _docs_with_dups(spark), "doc_id", "text", jaccard_threshold=0.5
        ).collect()
    }
    assert (1, 2) in pairs and (1, 5) in pairs and (2, 5) in pairs
    assert (1, 3) in pairs  # one-word change, high jaccard
    assert not any(4 in p for p in pairs)


def test_minhash_recall_vs_bruteforce(spark, sf_dir):
    """On the real corpus: every pair with exact jaccard >= 0.6 must be
    found by the LSH path (32 hashes / 8 bands -> ~98% @ 0.6)."""
    docs = load_table(spark, sf_dir, "documents").limit(200)
    got = minhash_near_dup(docs, "doc_id", "text", jaccard_threshold=0.6)
    lsh_pairs = {(r["id_a"], r["id_b"]) for r in got.collect()}
    # exact jaccard via shingle join on the same shingle definition
    from kafka_stream_aggregator_spark.llm.dedup import _shingles

    sh = docs.select(
        "doc_id", F.explode(_shingles(F.col("text"), 3)).alias("sh")
    )
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    a = sh.select(F.col("doc_id").alias("id_a"), F.col("sh").alias("sha"))
    b = sh.select(F.col("doc_id").alias("id_b"), F.col("sh").alias("shb"))
    inter = (
        a.join(b, (a.sha == b.shb) & (a.id_a < b.id_b))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("ni"))
    )
    sa = sizes.withColumnsRenamed({"doc_id": "id_a", "n": "na"})
    sb = sizes.withColumnsRenamed({"doc_id": "id_b", "n": "nb"})
    exact = (
        inter.join(sa, "id_a").join(sb, "id_b")
        .withColumn("j", F.col("ni") / (F.col("na") + F.col("nb") - F.col("ni")))
        .filter(F.col("j") >= 0.6)
    )
    exact_pairs = {(r["id_a"], r["id_b"]) for r in exact.collect()}
    missed = exact_pairs - lsh_pairs
    assert not missed, f"LSH missed high-jaccard pairs: {missed}"


def test_simhash_identical_and_blocking(spark):
    sig = {r["doc_id"]: r["simhash"] for r in simhash(_docs_with_dups(spark), "doc_id", "text").collect()}
    assert sig[1] == sig[2]  # identical text, identical signature
    pairs = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in simhash_near_dup(_docs_with_dups(spark), "doc_id", "text", max_hamming=16).collect()
    }
    assert pairs[(1, 2)] == 0


def test_ivf_recall(spark, sf_dir):
    e = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", as_double(F.col("embedding")).alias("v")
    )
    q = e.filter(F.col("vec_id") < 20).select(
        F.col("vec_id").alias("q_id"), F.col("v").alias("q_vec")
    )
    c = e.select(F.col("vec_id").alias("c_id"), F.col("v").alias("c_vec"))
    cents = pseudo_centroids(e, "v", "vec_id", n_cells=8)
    exact = {
        (r["q_id"], r["c_id"])
        for r in brute_force_topk(q, c, k=5).collect()
    }
    approx = {
        (r["q_id"], r["c_id"])
        for r in ivf_topk(q, c, cents, k=5, n_probe=4).collect()
    }
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.5, f"IVF recall@5 too low: {recall:.2f}"


def test_lang_id_crafted(spark):
    rows = [
        (1, "the cat is on the mat and it is happy", "en"),
        (2, "der Hund ist nicht mit der Katze und das ist gut", "de"),
        (3, "le chat est dans la maison et il est content pour les enfants", "fr"),
        (4, "el perro es grande y no es una casa con los gatos", "es"),
        (5, "xyzzy qwerty plugh", "und"),
    ]
    df = spark.createDataFrame(rows, "id long, text string, expect string")
    out = df.withColumn("pred", lang_id(F.col("text"))).collect()
    for r in out:
        assert r["pred"] == r["expect"], f"{r['text']!r}: {r['pred']} != {r['expect']}"


def test_quality_and_token_stats(spark):
    df = spark.createDataFrame(
        [(1, "the quick brown fox jumps over the lazy dog for a while")],
        "id long, text string",
    )
    row = df.select(
        quality_score(F.col("text")).alias("q"),
        token_stats(F.col("text")).alias("s"),
    ).first()
    assert row["q"] == 1.0
    assert row["s"]["n_tokens"] == 12
    assert row["s"]["n_uniq_tokens"] == 11  # 'the' twice
    assert row["s"]["punct_ratio"] == 0.0


def test_multimodal_plumbing(spark):
    from kafka_stream_aggregator_spark.llm.multimodal import (
        attach_meta,
        decode_audio,
        image_features,
    )

    df = spark.createDataFrame(
        [(1, bytearray(b"\x00\x01\x02\x03" * 100)), (2, bytearray(b"\xff" * 64))],
        "id long, payload binary",
    )
    media = attach_meta(df, "id", "payload")
    assert media.schema["meta"].dataType.fieldNames() == ["mime", "width", "height", "n_bytes"]
    feats = {r["media_id"]: r for r in image_features(media).collect()}
    assert feats[1]["n_bytes"] == 400
    assert feats[2]["byte_mean"] == 255.0 and feats[2]["byte_std"] == 0.0
    # non-audio payloads: null features, no crash (WAV path is real)
    audio = {r["media_id"]: r for r in decode_audio(media).collect()}
    assert audio[1]["sample_rate"] is None and audio[1]["rms"] is None


def _wav_bytes(freq: float, sr: int = 8000, seconds: float = 0.5, amp: float = 0.5):
    import io
    import wave

    import numpy as np

    n = int(sr * seconds)
    ts = np.arange(n) / sr
    pcm = (np.sin(2 * np.pi * freq * ts) * amp * 32767).astype("<i2")
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sr)
        w.writeframes(pcm.tobytes())
    return buf.getvalue()


def test_audio_wav_decode_real(spark):
    """The WAV path decodes for real (stdlib): exact sample rate,
    channels, duration; RMS of a sine at amplitude a is a/sqrt(2)."""
    from kafka_stream_aggregator_spark.llm.multimodal import (
        attach_meta,
        capabilities,
        decode_audio,
    )

    assert capabilities()["audio_wav"] is True
    df = spark.createDataFrame(
        [
            (1, bytearray(_wav_bytes(220.0, seconds=0.5, amp=0.5))),
            (2, bytearray(_wav_bytes(440.0, seconds=2.0, amp=0.25))),
            (3, bytearray(b"not a wav")),
        ],
        "id long, payload binary",
    )
    out = {
        r["media_id"]: r
        for r in decode_audio(attach_meta(df, "id", "payload")).collect()
    }
    assert out[1]["sample_rate"] == 8000 and out[1]["n_channels"] == 1
    assert abs(out[1]["duration_s"] - 0.5) < 1e-9
    assert abs(out[1]["rms"] - 0.5 / 2**0.5) < 0.01
    assert abs(out[2]["duration_s"] - 2.0) < 1e-9
    assert abs(out[2]["rms"] - 0.25 / 2**0.5) < 0.01
    assert out[3]["sample_rate"] is None


def test_image_decode_capability_paths():
    """decode_image_payload: fake path is deterministic when PIL is
    absent; when PIL is installed the real path must parse a real PNG."""
    from kafka_stream_aggregator_spark.llm import multimodal as mm

    b = bytes(range(256)) * 4
    m1 = mm.decode_image_payload(b)
    m2 = mm.decode_image_payload(b)
    assert m1 == m2
    if mm.HAS_PIL:
        import io

        import numpy as np
        from PIL import Image

        img = Image.fromarray(
            (np.arange(64 * 64).reshape(64, 64) % 256).astype("uint8")
        )
        buf = io.BytesIO()
        img.save(buf, format="PNG")
        mean, std, phash = mm.decode_image_payload(buf.getvalue())
        assert 0 <= mean <= 255 and std > 0


def test_cluster_near_dups(spark):
    from kafka_stream_aggregator_spark.llm.dedup import cluster_near_dups

    # components: {1,2,3,4} via chain, {7,9}, singleton pairs absent
    pairs = spark.createDataFrame(
        [(1, 2, 0.9), (2, 3, 0.8), (3, 4, 0.7), (7, 9, 0.95)],
        "id_a long, id_b long, jaccard double",
    )
    got = {r["id"]: r["cluster_id"] for r in cluster_near_dups(pairs).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 7: 7, 9: 7}


def test_cluster_near_dups_on_corpus(spark):
    """End-to-end: minhash pairs -> clusters; every clustered doc maps to
    the min id of its pair-connected component."""
    from kafka_stream_aggregator_spark.llm.dedup import (
        cluster_near_dups,
        minhash_near_dup,
    )

    pairs = minhash_near_dup(
        _docs_with_dups(spark), "doc_id", "text", jaccard_threshold=0.5
    )
    got = {r["id"]: r["cluster_id"] for r in cluster_near_dups(pairs).collect()}
    # 1,2,3,5 near-dup each other -> one cluster rooted at 1
    assert got[1] == got[2] == got[5] == 1


def test_minhash_vs_spark_ml_lsh(spark, sf_dir):
    """Cross-check our DataFrame-native MinHash LSH against pyspark.ml's
    MinHashLSH approxSimilarityJoin on the same corpus: the high-jaccard
    pairs our path reports must also be reachable via the ml pipeline."""
    from pyspark.ml.feature import CountVectorizer, MinHashLSH, Tokenizer

    docs = load_table(spark, sf_dir, "documents").limit(150).select("doc_id", "text")
    ours = {
        (r["id_a"], r["id_b"])
        for r in minhash_near_dup(
            docs, "doc_id", "text", jaccard_threshold=0.7
        ).collect()
    }
    tok = Tokenizer(inputCol="text", outputCol="words").transform(
        docs.withColumn("text", F.lower("text"))
    )
    cv = CountVectorizer(inputCol="words", outputCol="features", binary=True).fit(tok)
    feats = cv.transform(tok).filter(F.expr("aggregate(words, 0, (a, x) -> a + 1) > 0"))
    lsh = MinHashLSH(inputCol="features", outputCol="hashes", numHashTables=8).fit(feats)
    # jaccard distance <= 0.3  <=>  jaccard similarity >= 0.7 (token sets)
    ml_pairs = {
        (min(r["datasetA"]["doc_id"], r["datasetB"]["doc_id"]),
         max(r["datasetA"]["doc_id"], r["datasetB"]["doc_id"]))
        for r in lsh.approxSimilarityJoin(feats, feats, 0.5).collect()
        if r["datasetA"]["doc_id"] != r["datasetB"]["doc_id"]
    }
    # our pairs use 3-gram shingles, ml uses unigram token sets — ours at
    # >=0.7 shingle-jaccard implies high token overlap, so every pair we
    # emit should be in the ml candidate set
    missed = ours - ml_pairs
    assert not missed, f"ml LSH missed pairs our path found: {missed}"


def test_pii_detect_and_redact(spark):
    from kafka_stream_aggregator_spark.llm.pii import has_pii, pii_counts, redact

    rows = [
        (1, "reach me at jane.doe+x@corp.io or 212-555-0142 ext"),
        (2, "card 4111-1111-1111-1111 exp soon"),
        (3, "server at 192.168.0.1 answered"),
        (4, "a perfectly clean sentence about query engines"),
        (5, "ssn is 987-65-4321 ok"),
    ]
    df = spark.createDataFrame(rows, "id long, text string")
    out = {
        r["id"]: r
        for r in df.select(
            "id",
            has_pii(F.col("text")).alias("flag"),
            pii_counts(F.col("text")).alias("c"),
            redact(F.col("text")).alias("red"),
        ).collect()
    }
    assert out[1]["flag"] and out[1]["c"]["email"] == 1
    assert out[2]["c"]["card"] == 1 and "<CARD>" in out[2]["red"]
    assert out[3]["c"]["ipv4"] == 1 and "<IPV4>" in out[3]["red"]
    assert not out[4]["flag"]
    assert out[5]["c"]["ssn"] == 1 and "<SSN>" in out[5]["red"]
    assert "jane" not in out[1]["red"] or "@" not in out[1]["red"]


def test_simhash_recall_vs_exact(spark, sf_dir):
    """Blocked simhash search vs exact pairwise hamming on a corpus
    subset: everything within the pigeonhole-guaranteed radius (<=3)
    must be found; report-and-bound recall at the working radius."""
    from kafka_stream_aggregator_spark.llm.dedup import simhash, simhash_near_dup

    docs = load_table(spark, sf_dir, "documents").limit(150)
    sig = simhash(docs, "doc_id", "text")
    a = sig.select(F.col("doc_id").alias("ia"), F.col("simhash").alias("sa"))
    b = sig.select(F.col("doc_id").alias("ib"), F.col("simhash").alias("sb"))
    exact = {
        (r["ia"], r["ib"]): r["h"]
        for r in a.join(b, a.ia < b.ib)
        .select("ia", "ib", F.bit_count(F.col("sa").bitwiseXOR(F.col("sb"))).alias("h"))
        .filter("h <= 12")
        .collect()
    }
    found = {
        (r["id_a"], r["id_b"])
        for r in simhash_near_dup(docs, "doc_id", "text", max_hamming=12).collect()
    }
    guaranteed = {k for k, h in exact.items() if h <= 3}
    assert guaranteed <= found, f"missed pigeonhole-guaranteed pairs: {guaranteed - found}"
    if exact:
        recall = len(found & set(exact)) / len(exact)
        # above the guaranteed radius, 4x16-bit blocking recall decays
        # with distance (measured ~0.14 at h<=12 on this corpus) — the
        # assertion pins the floor, the guarantee above pins correctness
        assert recall >= 0.1


def test_cosine_near_dup_ivf_recall(spark, sf_dir):
    """IVF-blocked near-dup pairs vs exact all-pairs on the same input:
    the blocked search must be a SUBSET (no false positives — scores are
    exact, only candidate generation is approximate) with recall >= 0.5
    at 8 cells on this corpus, and every returned score must equal the
    exact score."""
    from pyspark.sql import functions as F

    from kafka_stream_aggregator_spark.llm.similarity import (
        as_double,
        cosine_near_dup_pairs,
        pseudo_centroids,
    )
    from kafka_stream_aggregator_spark.tables import load_table

    e = (
        load_table(spark, sf_dir, "embeddings")
        .filter(F.col("vec_id") < 400)
        .select("vec_id", as_double(F.col("embedding")).alias("v"))
    )
    exact = {
        (r["id_a"], r["id_b"]): round(r["cos_sim"], 6)
        for r in cosine_near_dup_pairs(e, "vec_id", "v", 0.35).collect()
    }
    cents = pseudo_centroids(e, "v", "vec_id", n_cells=8)
    blocked = {
        (r["id_a"], r["id_b"]): round(r["cos_sim"], 6)
        for r in cosine_near_dup_pairs(
            e, "vec_id", "v", 0.35, centroids=cents
        ).collect()
    }
    assert exact, "corpus must contain pairs above threshold"
    assert set(blocked) <= set(exact)  # no false positives
    for k, v in blocked.items():
        assert abs(v - exact[k]) < 1e-6
    recall = len(blocked) / len(exact)
    assert recall >= 0.5, f"recall {recall} ({len(blocked)}/{len(exact)})"


def test_kmeans_centroids_improve_ivf_recall(spark, sf_dir):
    """Refined centroids: valid shape (k cells, finite vectors), and
    IVF recall@5 with refined cells >= recall with raw id-seeds on the
    same query set (k-means can only sharpen the partition here)."""
    from kafka_stream_aggregator_spark.llm.similarity import (
        kmeans_centroids,
    )

    e = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", as_double(F.col("embedding")).alias("v")
    )
    q = e.filter(F.col("vec_id") < 20).select(
        F.col("vec_id").alias("q_id"), F.col("v").alias("q_vec")
    )
    c = e.select(F.col("vec_id").alias("c_id"), F.col("v").alias("c_vec"))
    exact = {
        (r["q_id"], r["c_id"]) for r in brute_force_topk(q, c, k=5).collect()
    }

    def recall(cents):
        approx = {
            (r["q_id"], r["c_id"])
            for r in ivf_topk(q, c, cents, k=5, n_probe=4).collect()
        }
        return len(exact & approx) / len(exact)

    seeds = pseudo_centroids(e, "v", "vec_id", n_cells=8)
    refined = kmeans_centroids(e, "v", "vec_id", n_cells=8, n_iter=3)
    rows = refined.collect()
    assert len(rows) == 8
    assert all(len(r["c_vec"]) == len(rows[0]["c_vec"]) for r in rows)
    assert all(all(x == x for x in r["c_vec"]) for r in rows)  # no NaN
    r_seed, r_ref = recall(seeds), recall(refined)
    assert r_ref >= r_seed - 0.05, f"refined {r_ref} << seed {r_seed}"


def test_lsh_s_curve_band_selection():
    """choose_bands follows the S-curve: recall target met at the
    threshold; fewer bands for high thresholds (steep curve), more for
    low ones; probability function matches hand-computed values."""
    from kafka_stream_aggregator_spark.llm.dedup import (
        choose_bands,
        lsh_candidate_probability,
    )

    # hand-check: j=0.5, b=8, r=4 -> 1-(1-0.0625)^8
    assert abs(
        lsh_candidate_probability(0.5, 8, 4) - (1 - (1 - 0.5**4) ** 8)
    ) < 1e-12
    b_low = choose_bands(32, 0.3)
    b_high = choose_bands(32, 0.9)
    assert b_low >= b_high  # low threshold needs more/shorter bands
    for thr in (0.3, 0.5, 0.7, 0.9):
        b = choose_bands(32, thr)
        assert 32 % b == 0
        assert lsh_candidate_probability(thr, b, 32 // b) >= 0.9, thr


def test_minhash_auto_bands_finds_near_dups(spark):
    from kafka_stream_aggregator_spark.llm.dedup import minhash_near_dup

    pairs = {
        (r["id_a"], r["id_b"])
        for r in minhash_near_dup(
            _docs_with_dups(spark), "doc_id", "text",
            bands=None, jaccard_threshold=0.5,
        ).collect()
    }
    assert (1, 2) in pairs and (1, 3) in pairs


def test_video_frame_sampling(spark):
    """Raw-frame sampling: exact frame bytes, stride + cap honored,
    fan-out happens executor-side (one input row -> many output rows)."""
    from kafka_stream_aggregator_spark.llm.multimodal import (
        attach_meta,
        sample_video_frames,
    )

    fs = 16
    payload = b"".join(bytes([i]) * fs for i in range(10))  # 10 frames
    df = spark.createDataFrame(
        [(1, bytearray(payload)), (2, bytearray(b"short"))],
        "id long, payload binary",
    )
    media = attach_meta(df, "id", "payload")
    out = sample_video_frames(media, frame_size=fs, stride=3).collect()
    got = {(r["media_id"], r["frame_idx"]): r for r in out}
    assert set(got) == {(1, 0), (1, 3), (1, 6), (1, 9)}
    assert all(r["n_frames"] == 10 for r in out)
    assert bytes(got[(1, 3)]["frame"]) == bytes([3]) * fs
    capped = sample_video_frames(media, frame_size=fs, stride=3, max_frames=2)
    assert capped.count() == 2


def test_resize_frames_nearest_neighbor_exact(spark):
    """Real resize on raw grayscale frames: exact nearest-neighbor
    values (checkerboard 4x4 -> 2x2 picks the sampled pixels), wrong-
    size frames -> null, end-to-end from sample_video_frames."""
    import numpy as np

    from kafka_stream_aggregator_spark.llm.multimodal import (
        attach_meta,
        resize_frames,
        sample_video_frames,
    )

    # two 4x4 frames: a ramp 0..15 and a constant 7
    f0 = bytes(range(16))
    f1 = bytes([7] * 16)
    df = spark.createDataFrame(
        [(1, bytearray(f0 + f1)), (2, bytearray(b"xy"))],
        "id long, payload binary",
    )
    media = attach_meta(df, "id", "payload")
    frames = sample_video_frames(media, frame_size=16, stride=1)
    out = {
        (r["media_id"], r["frame_idx"]): r
        for r in resize_frames(frames, 4, 4, 2, 2).collect()
    }
    # nearest-neighbor indices for 4->2: rows/cols 0 and 2
    want = np.frombuffer(f0, dtype=np.uint8).reshape(4, 4)[[0, 2]][:, [0, 2]]
    got = np.frombuffer(bytes(out[(1, 0)]["frame"]), dtype=np.uint8).reshape(2, 2)
    assert (got == want).all()
    assert bytes(out[(1, 1)]["frame"]) == bytes([7] * 4)
    assert all(r["width"] == 2 and r["height"] == 2 for r in out.values())
    # media 2's payload yields 0 frames of size 16 -> no rows at all
    assert not any(mid == 2 for (mid, _) in out)


def test_minhash_skew_guard_star_topology(spark):
    """A degenerate bucket (1500 identical docs) must not go quadratic:
    above max_bucket_size the bucket switches to star pairs around the
    min-id member, preserving connectivity, and the skew observation
    reports the starred members."""
    from pyspark.sql import Observation

    n = 1500
    rows = [(i, "the same boilerplate text repeated everywhere again") for i in range(n)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    obs = Observation("minhash_skew")
    pairs = minhash_near_dup(
        docs, "doc_id", "text", max_bucket_size=100, skew_observation=obs
    ).collect()
    got = {(r["id_a"], r["id_b"]) for r in pairs}
    # star topology: every doc pairs with doc 0 (all jaccard == 1.0)
    assert got == {(0, j) for j in range(1, n)}
    assert all(r["jaccard"] == 1.0 for r in pairs)
    assert obs.get["starred_rows"] > 0


def test_minhash_skew_guard_no_effect_below_cap(spark):
    """With the default cap, small-corpus results are unchanged."""
    base = {
        (r["id_a"], r["id_b"])
        for r in minhash_near_dup(
            _docs_with_dups(spark), "doc_id", "text", jaccard_threshold=0.5
        ).collect()
    }
    assert (1, 2) in base and (1, 5) in base


def test_simhash_skew_guard_star_topology(spark):
    """Same guard on the simhash chunk join: identical docs collapse to
    star pairs with hamming 0."""
    from pyspark.sql import Observation

    n = 800
    rows = [(i, "identical content for the simhash skew bucket test") for i in range(n)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    obs = Observation("simhash_skew")
    pairs = simhash_near_dup(
        docs, "doc_id", "text", max_bucket_size=50, skew_observation=obs
    ).collect()
    got = {(r["id_a"], r["id_b"]) for r in pairs}
    assert got == {(0, j) for j in range(1, n)}
    assert all(r["hamming"] == 0 for r in pairs)
    assert obs.get["starred_rows"] > 0


def test_simhash_pair32_guarantee_and_buckets(spark, sf_dir):
    """pair32 blocking: every pair within hamming<=2 is guaranteed found
    (two flips leave two chunks clean -> their paired key matches), and
    the 32-bit keys fragment buckets at least as finely as 16-bit chunks."""
    docs = load_table(spark, sf_dir, "documents").limit(150)
    sig = simhash(docs, "doc_id", "text")
    a = sig.select(F.col("doc_id").alias("ia"), F.col("simhash").alias("sa"))
    b = sig.select(F.col("doc_id").alias("ib"), F.col("simhash").alias("sb"))
    exact = {
        (r["ia"], r["ib"]): r["h"]
        for r in a.join(b, a.ia < b.ib)
        .select("ia", "ib", F.bit_count(F.col("sa").bitwiseXOR(F.col("sb"))).alias("h"))
        .filter("h <= 12")
        .collect()
    }
    found = {
        (r["id_a"], r["id_b"])
        for r in simhash_near_dup(
            docs, "doc_id", "text", max_hamming=12, scheme="pair32"
        ).collect()
    }
    guaranteed = {k for k, h in exact.items() if h <= 2}
    assert guaranteed <= found, f"missed pair32-guaranteed pairs: {guaranteed - found}"
    # bucket cardinality: the largest pair32 bucket cannot exceed the
    # largest chunk16 bucket (a pair key refines both its chunk keys)
    def max_bucket(frame):
        return (
            frame.groupBy("chunk", "key").count().agg(F.max("count")).collect()[0][0]
        )

    chunk = lambda sig_col, c: F.shiftright(sig_col, c * 16).bitwiseAND(F.lit(0xFFFF))
    c16 = sig.select(
        F.explode(
            F.array(*[
                F.struct(F.lit(c).alias("chunk"), chunk(F.col("simhash"), c).alias("key"))
                for c in range(4)
            ])
        ).alias("ck")
    ).select("ck.chunk", "ck.key")
    p32 = sig.select(
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(4 + i).alias("chunk"),
                    F.shiftleft(chunk(F.col("simhash"), ci), 16)
                    .bitwiseOR(chunk(F.col("simhash"), cj))
                    .alias("key"),
                )
                for i, (ci, cj) in enumerate(
                    [(0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (2, 3)]
                )
            ])
        ).alias("ck")
    ).select("ck.chunk", "ck.key")
    assert max_bucket(p32) <= max_bucket(c16)


def test_pack_sequences_invariants(spark):
    """FFD packing: every doc packed exactly once, every bin within
    budget unless it holds a single oversized doc, deterministic across
    runs."""
    from kafka_stream_aggregator_spark.llm.pipeline import pack_sequences

    rows = [(i, (i * 37) % 300 + 1) for i in range(500)]  # counts 1..300
    df = spark.createDataFrame(rows, "doc_id long, n_tok long")
    budget = 256
    out = pack_sequences(df, "doc_id", "n_tok", budget=budget, n_shards=4)
    got = out.collect()

    assert sorted(r["doc_id"] for r in got) == list(range(500))
    sums: dict[tuple, int] = {}
    counts: dict[tuple, int] = {}
    for r in got:
        k = (r["shard"], r["bin_id"])
        sums[k] = sums.get(k, 0) + r["n_tokens"]
        counts[k] = counts.get(k, 0) + 1
    for k, s in sums.items():
        assert s <= budget or counts[k] == 1, (k, s, counts[k])

    again = pack_sequences(df, "doc_id", "n_tok", budget=budget, n_shards=4)
    assert sorted(map(tuple, got)) == sorted(map(tuple, again.collect()))


def test_pack_sequences_oversized_doc_gets_own_bin(spark):
    from kafka_stream_aggregator_spark.llm.pipeline import pack_sequences

    df = spark.createDataFrame(
        [(1, 1000), (2, 10), (3, 10)], "doc_id long, n_tok long"
    )
    out = pack_sequences(df, "doc_id", "n_tok", budget=64, n_shards=1).collect()
    by_doc = {r["doc_id"]: (r["shard"], r["bin_id"]) for r in out}
    assert by_doc[1] != by_doc[2]  # oversized doc isolated
    assert by_doc[2] == by_doc[3]  # small docs share a bin


def test_repetition_signals_exact_values(spark):
    from kafka_stream_aggregator_spark.llm.pipeline import repetition_signals

    df = spark.createDataFrame(
        [
            (1, "a b a b a"),      # words: 5, distinct 2; bigrams: ab,ba,ab,ba -> top 2/4
            (2, "x y z w"),        # all distinct; bigrams all unique -> top 1/3
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in repetition_signals(df, "doc_id", "text").collect()}
    assert got[1]["dup_word_frac"] == round(1 - 2 / 5, 6)
    assert got[1]["top_bigram_frac"] == 0.5
    assert got[2]["dup_word_frac"] == 0.0
    assert got[2]["top_bigram_frac"] == round(1 / 3, 6)


def test_stratified_sample_deterministic_and_rate(spark):
    """The multiplicative-hash sampler is reproducible and lands near
    the target rate on a uniform id range."""
    from kafka_stream_aggregator_spark.llm.pipeline import stratified_sample

    df = spark.range(20_000).withColumnRenamed("id", "doc_id")
    kept = stratified_sample(df, "doc_id", F.lit(0.25))
    n1 = kept.count()
    n2 = stratified_sample(df, "doc_id", F.lit(0.25)).count()
    assert n1 == n2
    assert abs(n1 / 20_000 - 0.25) < 0.02


def test_decontaminate_finds_planted_overlap(spark):
    from kafka_stream_aggregator_spark.llm.pipeline import decontaminate

    ev = spark.createDataFrame(
        [(100, "the quick brown fox jumps over the lazy dog")],
        "doc_id long, text string",
    )
    tr = spark.createDataFrame(
        [
            (1, "xx quick brown fox jumps zz"),
            (2, "totally unrelated words here now"),
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r["n_overlap"] for r in
           decontaminate(tr, ev, "doc_id", "text", n=3).collect()}
    # doc 1 shares 3-grams: 'quick brown fox', 'brown fox jumps'
    assert got == {1: 2}
