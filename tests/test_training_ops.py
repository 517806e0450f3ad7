"""Training-data operators: dedup (exact / MinHash-LSH / SimHash /
embedding), similarity search (brute force + IVF), text analysis,
multimodal plumbing - with planted duplicates and recall checks."""

import os
import struct

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

BASE_DOCS = [
    "the quick brown fox jumps over the lazy dog while the band plays on",
    "pack my box with five dozen liquor jugs for the long journey home",
    "sphinx of black quartz judge my vow said the wizard to the apprentice",
    "how vexingly quick daft zebras jump when startled by the thunder",
    "a completely different document about ray data pipelines and arrow batches",
]


def _docs_table(n_fill=40, seed=3):
    rng = np.random.default_rng(seed)
    texts = list(BASE_DOCS)
    # planted near-duplicates: one-word perturbations of doc 0 and 2
    texts.append(BASE_DOCS[0].replace("lazy", "sleepy"))
    texts.append(BASE_DOCS[2].replace("wizard", "sorcerer"))
    # planted exact duplicate of doc 1
    texts.append(BASE_DOCS[1])
    words = "alpha beta gamma delta epsilon zeta eta theta iota kappa".split()
    for i in range(n_fill):
        texts.append(" ".join(rng.choice(words, size=12)))
    return pa.table(
        {"doc_id": list(range(len(texts))), "text": texts}
    )


@pytest.fixture(scope="module")
def docs_ds(ray_session):
    import ray.data as rd

    return rd.from_arrow(_docs_table())


def test_exact_dedup_keeps_min_id(docs_ds):
    from mysql_log_parser_ray.training.dedup import exact_dedup

    out = exact_dedup(docs_ds).to_pandas()
    dup = out[out["n_dups"] > 1]
    assert len(dup) == 1  # only doc 1 has an exact duplicate (id 7)
    assert int(dup["keep_doc_id"].iloc[0]) == 1
    assert int(dup["n_dups"].iloc[0]) == 2


def test_minhash_lsh_finds_planted_near_dups(docs_ds):
    from mysql_log_parser_ray.training.dedup import minhash_dedup_pairs

    pairs = minhash_dedup_pairs(docs_ds, threshold=0.6)
    found = {tuple(sorted((int(a), int(b)))) for a, b in
             zip(pairs["doc_a"], pairs["doc_b"])}
    assert (0, 5) in found  # lazy->sleepy perturbation
    assert (2, 6) in found  # wizard->sorcerer perturbation
    assert (1, 7) in found  # exact dup has jaccard 1.0
    # no false positives among unrelated base docs
    assert (0, 4) not in found and (3, 4) not in found


def test_jaccard_values_sane():
    from mysql_log_parser_ray.training.dedup import char_shingles, jaccard

    a = char_shingles(BASE_DOCS[0])
    b = char_shingles(BASE_DOCS[0].replace("lazy", "sleepy"))
    c = char_shingles(BASE_DOCS[4])
    assert 0.6 < jaccard(a, b) < 1.0
    assert jaccard(a, a) == 1.0
    assert jaccard(a, c) < 0.2


def test_ngram_jaccard_pairs_exact(docs_ds):
    from mysql_log_parser_ray.training.dedup import ngram_jaccard_pairs, word_ngrams

    pairs = ngram_jaccard_pairs(docs_ds, threshold=0.3)
    found = {tuple(sorted((int(a), int(b)))): j for a, b, j in
             zip(pairs["doc_a"], pairs["doc_b"], pairs["jaccard"])}
    assert found[(1, 7)] == 1.0  # exact duplicate
    # planted one-word perturbations: verify the distributed value equals
    # the closed-form set jaccard
    for a, b in ((0, 5), (2, 6)):
        ga = word_ngrams(BASE_DOCS[a])
        gb = word_ngrams(BASE_DOCS[a].replace("lazy", "sleepy")
                         if a == 0 else BASE_DOCS[2].replace("wizard", "sorcerer"))
        want = len(ga & gb) / len(ga | gb)
        assert found[(a, b)] == pytest.approx(want, abs=1e-12)
    assert (0, 4) not in found and (3, 4) not in found


def test_simhash_near_pairs(docs_ds):
    from mysql_log_parser_ray.training.dedup import simhash_near_pairs

    pairs = simhash_near_pairs(docs_ds, max_hamming=8)
    found = {tuple(sorted((int(a), int(b)))) for a, b in
             zip(pairs["doc_a"], pairs["doc_b"])}
    assert (1, 7) in found  # exact dup -> hamming 0
    assert (0, 5) in found  # one-word change -> hamming 3 (current hash)
    # the exact dup matches in EVERY chunk; first-matching-chunk emission
    # must still produce each pair exactly once
    assert not pairs.duplicated(["doc_a", "doc_b"]).any()
    # threshold is respected: rerun tighter, the hamming-3 pair drops out
    tight = simhash_near_pairs(docs_ds, max_hamming=2)
    tfound = {tuple(sorted((int(a), int(b)))) for a, b in
              zip(tight["doc_a"], tight["doc_b"])}
    assert (1, 7) in tfound and (0, 5) not in tfound


def test_embedding_dup_bucketed_matches_exhaustive(ray_session):
    import ray.data as rd

    from mysql_log_parser_ray.training.dedup import embedding_dup_pairs

    rng = np.random.default_rng(9)
    base = rng.standard_normal((50, 32))
    # plant near-dups: rows 50..54 are tiny perturbations of rows 0..4
    dups = base[:5] + 0.01 * rng.standard_normal((5, 32))
    x = np.vstack([base, dups])
    t = pa.table(
        {"vec_id": list(range(len(x))),
         "embedding": [row.tolist() for row in x]}
    )
    ds = rd.from_arrow(t)
    exact = embedding_dup_pairs(ds, threshold=0.95, exhaustive=True)
    approx = embedding_dup_pairs(ds, threshold=0.95, exhaustive=False)
    expected = {(i, 50 + i) for i in range(5)}
    got_exact = set(zip(exact["vec_a"], exact["vec_b"]))
    assert expected <= got_exact
    # bucketed variant recovers most planted pairs (hyperplane recall)
    got_approx = set(zip(approx["vec_a"], approx["vec_b"]))
    assert len(got_approx & expected) >= 4
    assert got_approx <= got_exact  # verification means no false positives


def test_hyperplane_lsh_occupancy_bounded_and_recall(ray_session):
    """The banded hyperplane LSH scales its per-band plane count with the
    corpus so expected bucket occupancy stays near target_bucket at ANY
    size (the fixed 256-bucket key grew occupancy linearly and re-became
    all-pairs); planted near-dup pairs are recovered at both test sizes."""
    import ray.data as rd

    from mysql_log_parser_ray.training.dedup import (
        auto_planes,
        embedding_dup_pairs,
    )

    # occupancy bound: n / 2^planes <= 2 * target at every corpus size
    # (until the 30-plane int32-key clamp at ~10^11 vectors)
    for n in (1_000, 1_000_000, 1_000_000_000):
        p = auto_planes(n, 256)
        assert n / 2 ** p <= 2 * 256
    assert auto_planes(1_000_000) > auto_planes(10_000) > auto_planes(100)

    expected = {(i, 10_000 + i) for i in range(10)}
    for n in (300, 3000):
        rng = np.random.default_rng(n)
        base = rng.standard_normal((n, 16))
        dups = base[:10] + 0.005 * rng.standard_normal((10, 16))
        ids = list(range(n)) + list(range(10_000, 10_010))
        x = np.vstack([base, dups])
        ds = rd.from_arrow(pa.table(
            {"vec_id": ids, "embedding": [r.tolist() for r in x]}
        ))
        out = embedding_dup_pairs(
            ds, threshold=0.95, exhaustive=False, target_bucket=16
        )
        got = set(zip(out["vec_a"], out["vec_b"]))
        assert expected <= got  # planted recall across band OR
        # exact verify inside buckets: every reported cosine >= threshold
        assert (out["cosine"] >= 0.95).all()
        # planted near-identical pairs agree on ~every band; first-band
        # emission must still produce each pair exactly once
        assert not out.duplicated(["vec_a", "vec_b"]).any()


def test_ivf_topk_recall(ray_session):
    import ray.data as rd

    from mysql_log_parser_ray.training.similarity import (
        brute_force_topk,
        build_ivf,
        ivf_topk,
    )

    rng = np.random.default_rng(4)
    x = rng.standard_normal((400, 16))
    t = pa.table(
        {"vec_id": list(range(len(x))), "embedding": [r.tolist() for r in x]}
    )
    ds = rd.from_arrow(t)
    queries = x[:3]
    exact = brute_force_topk(ds, queries, k=10)
    cents, bucketed = build_ivf(ds, n_centroids=8)
    approx = ivf_topk(cents, bucketed, queries, k=10, nprobe=4)
    recalls = []
    for qid in range(3):
        e = set(exact[exact["query_id"] == qid]["vec_id"])
        a = set(approx[approx["query_id"] == qid]["vec_id"])
        recalls.append(len(e & a) / 10)
    assert np.mean(recalls) >= 0.6  # nprobe=4 of 8 buckets


def test_ivf_topk_distributed_recall(ray_session):
    import ray.data as rd

    from mysql_log_parser_ray.training.similarity import (
        brute_force_topk,
        ivf_topk_distributed,
    )

    rng = np.random.default_rng(4)
    x = rng.standard_normal((400, 16))
    t = pa.table(
        {"vec_id": list(range(len(x))), "embedding": [r.tolist() for r in x]}
    )
    ds = rd.from_arrow(t)
    queries = x[:3]
    exact = brute_force_topk(ds, queries, k=10)
    approx = ivf_topk_distributed(ds, queries, k=10, nprobe=4, n_centroids=8)
    recalls = []
    for qid in range(3):
        e = set(exact[exact["query_id"] == qid]["vec_id"])
        a = set(approx[approx["query_id"] == qid]["vec_id"])
        recalls.append(len(e & a) / 10)
    assert np.mean(recalls) >= 0.6
    # the probed self-bucket always contains the query itself
    assert all(
        approx[approx["query_id"] == qid].iloc[0]["vec_id"] == qid
        for qid in range(3)
    )


def test_brute_force_topk_self_first(ray_session):
    import ray.data as rd

    from mysql_log_parser_ray.training.similarity import brute_force_topk

    rng = np.random.default_rng(2)
    x = rng.standard_normal((100, 8))
    ds = rd.from_arrow(
        pa.table({"vec_id": list(range(100)),
                  "embedding": [r.tolist() for r in x]})
    )
    out = brute_force_topk(ds, x[7], k=5)
    assert int(out.iloc[0]["vec_id"]) == 7
    assert out.iloc[0]["cosine"] == pytest.approx(1.0)


def test_multimodal_decode_plumbing(ray_session):
    import ray.data as rd

    from mysql_log_parser_ray.training.multimodal import (
        decode_features,
        decode_real,
        synth_media_table,
    )

    t = synth_media_table(64, seed=1)
    out = decode_features(rd.from_arrow(t), feature_dim=16).to_pandas()
    assert len(out) == 64
    assert all(len(f) == 16 for f in out["features"])
    merged = out.merge(t.to_pandas()[["media_id", "width", "height"]], on="media_id")
    assert (merged["decoded_width"] == merged["width"]).all()
    assert (merged["decoded_height"] == merged["height"]).all()
    # determinism across runs
    out2 = decode_features(rd.from_arrow(t), feature_dim=16).to_pandas()
    a = out.sort_values("media_id")["features"].tolist()
    b = out2.sort_values("media_id")["features"].tolist()
    assert all(np.allclose(x, y) for x, y in zip(a, b))
    # the fixture mixes REAL byte formats in: both must be present
    types = set(t["media_type"].to_pylist())
    assert {"audio/wav", "image/ppm"} <= types
    # compressed-codec decode stays an explicit stub
    with pytest.raises(NotImplementedError):
        decode_real(b"\xff\xd8\xff\xe0 not a real jpeg")


def test_real_codec_roundtrip():
    """decode_real parses actual P6 PPM and RIFF WAV bytes exactly."""
    from mysql_log_parser_ray.training.multimodal import (
        decode_real,
        encode_ppm,
        encode_wav_pcm16,
    )

    rng = np.random.default_rng(3)
    rgb = rng.integers(0, 256, size=3 * 5 * 7, dtype=np.uint8)
    w, h, body = decode_real(encode_ppm(5, 7, rgb))
    assert (w, h) == (5, 7)
    assert np.array_equal(body, rgb)
    # PPM header with a comment line parses too
    commented = b"P6\n# fixture comment\n5 7\n255\n" + rgb.tobytes()
    w2, h2, body2 = decode_real(commented)
    assert (w2, h2) == (5, 7) and np.array_equal(body2, rgb)

    samples = rng.integers(-32768, 32768, size=24).astype("<i2")
    frames, channels, data = decode_real(encode_wav_pcm16(samples, channels=2))
    assert (frames, channels) == (12, 2)
    assert np.array_equal(np.frombuffer(data.tobytes(), dtype="<i2"), samples)
    # 8-bit mono PCM also parses
    frames8, ch8, _ = decode_real(
        b"RIFF" + struct.pack("<I", 36 + 10) + b"WAVE"
        + b"fmt " + struct.pack("<IHHIIHH", 16, 1, 1, 8000, 8000, 1, 8)
        + b"data" + struct.pack("<I", 10) + bytes(range(10))
    )
    assert (frames8, ch8) == (10, 1)
    with pytest.raises(NotImplementedError):  # float PCM unsupported
        decode_real(
            b"RIFF" + struct.pack("<I", 36) + b"WAVE"
            + b"fmt " + struct.pack("<IHHIIHH", 16, 3, 1, 8000, 32000, 4, 32)
            + b"data" + struct.pack("<I", 0)
        )


def test_lang_id_heuristic():
    from mysql_log_parser_ray.training.text import lang_id_batch

    t = pa.table(
        {
            "doc_id": [1, 2, 3],
            "text": [
                "the cat and the dog sat in a corner of the room",
                "el perro y la casa de los amigos en la ciudad",
                "le chat et les amis de la ville en un jour",
            ],
        }
    )
    out = lang_id_batch(t)
    assert out["pred_lang"].to_pylist() == ["en", "es", "fr"]


def test_frame_sampling(ray_session):
    import ray.data as rd
    import struct

    from mysql_log_parser_ray.training.multimodal import (
        sample_frames,
        synth_video_table,
    )

    vids = synth_video_table(20, seed=9)
    out = sample_frames(rd.from_arrow(vids), every=4).to_pandas()
    # expected row count: ceil(nf/4) per video, frames byte-identical
    expected = 0
    payloads = {m: p for m, p in zip(vids["media_id"].to_pylist(),
                                     vids["payload"].to_pylist())}
    for mid, p in payloads.items():
        nf, w, h = struct.unpack("<III", p[4:16])
        expected += (nf + 3) // 4
        sub = out[out["media_id"] == mid]
        for r in sub.itertuples():
            fsize = r.width * r.height
            start = 16 + r.frame_index * fsize
            assert bytes(r.frame) == p[start : start + fsize]
            assert r.frame_index % 4 == 0
    assert len(out) == expected


def test_dedup_zero_pair_results_are_typed_empty(ray_session):
    """Regression (code review): no near-dups at all must return typed
    empty frames, not crash on a schema-less groupby result."""
    import ray.data as rd

    from mysql_log_parser_ray.training.dedup import (
        embedding_dup_pairs,
        simhash_near_pairs,
    )

    docs = rd.from_arrow(pa.table({
        "doc_id": [0, 1],
        "text": ["utterly unique first document text here",
                 "completely different second text entirely"],
    }))
    out = simhash_near_pairs(docs, max_hamming=1)
    assert list(out.columns) == ["doc_a", "doc_b", "hamming"] and len(out) == 0

    rng = np.random.default_rng(1)
    emb = rd.from_arrow(pa.table({
        "vec_id": list(range(6)),
        "embedding": [r.tolist() for r in rng.standard_normal((6, 16))],
    }))
    out = embedding_dup_pairs(emb, threshold=0.999, exhaustive=False)
    assert list(out.columns) == ["vec_a", "vec_b", "cosine"] and len(out) == 0


def test_minhash_max_bucket_none_is_lossless(ray_session):
    """max_bucket=None disables the bucket cap: a duplicate cluster larger
    than the default cap still reports its pairs."""
    import ray.data as rd

    texts = ["identical boilerplate text repeated verbatim"] * 250
    ds = rd.from_arrow(pa.table({"doc_id": list(range(250)), "text": texts}))
    from mysql_log_parser_ray.training.dedup import minhash_dedup_pairs

    capped = minhash_dedup_pairs(ds, threshold=0.9)  # default cap 200
    assert len(capped) == 0  # documented drop for saturated buckets
    lossless = minhash_dedup_pairs(ds, threshold=0.9, max_bucket=None)
    assert len(lossless) == 250 * 249 // 2


def test_curation_pipeline_end_to_end(ray_session, tmp_path):
    """Composite curation: quality filter -> exact dedup -> near-dup
    removal -> partitioned curated output."""
    import glob
    import ray.data as rd
    import pyarrow.parquet as pq

    long_doc = ("informative sentence with many plain words " * 4).strip()
    near_dup = long_doc.replace("plain", "simple")
    rows = {
        "doc_id": [0, 1, 2, 3, 4, 5],
        "text": [
            long_doc,                      # keeper
            long_doc,                      # exact dup of 0 -> dropped
            near_dup,                      # near-dup of 0 -> dropped at 0.3
            "too short",                   # quality: < 10 words
            ",,,,. ! ? ; : . , ! ? ; :",   # quality: punct ratio
            "another completely different long document with plenty of "
            "ordinary words to pass the quality threshold easily",  # keeper
        ],
        "source": ["s0", "s0", "s1", "s1", "s0", "s1"],
    }
    ds = rd.from_arrow(pa.table(rows))
    from mysql_log_parser_ray.training.curate import curate_keep_list, write_curated

    keep = curate_keep_list(ds, near_dup_threshold=0.3)
    kept = sorted(keep.to_pandas()["doc_id"] if hasattr(keep, "to_pandas")
                  else keep["doc_id"].to_pylist())
    assert kept == [0, 5]

    out = str(tmp_path / "curated")
    write_curated(ds, out, keep)
    files = glob.glob(f"{out}/**/*.parquet", recursive=True)
    got = pa.concat_tables([pq.read_table(f, columns=["doc_id"]) for f in files])
    assert sorted(got["doc_id"].to_pylist()) == [0, 5]
    # partitioned by source
    assert any("source=s0" in f for f in files) and any("source=s1" in f for f in files)


def test_curate_zero_survivors(ray_session):
    """Regression (review 4): every doc failing the quality filter must
    yield a typed empty keep-list, not a KeyError, in both paths."""
    import ray.data as rd

    from mysql_log_parser_ray.training.curate import curate_keep_list, write_curated

    ds = rd.from_arrow(pa.table({
        "doc_id": [0, 1], "text": ["too short", "also short"],
        "source": ["s", "s"],
    }))
    for thr in (None, 0.5):
        keep = curate_keep_list(ds, near_dup_threshold=thr)
        df = keep.to_pandas() if hasattr(keep, "to_pandas") else keep
        assert len(df) == 0
    # write path: no-op, no crash
    import tempfile, os
    with tempfile.TemporaryDirectory() as d:
        write_curated(ds, os.path.join(d, "out"), curate_keep_list(ds))


def test_simhash_max_hamming_bound(ray_session):
    import ray.data as rd

    from mysql_log_parser_ray.training.dedup import simhash_near_pairs

    ds = rd.from_arrow(pa.table({"doc_id": [0, 1], "text": ["a b", "c d"]}))
    with pytest.raises(ValueError, match="max_hamming"):
        simhash_near_pairs(ds, max_hamming=64)


def test_simhash_batch_matches_scalar():
    """The vectorized simhash_batch must stay bit-identical to the scalar
    simhash64 reference (unique-word factorize + reduceat + packbits vs
    the per-word loop)."""
    from mysql_log_parser_ray.training.dedup import simhash64, simhash_batch

    texts = [
        "hello world",
        "",
        "   ",
        "  lots\t of\n whitespace  ",
        "Hello WORLD hello",
        "word " * 300,
        "punct! mixed, 123 numbers?",
    ]
    t = pa.table({"doc_id": list(range(len(texts))), "text": texts})
    got = simhash_batch(t)["simhash"].to_pylist()
    assert got == [simhash64(x) for x in texts]


def test_minhash_verify_is_distributed(ray_session, docs_ds):
    """minhash_dedup_pairs must agree with a driver-side exact-Jaccard
    recomputation of its own reported pairs (the verify step now runs in
    workers; this pins its correctness)."""
    from mysql_log_parser_ray.training.dedup import (
        char_shingles,
        jaccard,
        minhash_dedup_pairs,
    )

    out = minhash_dedup_pairs(docs_ds, threshold=0.8)
    assert list(out.columns) == ["doc_a", "doc_b", "jaccard"]
    docs = docs_ds.to_pandas().set_index("doc_id")["text"]
    for r in out.itertuples(index=False):
        j = jaccard(char_shingles(docs[r.doc_a]), char_shingles(docs[r.doc_b]))
        assert abs(j - r.jaccard) < 1e-12 and j >= 0.8


def test_minhash_string_doc_ids(ray_session):
    """Review fix: the verify path must support non-integer doc ids."""
    import ray.data as rd

    base = "the quick brown fox jumps over the lazy dog " * 8
    docs = rd.from_arrow(pa.table({
        "doc_id": [f"d{i}" for i in range(6)],
        "text": [base, base + "tail!", "utterly different text entirely " * 6,
                 base, "another unrelated document body " * 6, base + "tail?"],
    }))
    from mysql_log_parser_ray.training.dedup import minhash_dedup_pairs

    out = minhash_dedup_pairs(docs, threshold=0.8)
    assert len(out) >= 3  # d0/d3 identical, d1/d5 near-identical, cross pairs
    assert out["doc_a"].map(type).eq(str).all()
    pairs = set(zip(out["doc_a"], out["doc_b"]))
    assert ("d0", "d3") in pairs


def test_minhash_est_perms_clamped(ray_session, docs_ds):
    """est_perms beyond the signature width must clamp, not crash."""
    from mysql_log_parser_ray.training.dedup import minhash_dedup_pairs

    big = minhash_dedup_pairs(docs_ds, threshold=0.8, est_perms=256)
    ref = minhash_dedup_pairs(docs_ds, threshold=0.8, est_perms=64)
    import pandas as pd

    pd.testing.assert_frame_equal(
        big.reset_index(drop=True), ref.reset_index(drop=True)
    )


def test_embedding_tiles_with_empty_block(ray_session):
    """Review fix: empty blocks (over-partitioned tiny table) must not
    break schema unification in the tiles path."""
    import ray.data as rd

    from mysql_log_parser_ray.training.dedup import embedding_dup_pairs_tiles

    rng = np.random.default_rng(3)
    x = rng.standard_normal((5, 8))
    x[1] = x[0] * 2.0  # exact-direction duplicate pair (cosine 1)
    emb = rd.from_arrow(pa.table({
        "vec_id": list(range(5)),
        "embedding": [r.tolist() for r in x],
    })).repartition(16)  # more blocks than rows -> empty blocks
    out = embedding_dup_pairs_tiles(emb, threshold=0.999)
    assert [tuple(r) for r in out[["vec_a", "vec_b"]].to_numpy()] == [(0, 1)]


def test_minhash_recall_on_planted_near_dups(ray_session):
    """Recall guard for the banding + signature-estimate prefilter: pairs
    planted well above the threshold must ALL be reported (the prefilter's
    4-sigma margin and 16x4 banding both claim negligible miss rates —
    this pins it on 40 planted pairs with j ~ 0.85-0.97)."""
    import ray.data as rd

    from mysql_log_parser_ray.training.dedup import (
        char_shingles,
        jaccard,
        minhash_dedup_pairs,
    )

    rng = np.random.default_rng(31)
    words = [f"tok{i}" for i in range(400)]
    ids, texts = [], []
    planted = []
    k = 0
    for p in range(40):
        base_words = list(rng.choice(words, size=120))
        a = " ".join(base_words)
        b_words = base_words.copy()
        # light edit: replace a couple of words -> jaccard stays high
        for pos in rng.choice(len(b_words), size=2, replace=False):
            b_words[pos] = str(rng.choice(words))
        b = " ".join(b_words)
        if jaccard(char_shingles(a), char_shingles(b)) < 0.82:
            continue  # only plant clearly-above-threshold pairs
        ids += [k, k + 1]
        texts += [a, b]
        planted.append((k, k + 1))
        k += 2
    # noise docs
    for _ in range(150):
        ids.append(k)
        texts.append(" ".join(rng.choice(words, size=120)))
        k += 1
    docs = rd.from_arrow(pa.table({"doc_id": ids, "text": texts}))
    out = minhash_dedup_pairs(docs, threshold=0.8)
    found = set(zip(out["doc_a"], out["doc_b"]))
    missed = [p for p in planted if p not in found]
    assert not missed, f"planted near-dups missed: {missed}"


def test_minhash_joined_verify_matches_broadcast(ray_session):
    """The distributed pair-join verify path (pair_broadcast_limit
    exceeded) must produce bit-identical results to the broadcast path on
    a dup-heavy (~20% near-dup) corpus — the candidate pair Dataset never
    reaches the driver in that mode."""
    import ray.data as rd

    from mysql_log_parser_ray.training.dedup import minhash_dedup_pairs

    rng = np.random.default_rng(57)
    words = [f"tok{i}" for i in range(400)]
    ids, texts = [], []
    k = 0
    for _ in range(30):  # planted near-dup pairs (~20% of docs duplicated)
        base = list(rng.choice(words, size=120))
        a = " ".join(base)
        b_words = base.copy()
        for pos in rng.choice(len(b_words), size=2, replace=False):
            b_words[pos] = str(rng.choice(words))
        ids += [k, k + 1]
        texts += [a, " ".join(b_words)]
        k += 2
    for _ in range(240):
        ids.append(k)
        texts.append(" ".join(rng.choice(words, size=120)))
        k += 1
    docs = rd.from_arrow(pa.table({"doc_id": ids, "text": texts})).repartition(8)

    via_broadcast = minhash_dedup_pairs(docs, threshold=0.8)
    via_join = minhash_dedup_pairs(docs, threshold=0.8, pair_broadcast_limit=0)
    assert len(via_broadcast) >= 20  # the corpus genuinely is dup-heavy
    import pandas as pd

    pd.testing.assert_frame_equal(via_broadcast, via_join)


def test_minhash_joined_verify_string_ids(ray_session):
    """The joined verify path keeps non-integer doc ids intact (ids are
    join keys end-to-end, never arithmetic)."""
    import ray.data as rd

    from mysql_log_parser_ray.training.dedup import minhash_dedup_pairs

    base = "the quick brown fox jumps over the lazy dog " * 8
    docs = rd.from_items(
        [
            {"doc_id": "a1", "text": base},
            {"doc_id": "b2", "text": base + " tail"},
            {"doc_id": "c3", "text": "completely different content here"},
        ]
    )
    out = minhash_dedup_pairs(docs, threshold=0.8, pair_broadcast_limit=0)
    assert list(zip(out["doc_a"], out["doc_b"])) == [("a1", "b2")]


def test_curate_anti_join_matches_broadcast(ray_session, tmp_path):
    """Past keep_broadcast_limit the near-dup branch must switch to the
    semi-join + anti-join shape and produce the identical keep set; the
    write path must likewise select by semi-join."""
    import glob
    import ray.data as rd
    import pyarrow.parquet as pq

    from mysql_log_parser_ray.training.curate import curate_keep_list, write_curated

    long_doc = ("informative sentence with many plain words " * 4).strip()
    rows = {
        "doc_id": [0, 1, 2, 3, 4, 5],
        "text": [
            long_doc,
            long_doc,                              # exact dup -> dropped
            long_doc.replace("plain", "simple"),   # near-dup -> dropped
            "too short",
            ",,,,. ! ? ; : . , ! ? ; :",
            "another completely different long document with plenty of "
            "ordinary words to pass the quality threshold easily",
        ],
        "source": ["s0", "s0", "s1", "s1", "s0", "s1"],
    }
    ds = rd.from_arrow(pa.table(rows))

    via_broadcast = curate_keep_list(ds, near_dup_threshold=0.3)
    via_join = curate_keep_list(
        ds, near_dup_threshold=0.3, keep_broadcast_limit=0
    )
    want = sorted(via_broadcast.to_pandas()["doc_id"])
    got = sorted(via_join.to_pandas()["doc_id"])
    assert got == want == [0, 5]

    out = str(tmp_path / "curated_join")
    write_curated(ds, out, via_join, keep_broadcast_limit=0)
    files = glob.glob(f"{out}/**/*.parquet", recursive=True)
    written = pa.concat_tables(
        [pq.read_table(f, columns=["doc_id"]) for f in files]
    )
    assert sorted(written["doc_id"].to_pylist()) == [0, 5]


def test_curate_anti_join_no_near_dups(ray_session):
    """Joined path with zero near-dup pairs: the empty drop Dataset must
    flow through the anti-join (schema-ful empty bundles), keeping all
    exact-dedup survivors."""
    import ray.data as rd

    from mysql_log_parser_ray.training.curate import curate_keep_list

    docs = [
        f"document number {i} holds its own completely distinct set of "
        f"payload words alpha{i} beta{i} gamma{i} delta{i}"
        for i in range(12)
    ]
    ds = rd.from_arrow(
        pa.table({"doc_id": list(range(12)), "text": docs})
    ).repartition(4)
    keep = curate_keep_list(ds, near_dup_threshold=0.9, keep_broadcast_limit=0)
    assert sorted(keep.to_pandas()["doc_id"]) == list(range(12))


@pytest.mark.skipif(
    os.environ.get("MLPR_BIG_TESTS") != "1",
    reason="~3 min at 4 CPUs; run with MLPR_BIG_TESTS=1 "
    "(measured run recorded in BASELINE.md round 3)",
)
def test_curate_anti_join_million_survivors(ray_session):
    """>=1M survivors through the joined near-dup branch: completes with
    the full keep set and without any survivor-sized driver collection
    (measured driver peak RSS 0.19 GB at 1.1M survivors)."""
    import ray.data as rd

    from mysql_log_parser_ray.training.curate import curate_keep_list

    n_docs = 1_100_000

    def _synth(b: pa.Table) -> pa.Table:
        ids = b["id"].to_numpy()
        texts = [" ".join(f"w{i}x{j}" for j in range(10)) for i in ids]
        return pa.table(
            {"doc_id": pa.array(ids, pa.int64()), "text": pa.array(texts)}
        )

    docs = rd.range(n_docs).map_batches(_synth, batch_format="pyarrow")
    keep = curate_keep_list(
        docs, near_dup_threshold=0.8, keep_broadcast_limit=100_000
    )
    assert keep.count() == n_docs


def test_pack_sequences_semantics(ray_session):
    """Offset-binning pack assignment: per-key tape offsets reset per key,
    a doc belongs to the bin its first token falls in, and the map is
    identical across input partitionings."""
    import ray.data as rd

    from mysql_log_parser_ray.training.pack import pack_sequences

    rows = {
        "doc_id": [0, 1, 2, 3, 10, 11],
        "source": ["a", "a", "a", "a", "b", "b"],
        "text": [
            "w1 w2 w3",          # 3 tok, offset 0  -> pack 0
            "x1 x2 x3 x4",       # 4 tok, offset 3  -> pack 0
            "y1 y2",             # 2 tok, offset 7  -> pack 0 (spans into 1)
            "z1",                # 1 tok, offset 9  -> pack 1
            "p1 p2 p3 p4 p5 p6 p7 p8",  # b: offset 0 -> pack 0
            "q1",                # b: offset 8 -> pack 1
        ],
    }
    ds = rd.from_arrow(pa.table(rows))
    out = pack_sequences(ds, budget_tokens=8, key_col="source")
    got = {
        (r.source, int(r.doc_id)): (int(r.tok_offset), int(r.pack_id))
        for r in out.itertuples()
    }
    assert got == {
        ("a", 0): (0, 0), ("a", 1): (3, 0), ("a", 2): (7, 0), ("a", 3): (9, 1),
        ("b", 10): (0, 0), ("b", 11): (8, 1),
    }

    re8 = pack_sequences(
        ds.repartition(5), budget_tokens=8, key_col="source"
    )
    pd.testing.assert_frame_equal(out, re8)

    with pytest.raises(ValueError):
        pack_sequences(ds, budget_tokens=0)


def test_pack_sequences_as_dataset(ray_session):
    """Scale mode: the doc->pack map stays distributed and totals agree
    with the collected path."""
    import ray.data as rd

    from mysql_log_parser_ray.training.pack import pack_sequences

    n = 500
    ds = rd.from_arrow(
        pa.table(
            {
                "doc_id": list(range(n)),
                "source": [f"s{i % 7}" for i in range(n)],
                "text": ["tok " * (1 + i % 13) for i in range(n)],
            }
        )
    ).repartition(8)
    dist = pack_sequences(ds, budget_tokens=64, as_dataset=True)
    local = pack_sequences(ds, budget_tokens=64)
    assert dist.count() == n == len(local)
    dsum = dist.to_pandas().sort_values(["source", "doc_id"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(dsum, local)


def test_vector_centroids(ray_session):
    """Distributed vector centroid equals the numpy mean per key,
    independent of partitioning; ragged vectors are rejected."""
    import ray.data as rd

    from mysql_log_parser_ray.training.vectors import vector_centroids

    rng = np.random.default_rng(11)
    n, dim = 300, 8
    labels = rng.integers(0, 5, n)
    mat = rng.normal(size=(n, dim)).astype(np.float32)
    t = pa.table(
        {
            "label": pa.array(labels, pa.int32()),
            "embedding": pa.array(list(mat), pa.list_(pa.float32())),
        }
    )
    for parts in (1, 7):
        out = vector_centroids(rd.from_arrow(t).repartition(parts))
        for lab in range(5):
            want = np.round(
                mat[labels == lab].astype(np.float64).mean(axis=0), 6
            )
            got = out[out["label"] == lab].sort_values("pos")["centroid"].to_numpy()
            np.testing.assert_allclose(got, want, atol=1e-6)

    ragged = pa.table(
        {
            "label": pa.array([0, 0], pa.int32()),
            "embedding": pa.array([[1.0, 2.0], [1.0]], pa.list_(pa.float32())),
        }
    )
    with pytest.raises(Exception):
        vector_centroids(rd.from_arrow(ragged))


def test_kmeans_distributed(ray_session):
    """Distributed Lloyd's matches a local numpy reference running the
    same per-iteration 6dp-rounding convention, independent of
    partitioning; the as_dataset assignment path agrees with the summary."""
    import ray.data as rd

    from mysql_log_parser_ray.training.vectors import kmeans

    rng = np.random.default_rng(7)
    n, dim, k = 400, 6, 5
    proto = rng.normal(size=(k, dim))
    mat = (proto[rng.integers(0, k, n)] + 0.1 * rng.normal(size=(n, dim))).astype(
        np.float32
    )
    t = pa.table(
        {
            "vec_id": list(range(n)),
            "embedding": pa.array(list(mat), pa.list_(pa.float32())),
        }
    )
    init = mat[:k].astype(np.float64)

    # local reference (identical rounding + argmin tie rule)
    m = mat.astype(np.float64)
    cents = np.round(init, 6)
    for _ in range(5):
        d = ((m[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
        a = d.argmin(axis=1)
        new = cents.copy()
        for j in range(k):
            if (a == j).any():
                new[j] = m[a == j].sum(axis=0) / (a == j).sum()
        cents = np.round(new, 6)
    d = ((m[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
    a = d.argmin(axis=1)
    micro = np.floor(d[np.arange(n), a] * 1e6 + 0.5).astype(np.int64)
    want = (
        pd.DataFrame({"cluster": a.astype("int64"), "inertia_micro": micro})
        .groupby("cluster", as_index=False)
        .agg(n_vecs=("cluster", "size"), inertia_micro=("inertia_micro", "sum"))
    )
    want["n_vecs"] = want["n_vecs"].astype("int64")
    want["inertia"] = want["inertia_micro"] / 1e6
    want = want[["cluster", "n_vecs", "inertia"]]

    outs = []
    for parts in (1, 7):
        out = kmeans(rd.from_arrow(t).repartition(parts), init, n_iter=5)
        pd.testing.assert_frame_equal(out, want)
        outs.append(out)
    pd.testing.assert_frame_equal(outs[0], outs[1])

    assigned = kmeans(
        rd.from_arrow(t).repartition(5), init, n_iter=5, as_dataset=True
    ).to_pandas()
    assert len(assigned) == n
    got_counts = (
        assigned.groupby("cluster")["vec_id"].size().sort_index().to_numpy()
    )
    np.testing.assert_array_equal(got_counts, want["n_vecs"].to_numpy())
    np.testing.assert_array_equal(
        assigned.sort_values("vec_id")["cluster"].to_numpy(), a
    )


def test_bloom_prefilter(ray_session):
    """The distributed bloom build has NO false negatives (every member
    passes), a sane false-positive rate at the default sizing, and
    bloom_prefilter + exact semi-join equals the direct semi-join."""
    import ray.data as rd

    from mysql_log_parser_ray.state.bloom import (
        bloom_maybe,
        bloom_prefilter,
        build_bloom,
    )

    rng = np.random.default_rng(13)
    members = np.unique(rng.integers(0, 1 << 40, 50_000).astype(np.int64))
    ids_ds = rd.from_arrow(
        pa.table({"doc_id": pa.array(members, pa.int64())})
    ).repartition(8)
    bits = build_bloom(ids_ds)

    assert bloom_maybe(bits, members).all()  # no false negatives, ever

    non = np.unique(rng.integers(1 << 41, 1 << 42, 50_000).astype(np.int64))
    fp = bloom_maybe(bits, non).mean()
    assert fp < 0.05, fp  # ~0.1% expected at 50k ids / 2^23 bits

    corpus = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(
                    np.concatenate([members[:1000], non[:9000]]), pa.int64()
                ),
                "payload": pa.array(["x"] * 10000, pa.string()),
            }
        )
    ).repartition(4)
    pre = bloom_prefilter(corpus, ids_ds)
    # the prefilter passes every true member and drops (almost) everything else
    kept = pre.to_pandas()
    assert set(members[:1000]).issubset(set(kept["doc_id"]))
    assert len(kept) < 1000 + 0.05 * 9000
    joined = pre.join(ids_ds, "left_semi", num_partitions=8, on=("doc_id",))
    got = sorted(joined.to_pandas()["doc_id"])
    assert got == sorted(members[:1000])


def test_stratified_sample_partition_invariant(ray_session, tmp_path):
    """The md5-rank quota sample is a pure function of the rows: the same
    docs are chosen no matter how the input is blocked (the property that
    makes it reproducible across cluster sizes)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from mysql_log_parser_ray.training.registry import q_docs_stratified_sample

    n = 300
    pq.write_table(
        pa.table({
            "doc_id": pa.array(range(n), pa.int64()),
            "source": pa.array([f"s{i % 3}" for i in range(n)], pa.string()),
            "text": pa.array(["x"] * n, pa.string()),
        }),
        str(tmp_path / "documents.parquet"),
    )
    import ray.data as rd
    from unittest import mock

    base = q_docs_stratified_sample(str(tmp_path))

    real_read = rd.read_parquet

    def chopped(path, **kw):
        kw["override_num_blocks"] = 13
        return real_read(path, **kw)

    with mock.patch.object(rd, "read_parquet", side_effect=chopped):
        alt = q_docs_stratified_sample(str(tmp_path))
    pd.testing.assert_frame_equal(base, alt)
    assert (base.groupby("source").size() == 5).all()


@pytest.mark.parametrize("limit", [2_000_000, 0], ids=["driver-uf", "distributed"])
def test_connected_components_shapes(ray_session, limit):
    """Both the size-gated driver union-find and the distributed
    label-propagation rounds find the right components on a graph with a
    long chain (multi-round convergence), a clique, and disjoint pairs;
    cluster_rep is the component minimum."""
    import pyarrow as pa
    import ray.data as rd

    from mysql_log_parser_ray.training.graph import connected_components

    # chain 1-2-3-4-5-6, clique {10,11,12}, pair {20,21}
    edges = [(1, 2), (2, 3), (3, 4), (4, 5), (5, 6),
             (10, 11), (11, 12), (10, 12), (21, 20)]
    ds = rd.from_arrow(pa.table({
        "doc_a": pa.array([a for a, _ in edges], pa.int64()),
        "doc_b": pa.array([b for _, b in edges], pa.int64()),
    })).repartition(4)
    out = (
        connected_components(ds, small_graph_limit=limit)
        .to_pandas().set_index("node")["cluster_rep"]
    )
    assert {n: out[n] for n in (1, 2, 3, 4, 5, 6)} == {n: 1 for n in range(1, 7)}
    assert {n: out[n] for n in (10, 11, 12)} == {n: 10 for n in (10, 11, 12)}
    assert out[20] == 20 and out[21] == 20
    assert len(out) == 11


def test_connected_components_empty_and_maxiter(ray_session):
    import pyarrow as pa
    import ray.data as rd
    import pytest as _pytest

    from mysql_log_parser_ray.training.graph import connected_components

    empty = rd.from_arrow(pa.table({
        "doc_a": pa.array([], pa.int64()),
        "doc_b": pa.array([], pa.int64()),
    }))
    assert len(connected_components(empty).to_pandas()) == 0

    chain = rd.from_arrow(pa.table({
        "doc_a": pa.array(range(0, 9), pa.int64()),
        "doc_b": pa.array(range(1, 10), pa.int64()),
    }))
    with _pytest.raises(RuntimeError, match="fixpoint"):
        connected_components(chain, max_iter=2, small_graph_limit=0)


def test_curate_cluster_removal_policies(ray_session, tmp_path):
    """cluster_removal keeps exactly ONE doc per transitive near-dup
    cluster, where the pairwise rule keeps every non-doc_b: docs a-c and
    b-c are pairs but a-b is not, so pairwise keeps {a,b} and cluster
    keeps {a}. Both size-gate paths agree."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray.data as rd

    from mysql_log_parser_ray.training.curate import curate_keep_list

    w = [f"w{i}" for i in range(1, 13)]
    c_text = " ".join(w)
    a_text = " ".join(w[:10] + ["x1", "x2"])
    b_text = " ".join(["y1", "y2"] + w[2:])
    other = " ".join(f"z{i}" for i in range(12))
    docs = pa.table({
        "doc_id": pa.array([1, 2, 3, 9], pa.int64()),
        "text": pa.array([a_text, b_text, c_text, other], pa.string()),
    })
    pq.write_table(docs, str(tmp_path / "documents.parquet"))
    ds = rd.read_parquet(str(tmp_path / "documents.parquet"))

    pairwise = sorted(curate_keep_list(
        ds, near_dup_threshold=0.5).to_pandas()["doc_id"])
    assert pairwise == [1, 2, 9]  # c(3) dropped as doc_b of both pairs

    cluster = sorted(curate_keep_list(
        ds, near_dup_threshold=0.5, cluster_removal=True
    ).to_pandas()["doc_id"])
    assert cluster == [1, 9]  # one representative for {1,2,3}

    joined = sorted(curate_keep_list(
        ds, near_dup_threshold=0.5, cluster_removal=True,
        keep_broadcast_limit=0,
    ).to_pandas()["doc_id"])
    assert joined == cluster


def test_contamination_planted_and_unicode(ray_session, tmp_path):
    """A doc sharing a 13-char window with the benchmark doc is flagged,
    a clean doc is not, and windows are CODE POINTS (non-ASCII text
    agrees with the SQL substring oracle semantics)."""
    import duckdb
    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray.data as rd

    from mysql_log_parser_ray.training.decontam import contamination_counts

    bench_text = "das ist ein häßlich-geheimer Prüfsatz für die Bank"
    dirty = "prefix text " + bench_text[10:30] + " suffix words here"
    clean = "völlig anderer Inhalt ohne jede Überlappung überhaupt x"
    short = "tiny"  # shorter than one window: never contaminated
    t = pa.table({
        "doc_id": pa.array([0, 1, 2, 3], pa.int64()),  # 0 -> benchmark (0 % 97 == 0)
        "text": pa.array([bench_text, dirty, clean, short], pa.string()),
        "source": pa.array(["s", "s", "s", "s"], pa.string()),
    })
    pq.write_table(t, str(tmp_path / "documents.parquet"))
    ds = rd.read_parquet(str(tmp_path / "documents.parquet"))
    out = contamination_counts(ds).set_index("source")
    assert int(out.loc["s", "n_docs"]) == 3
    assert int(out.loc["s", "n_contaminated"]) == 1  # only the planted doc

    con = duckdb.connect()
    con.sql(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{tmp_path}/documents.parquet')"
    )
    import __ray_entry__ as e

    want = con.sql(e.oracle_sql()["contamination_counts"]).df()
    assert int(want["n_contaminated"].iloc[0]) == 1
    assert int(want["n_docs"].iloc[0]) == 3


def test_nn_join_tie_and_duplicate_vectors(ray_session):
    """Duplicate vectors: cosine 1.0 both ways, winner is the smallest
    neighbour id (the rounded-rank invariant)."""
    import pyarrow as pa
    import ray.data as rd

    from mysql_log_parser_ray.training.similarity import nn_join_broadcast

    v = [1.0, 0.0, 0.0]
    w = [0.0, 1.0, 0.0]
    ds = rd.from_arrow(pa.table({
        "vec_id": pa.array([7, 3, 5], pa.int64()),
        "embedding": pa.array([v, v, w], pa.list_(pa.float32())),
    }))
    out = nn_join_broadcast(ds).set_index("vec_id")
    assert out.loc[7, "nn_id"] == 3 and out.loc[7, "cos"] == 1.0
    assert out.loc[3, "nn_id"] == 7 and out.loc[3, "cos"] == 1.0
    # w is orthogonal to both copies of v: tie at 0.0 -> smallest id wins
    assert out.loc[5, "nn_id"] == 3 and out.loc[5, "cos"] == 0.0


def test_nn_join_single_vector_no_self_match(ray_session):
    """A one-row corpus has no valid neighbour: the oracle's
    a.vec_id <> b.vec_id join returns zero rows, so must we (the argmax
    over an all-self-masked row used to fabricate a cos=-inf match)."""
    import pyarrow as pa
    import ray.data as rd

    from mysql_log_parser_ray.training.similarity import nn_join_broadcast

    ds = rd.from_arrow(pa.table({
        "vec_id": pa.array([42], pa.int64()),
        "embedding": pa.array([[1.0, 0.0, 0.0]], pa.list_(pa.float32())),
    }))
    out = nn_join_broadcast(ds)
    assert len(out) == 0
    assert list(out.columns) == ["vec_id", "nn_id", "cos"]


def test_stratified_sample_underfull_group(ray_session, tmp_path):
    """A source with fewer than k docs keeps them all."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from mysql_log_parser_ray.training.registry import q_docs_stratified_sample

    pq.write_table(
        pa.table({
            "doc_id": pa.array([1, 2, 3, 10, 11, 12, 13, 14, 15, 16], pa.int64()),
            "source": pa.array(["tiny"] * 3 + ["big"] * 7, pa.string()),
            "text": pa.array(["x"] * 10, pa.string()),
        }),
        str(tmp_path / "documents.parquet"),
    )
    out = q_docs_stratified_sample(str(tmp_path))
    sizes = out.groupby("source").size()
    assert sizes["tiny"] == 3 and sizes["big"] == 5


def test_contamination_no_benchmark_docs(ray_session, tmp_path):
    """A corpus with no benchmark ids (none % 97 == 0) reports zero
    contamination for every doc."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray.data as rd

    from mysql_log_parser_ray.training.decontam import contamination_counts

    pq.write_table(
        pa.table({
            "doc_id": pa.array([1, 2, 3], pa.int64()),
            "text": pa.array(["some shared prefix words here"] * 3, pa.string()),
            "source": pa.array(["s"] * 3, pa.string()),
        }),
        str(tmp_path / "documents.parquet"),
    )
    out = contamination_counts(
        rd.read_parquet(str(tmp_path / "documents.parquet"))
    ).set_index("source")
    assert int(out.loc["s", "n_docs"]) == 3
    assert int(out.loc["s", "n_contaminated"]) == 0


def test_epoch_loader_two_level_shuffle(ray_session):
    """Epoch order is a true permutation (every row exactly once), the
    same seed reproduces it exactly, a different seed changes it, and
    rows genuinely move within blocks."""
    import pyarrow as pa
    import ray.data as rd

    from mysql_log_parser_ray.training.loader import epoch_batches

    n = 2000
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array(range(n), pa.int64()),
    })).repartition(8).materialize()

    def order(seed):
        out = []
        for b in epoch_batches(ds, seed, batch_size=256):
            out.extend(b["doc_id"].to_pylist())
        return out

    a1, a2, b = order(7), order(7), order(8)
    assert sorted(a1) == list(range(n))      # permutation, nothing lost
    assert a1 == a2                           # same seed -> same epoch
    assert a1 != b                            # different seed -> different
    assert a1 != list(range(n))               # actually shuffled


@pytest.mark.skipif(
    os.environ.get("MLPR_BIG_TESTS") != "1",
    reason="~1 min; run with MLPR_BIG_TESTS=1 for the distributed-CC scale check",
)
def test_connected_components_distributed_at_scale(ray_session):
    """2M-edge graph through the DISTRIBUTED label-propagation path:
    identical labels to the driver union-find, bounded driver RSS."""
    import tracemalloc

    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from mysql_log_parser_ray.training.graph import connected_components

    # 500k chains of length 5 (4 edges each): nodes 10*i..10*i+4
    base = np.repeat(np.arange(500_000, dtype=np.int64) * 10, 4)
    off = np.tile(np.arange(4, dtype=np.int64), 500_000)
    a = base + off
    b = base + off + 1
    ds = rd.from_arrow(pa.table({
        "doc_a": pa.array(a), "doc_b": pa.array(b),
    })).repartition(16).materialize()

    # driver PYTHON-heap bound (RSS would count shared plasma mmaps):
    # nothing node- or edge-cardinality may live on the driver except the
    # final 2.5M-row label frame collected at the end
    tracemalloc.start()
    dist = (
        connected_components(ds, small_graph_limit=0)
        .to_pandas().sort_values("node").reset_index(drop=True)
    )
    _cur, peak = tracemalloc.get_traced_memory()
    tracemalloc.stop()
    assert len(dist) == 2_500_000
    # every node's rep is its chain head
    nodes = dist["node"].to_numpy()
    assert (dist["cluster_rep"].to_numpy() == (nodes // 10) * 10).all()
    result_bytes = 2_500_000 * 16  # node + cluster_rep int64s
    assert peak < result_bytes * 6 + 100 * 1024 * 1024, peak


def test_broadcast_guards_fail_fast(ray_session, tmp_path):
    """Past their broadcast bounds the NN join and decontamination raise
    with the named remedy instead of silently collecting the corpus."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray.data as rd
    import pytest as _pytest

    from mysql_log_parser_ray.training.decontam import contamination_counts
    from mysql_log_parser_ray.training.similarity import nn_join_broadcast

    emb = rd.from_arrow(pa.table({
        "vec_id": pa.array([1, 2, 3], pa.int64()),
        "embedding": pa.array([[1.0, 0.0]] * 3, pa.list_(pa.float32())),
    }))
    with _pytest.raises(ValueError, match="tile cross-product"):
        nn_join_broadcast(emb, max_broadcast_rows=2)

    pq.write_table(
        pa.table({
            "doc_id": pa.array([0, 1], pa.int64()),
            "text": pa.array(["abcdefghijklmnop", "zzzz"], pa.string()),
            "source": pa.array(["s", "s"], pa.string()),
        }),
        str(tmp_path / "documents.parquet"),
    )
    ds = rd.read_parquet(str(tmp_path / "documents.parquet"))
    with _pytest.raises(ValueError, match="bloom prefilter"):
        contamination_counts(ds, max_bench_grams=1)


def test_gopher_rules_batch_edges():
    """Rule semantics on crafted docs: pass-all, repetition-only fail,
    short-doc fail, whitespace-only doc must not crash."""
    import pyarrow as pa

    from mysql_log_parser_ray.training.text import gopher_rules_batch

    good = " ".join(
        ["the", "a", "of", "to"] + [f"word{i:02d}" for i in range(16)]
    )  # 20 words, all unique, 4 stopword hits, every word >= 4 chars... ('the'=3)
    # mean-word-length rule is aggregate (total chars / words), not per word
    repetitive = " ".join(["boilerplate"] * 30 + ["the", "a"])  # uniq frac ~0.09
    short = "the a tiny"
    ws_only = "   \t  "
    out = gopher_rules_batch(
        pa.table({"source": ["s"] * 4, "text": [good, repetitive, short, ws_only]})
    ).to_pandas()
    assert out["n_docs"].tolist() == [1, 1, 1, 1]
    g, r, s, w = out.iloc[0], out.iloc[1], out.iloc[2], out.iloc[3]
    assert g["n_pass"] == 1 and g["n_wc_ok"] == 1 and g["n_uniq_ok"] == 1
    assert r["n_wc_ok"] == 1 and r["n_uniq_ok"] == 0 and r["n_pass"] == 0
    assert s["n_wc_ok"] == 0 and s["n_pass"] == 0
    assert w["n_pass"] == 0


def test_chunk_documents_semantics(ray_session):
    """Window/stride coverage: every token covered, final chunk short but
    nonempty, single chunk when n <= window, text slices line up."""
    import pyarrow as pa
    import ray.data as rd

    from mysql_log_parser_ray.training.pack import chunk_documents

    docs = rd.from_arrow(pa.table({
        "doc_id": pa.array([1, 2, 3], pa.int64()),
        "text": pa.array([
            " ".join(f"w{i}" for i in range(10)),   # n=10 <= 16 -> 1 chunk
            " ".join(f"w{i}" for i in range(16)),   # n=16 -> exactly 1
            " ".join(f"w{i}" for i in range(30)),   # n=30 -> 1+ceil(14/12)=3
        ]),
    }))
    out = chunk_documents(
        docs, chunk_tokens=16, overlap=4, with_text=True
    ).to_pandas().sort_values(["doc_id", "chunk_seq"]).reset_index(drop=True)
    by = {d: g for d, g in out.groupby("doc_id")}
    assert len(by[1]) == 1 and by[1]["n_chunk_tokens"].iloc[0] == 10
    assert len(by[2]) == 1 and by[2]["n_chunk_tokens"].iloc[0] == 16
    assert len(by[3]) == 3
    assert by[3]["n_chunk_tokens"].tolist() == [16, 16, 6]
    # chunk 2 of doc 3 starts at token 24 and has 6 tokens
    assert by[3]["chunk_text"].iloc[2] == " ".join(f"w{i}" for i in range(24, 30))
    # overlap: chunk 1 starts at stride 12, repeating tokens 12..15
    assert by[3]["chunk_text"].iloc[1].split(" ")[0] == "w12"

    with pytest.raises(ValueError):
        chunk_documents(docs, chunk_tokens=8, overlap=8)


def test_source_mixture_sample_rebalances(ray_session):
    """alpha=0: every source's expected keep is ~min_n via integer-exact
    cutoffs; the smallest source keeps everything."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from mysql_log_parser_ray.training.mix import source_mixture_sample

    # source A: 10000 docs, B: 1000, C: 100 (ids uniform mod 10000)
    ids = np.arange(11100, dtype=np.int64)
    src = np.array(["A"] * 10000 + ["B"] * 1000 + ["C"] * 100)
    ds = rd.from_arrow(pa.table({"doc_id": ids, "source": src}))
    out = source_mixture_sample(ds, alpha=0.0, denom=10_000).set_index("source")
    assert out.loc["C", "cutoff"] == 10_000          # smallest keeps all
    assert out.loc["C", "n_sampled"] == 100
    assert out.loc["A", "cutoff"] == 100             # 10000*100//10000
    assert out.loc["B", "cutoff"] == 1000
    # ids 0..9999 uniform mod denom -> exactly cutoff sampled from A
    assert out.loc["A", "n_sampled"] == 100
    assert int(out["n_docs"].sum()) == 11100


@pytest.mark.skipif(
    os.environ.get("MLPR_BIG_TESTS") != "1",
    reason="~1-2 min; run with MLPR_BIG_TESTS=1 for the banded-LSH scale check",
)
def test_hyperplane_lsh_subquadratic_at_scale(ray_session):
    """200k vectors: the auto-scaled banded LSH must complete with planted
    recall intact — at this size an all-pairs fallback (the old fixed
    256-bucket failure mode: 200k/256 ~ 780-row buckets x 780^2 cosine
    each) would blow the runtime budget, while bounded buckets keep the
    verify work ~n * target_bucket."""
    import time

    import ray.data as rd

    from mysql_log_parser_ray.training.dedup import auto_planes, embedding_dup_pairs

    n, d = 200_000, 16
    rng = np.random.default_rng(17)
    base = rng.standard_normal((n, d)).astype(np.float64)
    dups = base[:20] + 0.003 * rng.standard_normal((20, d))
    x = np.vstack([base, dups])
    ids = np.r_[np.arange(n), np.arange(1_000_000, 1_000_020)]
    t = pa.table({
        "vec_id": pa.array(ids, pa.int64()),
        "embedding": pa.array([r.tolist() for r in x], pa.list_(pa.float64())),
    })
    ds = rd.from_arrow(t).repartition(32).materialize()

    p = auto_planes(n, 256)
    assert n / 2 ** p <= 2 * 256  # occupancy stays near target

    t0 = time.perf_counter()
    out = embedding_dup_pairs(ds, threshold=0.95, exhaustive=False)
    took = time.perf_counter() - t0
    got = set(zip(out["vec_a"], out["vec_b"]))
    expected = {(i, 1_000_000 + i) for i in range(20)}
    assert len(got & expected) >= 18  # banded recall on near-identical pairs
    assert (out["cosine"] >= 0.95).all()
    assert not out.duplicated(["vec_a", "vec_b"]).any()
    # generous wall-clock ceiling: all-pairs at this size cannot meet it
    assert took < 120, f"banded LSH took {took:.0f}s - bucket bound broken?"


def test_rep_bigram_rule_semantics(ray_session, tmp_path):
    """Gopher repetition rule edges: a single-word doc has no bigrams (counts
    in n_docs only), a doc dominated by one repeated bigram is flagged at
    the 1/16 coverage threshold, and a diverse doc is not."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from mysql_log_parser_ray.training.registry import q_docs_rep_bigram

    texts = [
        "solo",                                   # 1 word: no bigrams
        ("spam ham " * 20).strip(),               # 'spam ham' 20/39 >= 1/16
        " ".join(f"w{i}" for i in range(40)),     # all bigrams distinct: 1/39
        "a b a b c",                              # top 'a b' = 2 of 4 -> flag
    ]
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(range(len(texts)), pa.int64()),
                "text": pa.array(texts, pa.string()),
                "lang": pa.array(["en"] * len(texts), pa.string()),
                "source": pa.array(["s0", "s0", "s1", "s1"], pa.string()),
                "n_chars": pa.array([len(t) for t in texts], pa.int64()),
            }
        ),
        str(tmp_path / "documents.parquet"),
    )
    out = q_docs_rep_bigram(str(tmp_path)).set_index("source")
    assert out.loc["s0", "n_docs"] == 2
    assert out.loc["s0", "n_bigram_docs"] == 1       # 'solo' has none
    assert out.loc["s0", "n_flagged"] == 1           # spam-ham doc
    # top bigram of the spam doc: 'spam ham' appears 20 times
    assert out.loc["s0", "sum_top_cnt"] == 20
    assert out.loc["s1", "n_flagged"] == 1           # 'a b a b c' only
    assert out.loc["s1", "sum_top_cnt"] == 1 + 2     # distinct-doc top=1


def test_streaming_dedup_filter_exactly_one_survivor(ray_session):
    """Shared-mutable-index stage: the online filter keeps exactly one row
    per distinct text no matter how rows scatter across blocks (actor
    mailboxes serialize racing check_and_add calls), and the counting
    surface equals the exact distinct count with all shards reported."""
    import pyarrow as pa
    import ray.data as rd

    from mysql_log_parser_ray.state.shard_index import (
        shard_distinct_counts,
        streaming_dedup_filter,
    )

    texts = [f"text number {i % 40}" for i in range(1000)]
    ds = rd.from_arrow(pa.table({"text": pa.array(texts)})).repartition(16)
    out = streaming_dedup_filter(ds, "text").to_pandas()
    assert len(out) == 40
    assert sorted(out["text"]) == sorted(f"text number {k}" for k in range(40))

    ds2 = rd.from_arrow(pa.table({"text": pa.array(texts)})).repartition(16)
    counts = shard_distinct_counts(ds2, "text")
    assert len(counts) == 8
    assert counts["shard"].tolist() == list(range(8))
    assert counts["n_distinct"].sum() == 40


def test_winnow_planted_duplicates(ray_session, docs_ds):
    """An exact duplicate shares EVERY fingerprint with its original
    (winnowing is deterministic per text), and a one-word near-dup still
    shares >= 2 fingerprints. Fill docs (distinct random word soup) must
    not pair with the originals at min_shared=2."""
    from mysql_log_parser_ray.training.dedup import winnow_fingerprint_pairs

    out = winnow_fingerprint_pairs(docs_ds, k=3, window=4, min_shared=2)
    pairs = {(a, b) for a, b in zip(out["doc_a"], out["doc_b"])}
    # doc 7 is the exact duplicate of doc 1; doc 5/6 near-dup 0/2
    assert (1, 7) in pairs
    assert (0, 5) in pairs
    assert (2, 6) in pairs
    # the exact duplicate's shared count equals its full fingerprint set:
    # rerunning on just docs {1, 7} must give the same n_shared
    import ray.data as rd

    t = pa.table(
        {
            "doc_id": pa.array([1, 7], pa.int64()),
            "text": pa.array([BASE_DOCS[1], BASE_DOCS[1]], pa.string()),
        }
    )
    solo = winnow_fingerprint_pairs(rd.from_arrow(t), min_shared=1)
    assert len(solo) == 1
    full = int(solo["n_shared"].iloc[0])
    got = int(out[(out["doc_a"] == 1) & (out["doc_b"] == 7)]["n_shared"].iloc[0])
    assert got == full and full >= 2


def test_winnow_short_doc_guarantee(ray_session):
    """Docs with >= 3 words (>= 1 gram) but < window grams still emit one
    fingerprint (the winnowing guarantee); identical short docs pair at
    min_shared=1."""
    import ray.data as rd

    from mysql_log_parser_ray.training.dedup import winnow_fingerprint_pairs

    t = pa.table(
        {
            "doc_id": pa.array([1, 2, 3], pa.int64()),
            "text": pa.array(
                ["tiny doc here", "tiny doc here", "unrelated words entirely"],
                pa.string(),
            ),
        }
    )
    out = winnow_fingerprint_pairs(rd.from_arrow(t), min_shared=1)
    assert out[["doc_a", "doc_b"]].values.tolist() == [[1, 2]]
    assert out["n_shared"].tolist() == [1]


def test_embedding_decontam_planted_hit(ray_session):
    """A train vector identical to an eval vector scores cos 1.0 and is
    reported against the SMALLEST matching eval id; orthogonal vectors
    stay below threshold."""
    import ray.data as rd

    from mysql_log_parser_ray.training.similarity import embedding_decontam

    d = 8
    eye = np.eye(d, dtype=np.float32)
    ev = pa.table(
        {
            "vec_id": pa.array([97, 194], pa.int64()),
            "embedding": pa.array([eye[0].tolist(), eye[0].tolist()]),
        }
    )
    tr = pa.table(
        {
            "vec_id": pa.array([1, 2], pa.int64()),
            "embedding": pa.array([eye[0].tolist(), eye[1].tolist()]),
        }
    )
    out = embedding_decontam(
        rd.from_arrow(tr), rd.from_arrow(ev), threshold=0.9
    )
    assert out["vec_id"].tolist() == [1]
    assert out["eval_id"].tolist() == [97]  # tie -> smallest eval id
    assert out["cos"].tolist() == [1.0]


def test_embedding_decontam_eval_bound(ray_session):
    import ray.data as rd

    from mysql_log_parser_ray.training.similarity import embedding_decontam

    t = pa.table(
        {
            "vec_id": pa.array([1, 2, 3], pa.int64()),
            "embedding": pa.array([[1.0, 0.0]] * 3),
        }
    )
    with pytest.raises(ValueError, match="max_eval_rows"):
        embedding_decontam(
            rd.from_arrow(t), rd.from_arrow(t), max_eval_rows=2
        )


def test_winnow_and_decontam_as_dataset_equivalence(ray_session, docs_ds):
    """as_dataset=True returns the same rows as the pandas collect (the
    scale-mode contract shared with ngram_jaccard_pairs)."""
    import ray.data as rd

    from mysql_log_parser_ray.training.dedup import winnow_fingerprint_pairs
    from mysql_log_parser_ray.training.similarity import embedding_decontam

    collected = winnow_fingerprint_pairs(docs_ds, min_shared=2)
    ds_out = (
        winnow_fingerprint_pairs(docs_ds, min_shared=2, as_dataset=True)
        .to_pandas()
        .sort_values(["doc_a", "doc_b"])
        .reset_index(drop=True)
    )
    for c in ds_out.columns:
        ds_out[c] = ds_out[c].astype("int64")
    pd.testing.assert_frame_equal(collected, ds_out[list(collected.columns)])

    eye = np.eye(4, dtype=np.float32)
    tr = rd.from_arrow(pa.table(
        {"vec_id": pa.array([1, 2], pa.int64()),
         "embedding": pa.array([eye[0].tolist(), eye[1].tolist()])}))
    ev = rd.from_arrow(pa.table(
        {"vec_id": pa.array([97], pa.int64()),
         "embedding": pa.array([eye[0].tolist()])}))
    a = embedding_decontam(tr, ev, threshold=0.9)
    b = embedding_decontam(tr, ev, threshold=0.9, as_dataset=True).to_pandas()
    b = b.sort_values("vec_id").reset_index(drop=True)
    for c in ("vec_id", "eval_id"):
        b[c] = b[c].astype("int64")
    pd.testing.assert_frame_equal(a, b[list(a.columns)])


@pytest.mark.skipif(
    os.environ.get("MLPR_BIG_TESTS") != "1",
    reason="~1-2 min at 4 CPUs; run with MLPR_BIG_TESTS=1",
)
def test_winnow_scale_planted_recall(ray_session):
    """200k synthetic docs with 1k planted exact duplicates: the winnowing
    pipeline finds every planted pair (exact dup => identical fingerprint
    set => shared >= min_shared), pair volume stays bounded by max_df,
    and nothing doc-sized collects (as_dataset path consumed blockwise)."""
    import ray.data as rd

    from mysql_log_parser_ray.training.dedup import winnow_fingerprint_pairs

    rng = np.random.default_rng(7)
    vocab = np.array([f"w{i}" for i in range(5000)])
    n, planted = 200_000, 1_000
    texts = [
        " ".join(vocab[rng.integers(0, len(vocab), 30)]) for _ in range(n)
    ]
    for i in range(planted):  # doc n+i duplicates doc i exactly
        texts.append(texts[i])
    ids = list(range(len(texts)))
    ds = rd.from_arrow(
        pa.table({"doc_id": pa.array(ids, pa.int64()), "text": texts})
    ).repartition(16)
    pairs_ds = winnow_fingerprint_pairs(
        ds, min_shared=2, max_df=200, as_dataset=True
    )
    found = set()
    for b in pairs_ds.iter_batches(batch_size=65536, batch_format="pyarrow"):
        if b.num_rows:
            for a_, b_ in zip(
                b["doc_a"].to_numpy(zero_copy_only=False),
                b["doc_b"].to_numpy(zero_copy_only=False),
            ):
                found.add((int(a_), int(b_)))
    want = {(i, n + i) for i in range(planted)}
    assert want <= found, f"missing {len(want - found)} planted pairs"


def test_doc_dup_spans_hand_computed(ray_session, tmp_path):
    """5-word windows duplicated across docs, counted with multiplicity.

    doc0 = "a b c d e f"      -> windows: [a b c d e], [b c d e f]
    doc1 = "a b c d e"        -> windows: [a b c d e]
    doc2 = "x a b c d e f y"  -> [x a b c d], [a b c d e], [b c d e f],
                                 [c d e f y]
    doc3 = "p q r s"          -> <5 words, excluded
    dup grams (>=2 distinct docs): "a b c d e" (docs 0,1,2),
    "b c d e f" (docs 0,2).
    """
    import pyarrow.parquet as pq_

    pq_.write_table(
        pa.table(
            {
                "doc_id": pa.array([0, 1, 2, 3], pa.int64()),
                "text": pa.array(
                    ["a b c d e f", "a b c d e", "x a b c d e f y",
                     "p q r s"]
                ),
                "lang": pa.array(["en"] * 4),
                "source": pa.array(["s0"] * 4),
                "n_chars": pa.array([11, 9, 15, 7], pa.int64()),
            }
        ),
        str(tmp_path / "documents.parquet"),
    )
    from mysql_log_parser_ray.training.registry import q_doc_dup_spans

    out = q_doc_dup_spans(str(tmp_path))
    assert out["doc_id"].tolist() == [0, 1, 2]
    assert out["n_windows"].tolist() == [2, 1, 4]
    assert out["n_dup_windows"].tolist() == [2, 1, 2]
    assert out["dup_frac"].tolist() == [1.0, 1.0, 0.5]


def test_source_dup_rate_hand_computed(ray_session, tmp_path):
    """Same fixture as doc_dup_spans: docs 0,1 in s0; doc 2 in s1.
    s0 windows = 2 + 1 = 3, dups = 2 + 1 = 3; s1 = 4 windows, 2 dups."""
    import pyarrow.parquet as pq_

    pq_.write_table(
        pa.table(
            {
                "doc_id": pa.array([0, 1, 2, 3], pa.int64()),
                "text": pa.array(
                    ["a b c d e f", "a b c d e", "x a b c d e f y",
                     "p q r s"]
                ),
                "lang": pa.array(["en"] * 4),
                "source": pa.array(["s0", "s0", "s1", "s1"]),
                "n_chars": pa.array([11, 9, 15, 7], pa.int64()),
            }
        ),
        str(tmp_path / "documents.parquet"),
    )
    from mysql_log_parser_ray.training.registry import q_source_dup_rate

    out = q_source_dup_rate(str(tmp_path))
    assert out["source"].tolist() == ["s0", "s1"]
    assert out["n_windows"].tolist() == [3, 4]
    assert out["n_dup_windows"].tolist() == [3, 2]
    assert out["dup_rate"].tolist() == [1.0, 0.5]


def test_source_overlap_matrix_hand_computed(ray_session, tmp_path):
    """Distinct-text overlap: s0 carries {t1,t2,t3} (t1 twice — distinct
    counting), s1 {t1,t4}, s2 {t5}. Full matrix: (s0,s1) shares t1 ->
    1/min(3,2)=0.5; the other two pairs are present with zero overlap."""
    import pyarrow.parquet as pq_

    pq_.write_table(
        pa.table(
            {
                "doc_id": pa.array(list(range(7)), pa.int64()),
                "text": pa.array(["t1", "t2", "t3", "t1", "t1", "t4",
                                  "t5"]),
                "lang": pa.array(["en"] * 7),
                "source": pa.array(["s0", "s0", "s0", "s0", "s1", "s1",
                                    "s2"]),
                "n_chars": pa.array([2] * 7, pa.int64()),
            }
        ),
        str(tmp_path / "documents.parquet"),
    )
    from mysql_log_parser_ray.training.registry import q_source_overlap_matrix

    out = q_source_overlap_matrix(str(tmp_path))
    assert list(zip(out["src_a"], out["src_b"])) == [
        ("s0", "s1"), ("s0", "s2"), ("s1", "s2")]
    assert out["n_a"].tolist() == [3, 3, 2]
    assert out["n_b"].tolist() == [2, 1, 1]
    assert out["n_shared"].tolist() == [1, 0, 0]
    assert out["overlap"].tolist() == [0.5, 0.0, 0.0]


def test_doc_novelty_frac_hand_computed(ray_session, tmp_path):
    """First-seen-by-doc_id novelty: doc2 and doc4 repeat doc0's text.
    s0 = docs {0,1,4}: 0,1 novel, 4 not -> 2/3; s1 = docs {2,3}: only 3
    novel -> 1/2."""
    import pyarrow.parquet as pq_

    pq_.write_table(
        pa.table(
            {
                "doc_id": pa.array([0, 1, 2, 3, 4], pa.int64()),
                "text": pa.array(["x", "y", "x", "z", "x"]),
                "lang": pa.array(["en"] * 5),
                "source": pa.array(["s0", "s0", "s1", "s1", "s0"]),
                "n_chars": pa.array([1] * 5, pa.int64()),
            }
        ),
        str(tmp_path / "documents.parquet"),
    )
    from mysql_log_parser_ray.training.registry import q_doc_novelty_frac

    out = q_doc_novelty_frac(str(tmp_path))
    assert out["source"].tolist() == ["s0", "s1"]
    assert out["n_docs"].tolist() == [3, 2]
    assert out["n_novel"].tolist() == [2, 1]
    assert out["novelty"].tolist() == [0.666667, 0.5]


def test_source_len_mad_hand_computed(ray_session, tmp_path):
    """Interpolating median/MAD in exact half/quarter units.
    s0 lengths [1,2,3,100]: med=(2+3)/2=2.5; devs [1.5,.5,.5,97.5] ->
    MAD=(0.5+1.5)/2=1.0. s1 [7,7,9]: med=7, devs [0,0,2] -> MAD=0."""
    import pyarrow.parquet as pq_

    pq_.write_table(
        pa.table(
            {
                "doc_id": pa.array(list(range(7)), pa.int64()),
                "text": pa.array(["?"] * 7),
                "lang": pa.array(["en"] * 7),
                "source": pa.array(["s0", "s0", "s0", "s0", "s1", "s1",
                                    "s1"]),
                "n_chars": pa.array([1, 2, 3, 100, 7, 7, 9], pa.int64()),
            }
        ),
        str(tmp_path / "documents.parquet"),
    )
    from mysql_log_parser_ray.training.registry import q_source_len_mad

    out = q_source_len_mad(str(tmp_path))
    assert out["source"].tolist() == ["s0", "s1"]
    assert out["n_docs"].tolist() == [4, 3]
    assert out["med_len"].tolist() == [2.5, 7.0]
    assert out["mad_len"].tolist() == [1.0, 0.0]


def test_embed_quantize_error_hand_computed(ray_session, tmp_path):
    """Symmetric int8 on exactly-representable f32 components.
    dim1 xq=[1e6,-5e5,2.5e5], ma=1e6: codes [127,-63,32], errs
    [0,5e5,2.5e5]. dim2 xq=[5e5,2.5e5,0], ma=5e5: codes [127,64,0],
    errs [0,2.5e5,0]."""
    import pyarrow.parquet as pq_

    pq_.write_table(
        pa.table(
            {
                "vec_id": pa.array([0, 1, 2], pa.int64()),
                "embedding": pa.array(
                    [[1.0, 0.5], [-0.5, 0.25], [0.25, 0.0]],
                    pa.list_(pa.float32())),
                "label": pa.array([0, 0, 0], pa.int32()),
            }
        ),
        str(tmp_path / "embeddings.parquet"),
    )
    from mysql_log_parser_ray.training.registry import q_embed_quantize_error

    out = q_embed_quantize_error(str(tmp_path))
    assert out["dim"].tolist() == [1, 2]
    assert out["n"].tolist() == [3, 3]
    assert out["max_abs_units"].tolist() == [1000000, 500000]
    assert out["max_err_units"].tolist() == [500000, 250000]
    assert out["sum_err_units"].tolist() == [750000, 250000]
    assert out["mean_abs_err"].tolist() == [0.001969, 0.000656]


def test_lang_source_mi_hand_computed(ray_session, tmp_path):
    """Cells (en,s0)x2, (en,s1)x1, (fr,s1)x1; T=4. Per-factor 1e-6 ln
    units: ln2=693147, ln3=1098612, ln4=1386294.
    (en,s0): lnr = 693147+1386294-1098612-693147 = 287682,
             mi = 2*287682/4e6 = 0.143841
    (en,s1): lnr = 0+1386294-1098612-693147 = -405465, mi = -0.101366
    (fr,s1): lnr = 0+1386294-0-693147 = 693147, mi = 0.173287"""
    import pyarrow.parquet as pq_

    pq_.write_table(
        pa.table(
            {
                "doc_id": pa.array([0, 1, 2, 3], pa.int64()),
                "text": pa.array(["w"] * 4),
                "lang": pa.array(["en", "en", "en", "fr"]),
                "source": pa.array(["s0", "s0", "s1", "s1"]),
                "n_chars": pa.array([1] * 4, pa.int64()),
            }
        ),
        str(tmp_path / "documents.parquet"),
    )
    from mysql_log_parser_ray.training.registry import q_lang_source_mi

    out = q_lang_source_mi(str(tmp_path))
    assert list(zip(out["lang"], out["source"])) == [
        ("en", "s0"), ("en", "s1"), ("fr", "s1")]
    assert out["n"].tolist() == [2, 1, 1]
    assert out["lang_total"].tolist() == [3, 3, 1]
    assert out["source_total"].tolist() == [2, 2, 2]
    assert out["grand_total"].tolist() == [4, 4, 4]
    assert out["ln_ratio_units"].tolist() == [287682, -405465, 693147]
    assert out["mi_term"].tolist() == [0.143841, -0.101366, 0.173287]


def test_source_simpson_hand_computed(ray_session, tmp_path):
    """s0 = 'a a b': counts {a:2, b:1} -> n=3, vocab=2, ssq=5,
    simpson=5/9=0.555556. s1 = 'x y': 2/4 = 0.5."""
    import pyarrow.parquet as pq_

    pq_.write_table(
        pa.table(
            {
                "doc_id": pa.array([0, 1], pa.int64()),
                "text": pa.array(["a a b", "x y"]),
                "lang": pa.array(["en"] * 2),
                "source": pa.array(["s0", "s1"]),
                "n_chars": pa.array([5, 3], pa.int64()),
            }
        ),
        str(tmp_path / "documents.parquet"),
    )
    from mysql_log_parser_ray.training.registry import q_source_simpson

    out = q_source_simpson(str(tmp_path))
    assert out["source"].tolist() == ["s0", "s1"]
    assert out["n_tokens"].tolist() == [3, 2]
    assert out["n_vocab"].tolist() == [2, 2]
    assert out["sumsq_tokens"].tolist() == [5, 2]
    assert out["simpson"].tolist() == [0.555556, 0.5]


def test_events_burstiness_hand_computed(ray_session, tmp_path):
    """Type t: hours {0: 3 events, 2: 1} over dense range H=3 -> n=4,
    ssq=10, fano=(3*10-16)/(4*3)=1.166667. Type u: one event -> fano 0."""
    import pyarrow.parquet as pq_

    hr = 3_600_000_000
    pq_.write_table(
        pa.table(
            {
                "event_id": pa.array(list(range(5)), pa.int64()),
                "ts": pa.array([0, 60_000_000, hr - 1, 2 * hr, 0],
                               pa.timestamp("us")),
                "user_id": pa.array([1] * 5, pa.int64()),
                "event_type": pa.array(["t", "t", "t", "t", "u"]),
                "value": pa.array([0.0] * 5, pa.float64()),
                "props": pa.array(["{}"] * 5),
            }
        ),
        str(tmp_path / "events.parquet"),
    )
    from mysql_log_parser_ray.pipelines.queries import q_events_burstiness

    out = q_events_burstiness(str(tmp_path))
    assert out["event_type"].tolist() == ["t", "u"]
    assert out["n_events"].tolist() == [4, 1]
    assert out["n_hours"].tolist() == [3, 1]
    assert out["sumsq_hourly"].tolist() == [10, 1]
    assert out["fano"].tolist() == [1.166667, 0.0]


def test_pagerank_integer_hand_computed(ray_session):
    """Path graph 1-2-3, one iteration. r0 = 1e9//3 = 333333333.
    contribs: node1/3 send (17*r0)//20 = 283333333 to 2; node2 sends
    (17*r0)//40 = 141666666 each way. r1 = [291666666, 716666666,
    291666666] after base 150000000."""
    import ray.data as rd

    from mysql_log_parser_ray.training.graph import pagerank_integer

    pairs = rd.from_pandas(pd.DataFrame(
        {"doc_a": [1, 2], "doc_b": [2, 3]}))
    out = pagerank_integer(pairs, n_iter=1).to_pandas().sort_values(
        "node").reset_index(drop=True)
    assert out["node"].tolist() == [1, 2, 3]
    assert out["out_degree"].tolist() == [1, 2, 1]
    assert out["pr_units"].tolist() == [291666666, 716666666, 291666666]


def test_pagerank_distributed_equals_driver(ray_session):
    """The label-propagation-shaped distributed rounds must produce
    bit-identical ranks to the driver fold on the same graph (the CC
    equality-pin pattern), including an isolated two-clique."""
    import ray.data as rd

    from mysql_log_parser_ray.training.graph import pagerank_integer

    pairs = pd.DataFrame({
        "doc_a": [1, 2, 3, 1, 10, 11, 10, 20],
        "doc_b": [2, 3, 4, 3, 11, 12, 12, 21],
    })
    a = pagerank_integer(
        rd.from_pandas(pairs), n_iter=5
    ).to_pandas().sort_values("node").reset_index(drop=True)
    b = pagerank_integer(
        rd.from_pandas(pairs), n_iter=5, small_graph_limit=None
    ).to_pandas().sort_values("node").reset_index(drop=True)
    pd.testing.assert_frame_equal(
        a.astype("int64"), b[["node", "out_degree", "pr_units"]].astype("int64")
    )
    # mass sanity: every rank >= base, total ~ N * scale at fixpoint scale
    assert (a["pr_units"] >= 150000000).all()


def test_ab_value_ttest_hand_computed(ray_session, tmp_path):
    """purchase values [1.0, 3.0] (cents 100, 300): n=2, s=400,
    ssq=100000, var=(2*100000-160000)/2=20000, mean=200. click
    [1.0, 1.0, 1.0]: mean=100, var=0. t = 100/sqrt(20000/2) = 1.0."""
    import pyarrow.parquet as pq_

    pq_.write_table(
        pa.table(
            {
                "event_id": pa.array(list(range(5)), pa.int64()),
                "ts": pa.array([0] * 5, pa.timestamp("us")),
                "user_id": pa.array([1] * 5, pa.int64()),
                "event_type": pa.array(
                    ["purchase", "purchase", "click", "click", "click"]),
                "value": pa.array([1.0, 3.0, 1.0, 1.0, 1.0], pa.float64()),
                "props": pa.array(["{}"] * 5),
            }
        ),
        str(tmp_path / "events.parquet"),
    )
    from mysql_log_parser_ray.pipelines.queries import q_ab_value_ttest

    out = q_ab_value_ttest(str(tmp_path))
    assert len(out) == 1
    r = out.iloc[0]
    assert r[["n_a", "sum_a_cents", "sumsq_a_cents"]].tolist() == [
        2, 400, 100000]
    assert r[["n_b", "sum_b_cents", "sumsq_b_cents"]].tolist() == [
        3, 300, 30000]
    assert r["welch_t"] == 1.0


def test_docs_bm25_topk_hand_computed(ray_session, tmp_path):
    """N=3 docs, T=7 tokens. df(hash)=2 -> idf=ln(3/5) -> -510826 units
    (negative: in more than half the corpus); df(join)=1 -> +510826.
    doc0 'hash join' (dl=2): su = -542532 + 542532 = 0.
    doc1 'hash hash filter' (dl=3, tf=2): su = -650142.
    doc2 has no query terms and is absent; ranking is 0 > -650142."""
    import pyarrow.parquet as pq_

    pq_.write_table(
        pa.table(
            {
                "doc_id": pa.array([0, 1, 2], pa.int64()),
                "text": pa.array(["hash join", "hash hash filter",
                                  "the table"]),
                "lang": pa.array(["en"] * 3),
                "source": pa.array(["s0"] * 3),
                "n_chars": pa.array([9, 16, 9], pa.int64()),
            }
        ),
        str(tmp_path / "documents.parquet"),
    )
    from mysql_log_parser_ray.training.registry import q_docs_bm25_topk

    out = q_docs_bm25_topk(str(tmp_path))
    assert out["rank"].tolist() == [1, 2]
    assert out["doc_id"].tolist() == [0, 1]
    assert out["n_tokens"].tolist() == [2, 3]
    assert out["score_units"].tolist() == [0, -650142]


def test_events_table_checksum_hand_computed(ray_session, tmp_path):
    """Two events in one chunk, one in another; expected digests built
    from the same canonical string spec (id|user|type|cents|us) through
    an independent hashlib path in the test."""
    import hashlib

    import pyarrow.parquet as pq_

    rows = [
        (0, 0, 5, "click", 1.25),    # cents 125, bucket 0
        (64, 1_000_000, 6, "view", 2.0),   # bucket 0
        (1, 2_000_000, 7, "click", 0.1),   # bucket 1 (cents 10)
    ]
    pq_.write_table(
        pa.table(
            {
                "event_id": pa.array([r[0] for r in rows], pa.int64()),
                "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
                "user_id": pa.array([r[2] for r in rows], pa.int64()),
                "event_type": pa.array([r[3] for r in rows]),
                "value": pa.array([r[4] for r in rows], pa.float64()),
                "props": pa.array(["{}"] * 3),
            }
        ),
        str(tmp_path / "events.parquet"),
    )

    def h32(e, m, u, t, v):
        c = int(np.floor(v * 100 + 0.5))
        return int(hashlib.md5(
            f"{e}|{u}|{t}|{c}|{m}".encode()).hexdigest()[:8], 16)

    hs0 = [h32(*rows[0]), h32(*rows[1])]
    hs1 = [h32(*rows[2])]
    from mysql_log_parser_ray.pipelines.queries import q_events_table_checksum

    out = q_events_table_checksum(str(tmp_path))
    assert out["bucket"].tolist() == [0, 1]
    assert out["n_rows"].tolist() == [2, 1]
    assert out["checksum_sum"].tolist() == [sum(hs0), sum(hs1)]
    assert out["checksum_xor"].tolist() == [hs0[0] ^ hs0[1], hs1[0]]


def test_sessions_bounce_hand_computed(ray_session, tmp_path):
    """user5: events at 0s, 600s (one session, dur 600s), then 3000s
    (gap 2400s > 1800 -> new single-event session = bounce). user6: one
    event = bounce. 3 sessions, 2 bounces, rate 2/3 = 0.666667."""
    import pyarrow.parquet as pq_

    pq_.write_table(
        pa.table(
            {
                "event_id": pa.array([0, 1, 2, 3], pa.int64()),
                "ts": pa.array([0, 600_000_000, 3_000_000_000,
                                0], pa.timestamp("us")),
                "user_id": pa.array([5, 5, 5, 6], pa.int64()),
                "event_type": pa.array(["view"] * 4),
                "value": pa.array([0.0] * 4, pa.float64()),
                "props": pa.array(["{}"] * 4),
            }
        ),
        str(tmp_path / "events.parquet"),
    )
    from mysql_log_parser_ray.pipelines.queries import q_sessions_bounce

    out = q_sessions_bounce(str(tmp_path))
    assert len(out) == 1
    r = out.iloc[0]
    assert r[["n_sessions", "n_bounce", "n_users", "sum_events",
              "sum_duration_us"]].tolist() == [3, 2, 2, 4, 600_000_000]
    assert r["bounce_rate"] == 0.666667


def test_lang_confusion_hand_computed(ray_session, tmp_path):
    """Labels vs stopword-vote predictions: two en-labeled docs — one
    English-looking ('the and'), one German-looking ('der und') — and one
    fr-labeled doc with no stopwords ('und' prediction impossible: no
    vote -> 'und' undetermined). Shares are per-label ratios."""
    import pyarrow.parquet as pq_

    pq_.write_table(
        pa.table(
            {
                "doc_id": pa.array([0, 1, 2], pa.int64()),
                "text": pa.array(["the and of", "der und die", "xyzzy"]),
                "lang": pa.array(["en", "en", "fr"]),
                "source": pa.array(["s0"] * 3),
                "n_chars": pa.array([10, 11, 5], pa.int64()),
            }
        ),
        str(tmp_path / "documents.parquet"),
    )
    from mysql_log_parser_ray.training.registry import q_lang_confusion

    out = q_lang_confusion(str(tmp_path))
    assert list(zip(out["lang"], out["pred_lang"])) == [
        ("en", "de"), ("en", "en"), ("fr", "und")]
    assert out["n"].tolist() == [1, 1, 1]
    assert out["n_lang"].tolist() == [2, 2, 1]
    assert out["share"].tolist() == [0.5, 0.5, 1.0]


def test_region_revenue_rollup_hand_computed(ray_session, tmp_path):
    """Two nations in one region, one in another; subtotals and grand
    total must equal the detail sums exactly (cents)."""
    import pyarrow.parquet as pq_

    pq_.write_table(
        pa.table({"r_regionkey": pa.array([0, 1], pa.int32()),
                  "r_name": pa.array(["EUROPE", "ASIA"])}),
        str(tmp_path / "region.parquet"))
    pq_.write_table(
        pa.table({"n_nationkey": pa.array([0, 1, 2], pa.int32()),
                  "n_name": pa.array(["FRANCE", "GERMANY", "JAPAN"]),
                  "n_regionkey": pa.array([0, 0, 1], pa.int32())}),
        str(tmp_path / "nation.parquet"))
    pq_.write_table(
        pa.table({"c_custkey": pa.array([10, 11, 12], pa.int64()),
                  "c_name": pa.array(["a", "b", "c"]),
                  "c_nationkey": pa.array([0, 1, 2], pa.int32()),
                  "c_acctbal": pa.array([0.0] * 3, pa.float64()),
                  "c_mktsegment": pa.array(["x"] * 3)}),
        str(tmp_path / "customer.parquet"))
    pq_.write_table(
        pa.table({
            "o_orderkey": pa.array([1, 2, 3, 4], pa.int64()),
            "o_custkey": pa.array([10, 10, 11, 12], pa.int64()),
            "o_orderstatus": pa.array(["F"] * 4),
            "o_totalprice": pa.array([1.5, 2.25, 10.0, 100.0],
                                     pa.float64()),
            "o_orderdate": pa.array([0] * 4, pa.timestamp("us")),
            "o_orderpriority": pa.array(["1-URGENT"] * 4),
        }),
        str(tmp_path / "orders.parquet"))
    from mysql_log_parser_ray.pipelines.queries import q_region_revenue_rollup

    out = q_region_revenue_rollup(str(tmp_path))
    rows = {(r, n): (a, c) for r, n, a, c in out.itertuples(index=False)}
    assert rows[("EUROPE", "FRANCE")] == (2, 375)
    assert rows[("EUROPE", "GERMANY")] == (1, 1000)
    assert rows[("EUROPE", "ALL")] == (3, 1375)
    assert rows[("ASIA", "JAPAN")] == (1, 10000)
    assert rows[("ASIA", "ALL")] == (1, 10000)
    assert rows[("ALL", "ALL")] == (4, 11375)
    assert len(out) == 6


def test_users_new_vs_returning_hand_computed(ray_session, tmp_path):
    """user5 active day0+day1 (new on 0, returning on 1); user6 active
    day1 only (new). day0: 1 active/1 new; day1: 2 active, 1 new, 1 ret."""
    import pyarrow.parquet as pq_

    day = 86_400_000_000
    pq_.write_table(
        pa.table(
            {
                "event_id": pa.array([0, 1, 2, 3], pa.int64()),
                "ts": pa.array([0, day, day + 1, day + 2],
                               pa.timestamp("us")),
                "user_id": pa.array([5, 5, 5, 6], pa.int64()),
                "event_type": pa.array(["view"] * 4),
                "value": pa.array([0.0] * 4, pa.float64()),
                "props": pa.array(["{}"] * 4),
            }
        ),
        str(tmp_path / "events.parquet"),
    )
    from mysql_log_parser_ray.pipelines.queries import q_users_new_vs_returning

    out = q_users_new_vs_returning(str(tmp_path))
    assert out["day"].tolist() == [0, 1]
    assert out["n_active"].tolist() == [1, 2]
    assert out["n_new"].tolist() == [1, 1]
    assert out["n_returning"].tolist() == [0, 1]


def test_orders_ship_lag_histogram_hand_computed(ray_session, tmp_path):
    """Order 1 placed day 0 with lines shipped day 2 (x2) and day 5;
    order 2 placed day 3, line shipped day 3. Histogram: lag 0 -> 1,
    lag 2 -> 2, lag 5 -> 1."""
    import pyarrow.parquet as pq_

    day = 86_400_000_000
    pq_.write_table(
        pa.table({
            "o_orderkey": pa.array([1, 2], pa.int64()),
            "o_custkey": pa.array([1, 1], pa.int64()),
            "o_orderstatus": pa.array(["F"] * 2),
            "o_totalprice": pa.array([1.0, 1.0], pa.float64()),
            "o_orderdate": pa.array([0, 3 * day], pa.timestamp("us")),
            "o_orderpriority": pa.array(["1-URGENT"] * 2),
        }),
        str(tmp_path / "orders.parquet"))
    pq_.write_table(
        pa.table({
            "l_orderkey": pa.array([1, 1, 1, 2], pa.int64()),
            "l_partkey": pa.array([1] * 4, pa.int64()),
            "l_suppkey": pa.array([1] * 4, pa.int64()),
            "l_quantity": pa.array([1.0] * 4, pa.float64()),
            "l_extendedprice": pa.array([1.0] * 4, pa.float64()),
            "l_discount": pa.array([0.0] * 4, pa.float64()),
            "l_returnflag": pa.array(["N"] * 4),
            "l_shipdate": pa.array([2 * day, 2 * day + 1, 5 * day,
                                    3 * day], pa.timestamp("us")),
        }),
        str(tmp_path / "lineitem.parquet"))
    from mysql_log_parser_ray.pipelines.queries import (
        q_orders_ship_lag_histogram,
    )

    out = q_orders_ship_lag_histogram(str(tmp_path))
    assert out["lag_days"].tolist() == [0, 2, 5]
    assert out["n_lines"].tolist() == [1, 2, 1]


def test_embed_semdedup_hand_computed(ray_session, tmp_path):
    """10 vectors in d=4: the 8 axis vectors (the first-8 centroids are
    the vectors themselves) plus two near-copies of an axis-0 blend.
    Augmentation plants +0.25-dim-0 copies of vec_ids 0, 4, 8. Cluster 0
    collects v0/v8/v9/p0/p8 (v8, v9 at cosine 0.994 to v0); everything
    but the keep-first v0 is a dup. Cluster 4 collects v4 + its planted
    copy. All other clusters are singleton survivors."""
    import pyarrow.parquet as pq_

    vecs = [
        [1, 0, 0, 0], [0, 1, 0, 0], [0, 0, 1, 0], [0, 0, 0, 1],
        [-1, 0, 0, 0], [0, -1, 0, 0], [0, 0, -1, 0], [0, 0, 0, -1],
        [0.9, 0.1, 0, 0], [0.9, 0.1, 0, 0],
    ]
    pq_.write_table(
        pa.table({
            "vec_id": pa.array(range(10), pa.int64()),
            "embedding": pa.array(
                [[float(x) for x in v] for v in vecs],
                pa.list_(pa.float32())),
            "label": pa.array([0] * 10, pa.int32()),
        }),
        str(tmp_path / "embeddings.parquet"),
    )
    from mysql_log_parser_ray.training.registry import q_embed_semdedup

    out = q_embed_semdedup(str(tmp_path))
    assert out["cluster"].tolist() == list(range(8))
    assert out["n_vecs"].tolist() == [5, 1, 1, 1, 2, 1, 1, 1]
    assert out["n_dups"].tolist() == [4, 0, 0, 0, 1, 0, 0, 0]


def test_source_fertility_hand_computed(ray_session, tmp_path):
    """Exact counts: s0 = {'ab cd' (5 ch, 2 words, 2 pieces), 'x! y'
    (4 ch, 2 words, 3 pieces)}, s1 = {'hello' (5 ch, 1 word, 1 piece)}."""
    import pyarrow.parquet as pq_

    pq_.write_table(
        pa.table({
            "doc_id": pa.array([0, 1, 2], pa.int64()),
            "text": pa.array(["ab cd", "x! y", "hello"]),
            "lang": pa.array(["en"] * 3),
            "source": pa.array(["s0", "s0", "s1"]),
            "n_chars": pa.array([5, 4, 5], pa.int64()),
        }),
        str(tmp_path / "documents.parquet"),
    )
    from mysql_log_parser_ray.training.registry import q_source_fertility

    out = q_source_fertility(str(tmp_path))
    assert out["source"].tolist() == ["s0", "s1"]
    assert out["n_docs"].tolist() == [2, 1]
    assert out["n_chars"].tolist() == [9, 5]
    assert out["n_ws_tokens"].tolist() == [4, 1]
    assert out["n_bpe_pieces"].tolist() == [5, 1]
    assert out["chars_per_word"].tolist() == [2.25, 5.0]
    assert out["chars_per_piece"].tolist() == [1.8, 5.0]


def test_doc_continuation_pairs_hand_computed(ray_session, tmp_path):
    """d0 (id 0, 7 words) gets a planted continuation under id 2000000
    whose first five words are d0's last five; d1 matches nothing; d7
    (id 7, %7==0 but only 3 words) is below the 5-word floor so nothing
    is planted for it."""
    import pyarrow.parquet as pq_

    pq_.write_table(
        pa.table({
            "doc_id": pa.array([0, 1, 7], pa.int64()),
            "text": pa.array(["a b c d e f g", "x y z w v u", "p q r"]),
            "lang": pa.array(["en"] * 3),
            "source": pa.array(["s0"] * 3),
            "n_chars": pa.array([13, 11, 5], pa.int64()),
        }),
        str(tmp_path / "documents.parquet"),
    )
    from mysql_log_parser_ray.training.registry import q_doc_continuation_pairs

    out = q_doc_continuation_pairs(str(tmp_path))
    assert out["doc_a"].tolist() == [0]
    assert out["doc_b"].tolist() == [2000000]


def test_dup_cluster_sizes_hand_computed(ray_session, tmp_path):
    """Three identical docs form one size-3 cluster; two other identical
    docs form one size-2 cluster; a unique doc joins no cluster."""
    import pyarrow.parquet as pq_

    same = "alpha beta gamma delta epsilon zeta"
    other = "one two three four five six"
    pq_.write_table(
        pa.table({
            "doc_id": pa.array([0, 1, 2, 3, 4, 5], pa.int64()),
            "text": pa.array([same, same, same, other, other,
                              "lone wolf text nothing matches here"]),
            "lang": pa.array(["en"] * 6),
            "source": pa.array(["s0"] * 6),
            "n_chars": pa.array([len(same)] * 3 + [len(other)] * 2 + [35],
                                pa.int64()),
        }),
        str(tmp_path / "documents.parquet"),
    )
    from mysql_log_parser_ray.training.registry import q_dup_cluster_sizes

    out = q_dup_cluster_sizes(str(tmp_path))
    assert out["cluster_size"].tolist() == [2, 3]
    assert out["n_clusters"].tolist() == [1, 1]


def test_events_watermark_late_hand_computed(ray_session, tmp_path):
    """ids 0,1,2,8 arrive 10 s apart; derived jitter (id%97)*300 s pulls
    id 8 back 2400 s, putting it 2370 s behind the id-0 watermark (only
    event past the 1800 s allowance). Buckets split across the id range,
    so the carry-in prefix path is exercised."""
    import datetime as dt

    import pyarrow.parquet as pq_

    t0 = dt.datetime(2024, 1, 1)
    ts = [t0, t0 + dt.timedelta(seconds=10), t0 + dt.timedelta(seconds=20),
          t0 + dt.timedelta(seconds=30)]
    pq_.write_table(
        pa.table({
            "event_id": pa.array([0, 1, 2, 8], pa.int64()),
            "ts": pa.array(ts, pa.timestamp("us")),
            "user_id": pa.array([1, 1, 2, 2], pa.int64()),
            "event_type": pa.array(["a", "a", "b", "b"]),
            "value": pa.array([0.0] * 4, pa.float64()),
            "props": pa.array(["{}"] * 4),
        }),
        str(tmp_path / "events.parquet"),
    )
    from mysql_log_parser_ray.pipelines.queries import q_events_watermark_late

    out = q_events_watermark_late(str(tmp_path))
    assert out["event_type"].tolist() == ["a", "b"]
    assert out["n_events"].tolist() == [2, 2]
    assert out["n_late"].tolist() == [0, 1]


def test_source_ngram_diversity_hand_computed(ray_session, tmp_path):
    """s0 = {'a a b', 'a b'}: unigrams 5 total / 2 distinct, bigrams
    3 total / 2 distinct, trigrams 1 total / 1 distinct."""
    import pyarrow.parquet as pq_

    pq_.write_table(
        pa.table({
            "doc_id": pa.array([0, 1], pa.int64()),
            "text": pa.array(["a a b", "a b"]),
            "lang": pa.array(["en"] * 2),
            "source": pa.array(["s0"] * 2),
            "n_chars": pa.array([5, 3], pa.int64()),
        }),
        str(tmp_path / "documents.parquet"),
    )
    from mysql_log_parser_ray.training.registry import q_source_ngram_diversity

    out = q_source_ngram_diversity(str(tmp_path))
    assert out["n"].tolist() == [1, 2, 3]
    assert out["n_grams"].tolist() == [5, 3, 1]
    assert out["n_distinct"].tolist() == [2, 2, 1]
    assert out["diversity"].tolist() == [0.4, 0.666667, 1.0]


def test_corpus_version_diff_hand_computed(ray_session, tmp_path):
    """id 0 is removed (%13) AND seeds a planted new doc (%17); id 11 is
    edited; id 1 unchanged; id 13 removed."""
    import pyarrow.parquet as pq_

    pq_.write_table(
        pa.table({
            "doc_id": pa.array([0, 1, 11, 13], pa.int64()),
            "text": pa.array(["t zero", "t one", "t eleven", "t thirteen"]),
            "lang": pa.array(["en"] * 4),
            "source": pa.array(["s0"] * 4),
            "n_chars": pa.array([6, 5, 8, 10], pa.int64()),
        }),
        str(tmp_path / "documents.parquet"),
    )
    from mysql_log_parser_ray.training.registry import q_corpus_version_diff

    out = q_corpus_version_diff(str(tmp_path))
    assert out["source"].tolist() == ["s0"]
    assert out["n_same"].tolist() == [1]
    assert out["n_changed"].tolist() == [1]
    assert out["n_removed"].tolist() == [2]
    assert out["n_added"].tolist() == [1]


def test_heaps_vocab_growth_hand_computed(ray_session, tmp_path):
    """ids {0, 5, 10}; max=10 so T_k = k. Docs cross the cuts at k=5 and
    k=10; first-seen: a@0 b@0 c@5 d@10."""
    import pyarrow.parquet as pq_

    pq_.write_table(
        pa.table({
            "doc_id": pa.array([0, 5, 10], pa.int64()),
            "text": pa.array(["a b", "b c", "c d a"]),
            "lang": pa.array(["en"] * 3),
            "source": pa.array(["s0"] * 3),
            "n_chars": pa.array([3, 3, 5], pa.int64()),
        }),
        str(tmp_path / "documents.parquet"),
    )
    from mysql_log_parser_ray.training.registry import q_heaps_vocab_growth

    out = q_heaps_vocab_growth(str(tmp_path))
    assert out["k"].tolist() == list(range(1, 11))
    assert out["doc_cut"].tolist() == list(range(1, 11))
    assert out["n_docs"].tolist() == [1, 1, 1, 1, 2, 2, 2, 2, 2, 3]
    assert out["n_tokens"].tolist() == [2, 2, 2, 2, 4, 4, 4, 4, 4, 7]
    assert out["vocab"].tolist() == [2, 2, 2, 2, 3, 3, 3, 3, 3, 4]


def test_corpus_drift_psi_hand_computed(ray_session, tmp_path):
    """max=3 so half A = ids {0,1}, B = {2,3}. Bucket 0 holds A-docs 0,1
    and B-doc 2 (n_a=2, n_b=1); bucket 1 is B-only (one-sided -> 0 by
    the exclusion convention). lnr(b0) = ln(2)+ln(2)-ln(1)-ln(2) units;
    psi(b0) = (1 - 0.5) * 0.693147."""
    import pyarrow.parquet as pq_

    pq_.write_table(
        pa.table({
            "doc_id": pa.array([0, 1, 2, 3], pa.int64()),
            "text": pa.array(["x"] * 4),
            "lang": pa.array(["en"] * 4),
            "source": pa.array(["s0"] * 4),
            "n_chars": pa.array([50, 60, 70, 150], pa.int64()),
        }),
        str(tmp_path / "documents.parquet"),
    )
    from mysql_log_parser_ray.training.registry import q_corpus_drift_psi

    out = q_corpus_drift_psi(str(tmp_path))
    assert out["bucket"].tolist() == [0, 1]
    assert out["n_a"].tolist() == [2, 0]
    assert out["n_b"].tolist() == [1, 1]
    assert out["total_a"].tolist() == [2, 2]
    assert out["total_b"].tolist() == [2, 2]
    assert out["ln_ratio_units"].tolist() == [693147, 0]
    assert out["psi_term"].tolist() == [0.346574, 0.0]
