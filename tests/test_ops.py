"""Training-data operators: dedup, similarity, text analysis, multimodal
plumbing."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from rayrep.ops.dedup import (
    MinHasher,
    embedding_neardup,
    exact_dedup,
    minhash_dedup,
    ngram_jaccard_verify,
    simhash_dedup,
    union_find,
)
from rayrep.ops.multimodal import (
    AudioFeatures,
    DecodeImage,
    SampleFrames,
    synthesize_media_table,
)
from rayrep.ops.similarity import topk_cosine, train_ivf_from_dataset
from rayrep.ops.text import Fingerprint, LangId, TextStats

DOCS = pd.DataFrame(
    {
        "doc_id": np.arange(6, dtype=np.int64),
        "text": [
            "the quick brown fox jumps over the lazy dog near the river bank",
            "the quick brown fox jumps over the lazy dog near the river bank",  # exact dup of 0
            "the quick brown fox jumps over the lazy dog near a river bank",    # near dup of 0
            "der hund ist nicht ein kleiner vogel und die katze ist mit",        # german
            "completely different content about machine learning and data",
            "le chat est un animal et la porte est pour le jardin que",          # french
        ],
    }
)


@pytest.fixture()
def docs_ds():
    return rd.from_pandas(DOCS)


def test_text_stats(docs_ds):
    out = docs_ds.map_batches(TextStats(), batch_format="pyarrow").to_pandas()
    row0 = out[out.doc_id == 0].iloc[0]
    assert row0["token_count"] == 13
    assert row0["n_chars_calc"] == len(DOCS["text"][0])
    assert row0["stop_ratio"] > 0.2
    assert 0 <= row0["quality"] <= 1


def test_pack_sequences_partition_invariant():
    """The chunk knob changes the distribution plan, never the bins; bins
    match the sequential concat-and-chunk reference and are monotone."""
    from rayrep.ops.pack import pack_sequences_ds

    rng = np.random.default_rng(7)
    n = 300
    docs = pd.DataFrame({
        "doc_id": np.arange(n, dtype=np.int64),
        "text": [" ".join(["tok"] * int(k)) for k in rng.integers(1, 40, n)],
    })
    ref_tokens = docs["text"].str.split().str.len().to_numpy(np.int64)
    ref_bins = (np.cumsum(ref_tokens) - ref_tokens) // 64

    outs = []
    for chunk in (16, 1000):
        out = (
            pack_sequences_ds(rd.from_pandas(docs), capacity=64, chunk=chunk)
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        assert np.array_equal(out["n_tokens"].to_numpy(np.int64), ref_tokens)
        assert np.array_equal(out["bin_id"].to_numpy(np.int64), ref_bins)
        outs.append(out)
    assert outs[0].equals(outs[1])
    assert (np.diff(outs[0]["bin_id"].to_numpy()) >= 0).all()


def test_range_join_count_brute_force():
    """range_join_count vs an O(n^2) reference, covering BETWEEN-inclusive
    boundaries, keys with no right rows, left ts before all right ts, and
    the int64-overflow chunked path (huge window -> max_chunk < n_keys)."""
    from rayrep.ops.windows import range_join_count

    rng = np.random.default_rng(11)
    n_l, n_r, n_keys, W = 400, 600, 300, 100
    left = pd.DataFrame({
        "k": rng.integers(0, n_keys, n_l).astype(np.int64),
        "ts": rng.integers(0, 5000, n_l).astype(np.int64),
        "rid": np.arange(n_l, dtype=np.int64),
    })
    right = pd.DataFrame({
        "k": rng.integers(50, n_keys + 50, n_r).astype(np.int64),
        "ts": rng.integers(0, 5000, n_r).astype(np.int64),
    })
    # force exact-boundary hits: right rows at ts and ts-W of some lefts
    right.loc[:20, ["k", "ts"]] = left.loc[:20, ["k", "ts"]].to_numpy()
    right.loc[21:40, "k"] = left.loc[21:40, "k"].to_numpy()
    right.loc[21:40, "ts"] = left.loc[21:40, "ts"].to_numpy() - W

    def brute(window):
        return np.array([
            ((right.k.to_numpy() == l.k)
             & (right.ts.to_numpy() >= l.ts - window)
             & (right.ts.to_numpy() <= l.ts)).sum()
            for l in left.itertuples()
        ], np.int64)

    for window in (W, 2 ** 55):  # 2^55 stride -> ~128-key chunks
        out = (
            range_join_count(rd.from_pandas(left), rd.from_pandas(right),
                             key="k", ts_col="ts", window_us=window,
                             out_col="n", keep_cols=["rid"])
            .to_pandas().sort_values("rid").reset_index(drop=True)
        )
        assert len(out) == n_l
        assert np.array_equal(out["n"].to_numpy(np.int64), brute(window))


def test_lang_id(docs_ds):
    out = docs_ds.map_batches(LangId(), batch_format="pyarrow").to_pandas()
    langs = out.set_index("doc_id")["lang_pred"]
    assert langs[0] == "en" and langs[3] == "de" and langs[5] == "fr"


def test_fingerprint_batch_invariant():
    fp = Fingerprint()
    a = fp(pa.table({"text": ["hello world document one", "zzz other"]}))
    b = fp(pa.table({"text": ["prefix pad pad pad", "hello world document one"]}))
    assert a["fingerprint"][0].as_py() == b["fingerprint"][1].as_py()
    assert a["fingerprint"][0].as_py() != a["fingerprint"][1].as_py()


def test_word_ngram_counts_batch_invariant():
    from collections import Counter

    from rayrep.ops.text import word_ngram_counts

    texts = ["a b c d e", "  x  y z ", "one two", "", "a b c", "p q r s"]
    whole = word_ngram_counts(pa.table({"text": texts}))
    merged = Counter()
    for lo, hi in [(0, 2), (2, 3), (3, 6)]:   # arbitrary batch split
        part = word_ngram_counts(pa.table({"text": texts[lo:hi]}))
        merged.update(dict(zip(part["ngram"].to_pylist(), part["n"].to_pylist())))
    assert dict(zip(whole["ngram"].to_pylist(), whole["n"].to_pylist())) == dict(merged)
    # grams never cross doc boundaries; short/empty docs emit nothing
    assert "d e x" not in merged and "one two a" not in merged
    assert merged["a b c"] == 2 and merged["x y z"] == 1


def test_exact_dedup(docs_ds):
    out = exact_dedup(docs_ds).to_pandas()
    assert len(out) == 5                      # 6 docs, one exact dup removed
    assert 0 in set(out.doc_id) and 1 not in set(out.doc_id)  # min id kept


def test_minhash_dedup(docs_ds):
    rep = minhash_dedup(docs_ds, threshold=0.5).set_index("doc_id")["rep"]
    assert rep[0] == rep[1] == rep[2] == 0    # exact + near dup cluster to min id
    assert rep[4] == 4                        # distinct content stays alone


def test_simhash_dedup(docs_ds):
    rep = simhash_dedup(docs_ds, max_hamming=8).set_index("doc_id")["rep"]
    assert rep[0] == rep[1] == 0
    assert rep[4] == 4


def test_ngram_jaccard_verify(docs_ds):
    pairs = pd.DataFrame({"a": [0, 0], "b": [1, 4]})
    out = ngram_jaccard_verify(docs_ds, pairs, threshold=0.5)
    assert list(out["a"]) == [0] and list(out["b"]) == [1]
    assert out["jaccard"].iloc[0] == 1.0


def test_ngram_jaccard_verify_ds_matches_driver_version(docs_ds):
    """The distributed (co-group) verifier must agree with the in-memory
    helper on the same candidate pairs, including sub-threshold drops."""
    from rayrep.ops.dedup import ngram_jaccard_verify_ds

    cand = pd.DataFrame({"a": [0, 0, 0, 3], "b": [1, 2, 4, 5]})
    want = ngram_jaccard_verify(docs_ds, cand, threshold=0.0)
    pairs = rd.from_pandas(cand)
    got = (
        ngram_jaccard_verify_ds(docs_ds, pairs, threshold=0.0)
        .to_pandas()
        .sort_values(["a", "b"])
        .reset_index(drop=True)
    )
    want = want.sort_values(["a", "b"]).reset_index(drop=True)
    assert len(got) == len(want)
    assert np.allclose(got["jaccard"], want["jaccard"])


def test_union_find():
    rep = union_find([1, 2, 3, 4], [(1, 2), (2, 3)])
    assert rep[1] == rep[2] == rep[3] == 1 and rep[4] == 4


def test_embedding_neardup():
    rng = np.random.default_rng(0)
    base = rng.standard_normal(16).astype(np.float32)
    vecs = [base, base + 0.01 * rng.standard_normal(16).astype(np.float32),
            rng.standard_normal(16).astype(np.float32)]
    ds = rd.from_pandas(pd.DataFrame({"vec_id": np.array([0, 1, 2], dtype=np.int64),
                                      "embedding": [v.tolist() for v in vecs]}))
    pairs = embedding_neardup(ds, threshold=0.98, planes=4)
    assert {(int(a), int(b)) for a, b in zip(pairs.a, pairs.b)} == {(0, 1)}


def test_topk_cosine_matches_bruteforce():
    rng = np.random.default_rng(1)
    m = rng.standard_normal((200, 8)).astype(np.float32)
    q = rng.standard_normal(8).astype(np.float32)
    ds = rd.from_pandas(pd.DataFrame({"vec_id": np.arange(200, dtype=np.int64),
                                      "embedding": [v.tolist() for v in m]}))
    got = topk_cosine(ds, q, k=5).to_pandas()
    mn = m / np.linalg.norm(m, axis=1, keepdims=True)
    qn = q / np.linalg.norm(q)
    expect = np.argsort(-(mn @ qn))[:5]
    assert list(got["vec_id"]) == list(expect)


def test_topk_cosine_task_mode_equals_actor_mode():
    # scorer_mode="tasks" (cached-task default) must rank identically to
    # the actor-pool path, multi-query
    rng = np.random.default_rng(3)
    m = rng.standard_normal((250, 8)).astype(np.float32)
    q = rng.standard_normal((3, 8)).astype(np.float32)
    ds = rd.from_pandas(pd.DataFrame({"vec_id": np.arange(250, dtype=np.int64),
                                      "embedding": [v.tolist() for v in m]}))
    a = (topk_cosine(ds, q, k=5).to_pandas()
         .sort_values(["query_idx", "vec_id"]).reset_index(drop=True))
    b = (topk_cosine(ds, q, k=5, scorer_mode="actors").to_pandas()
         .sort_values(["query_idx", "vec_id"]).reset_index(drop=True))
    pd.testing.assert_frame_equal(a, b)


def test_ivf_full_probe_equals_bruteforce():
    rng = np.random.default_rng(2)
    m = rng.standard_normal((300, 8)).astype(np.float32)
    q = rng.standard_normal(8).astype(np.float32)
    ds = rd.from_pandas(pd.DataFrame({"vec_id": np.arange(300, dtype=np.int64),
                                      "embedding": [v.tolist() for v in m]}))
    idx = train_ivf_from_dataset(ds, n_cells=8, sample_rows=300)
    got = idx.search(ds, q, k=5, nprobe=8).to_pandas()
    mn = m / np.linalg.norm(m, axis=1, keepdims=True)
    qn = q / np.linalg.norm(q)
    expect = np.argsort(-(mn @ qn))[:5]
    assert list(got["vec_id"]) == list(expect)


def test_multimodal_plumbing():
    media = synthesize_media_table(32)
    ds = rd.from_arrow(media)
    feats = ds.map_batches(DecodeImage, fn_constructor_kwargs={"decoder": "fake"},
                           batch_format="pyarrow", batch_size=8,
                           concurrency=(1, 2)).to_pandas()
    assert len(feats) == 32 and len(feats["feature"].iloc[0]) == 64
    # determinism: same payload -> same feature
    f2 = DecodeImage(decoder="fake")(media)
    assert np.allclose(np.stack(feats.sort_values("media_id")["feature"]),
                       np.stack(f2["feature"].to_numpy(zero_copy_only=False)))
    frames = ds.map_batches(SampleFrames, fn_constructor_kwargs={"decoder": "fake"},
                            batch_format="pyarrow", batch_size=8,
                            concurrency=(1, 2)).to_pandas()
    assert frames.groupby("media_id").size().min() >= 1
    audio = AudioFeatures(decoder="fake")(media)
    assert audio.num_rows == 32


def test_builtin_codecs_roundtrip_and_stats():
    """Dependency-free PPM/WAV codecs: byte-exact round-trip, comment-
    tolerant PPM headers, extra-chunk-tolerant WAV, named errors on
    malformed containers, and MediaStats aggregates over a genuinely
    decoded corpus (the closed-form streams the SQL oracle replays)."""
    from rayrep.ops.multimodal import (MediaStats, decode_ppm,
                                       decode_wav_pcm16, encode_ppm,
                                       encode_wav_pcm16,
                                       synthesize_codec_media_table)

    rng = np.random.default_rng(5)
    px = rng.integers(0, 256, (9, 17, 3), dtype=np.uint8)
    assert np.array_equal(decode_ppm(encode_ppm(px)), px)
    assert np.array_equal(
        decode_ppm(b"P6\n# comment\n17 9\n255\n" + px.tobytes()), px)
    s = rng.integers(-2048, 2048, 333).astype(np.int16)
    wav, rate = decode_wav_pcm16(encode_wav_pcm16(s, 8000))
    assert np.array_equal(wav, s) and rate == 8000
    # extra chunk before data (LIST) must be skipped
    raw = encode_wav_pcm16(s, 8000)
    import struct
    with_list = raw[:12] + struct.pack("<4sI", b"LIST", 4) + b"INFO" + raw[12:]
    # fix RIFF size
    with_list = (b"RIFF" + struct.pack("<I", len(with_list) - 8)
                 + with_list[8:])
    wav2, _ = decode_wav_pcm16(with_list)
    assert np.array_equal(wav2, s)
    with pytest.raises(ValueError):
        decode_ppm(b"P5\n1 1\n255\n\0")      # wrong magic
    with pytest.raises(ValueError):
        decode_wav_pcm16(b"RIFFxxxxNOPE")    # not WAVE
    # stats over a decoded corpus: spot-check one image row exactly
    tbl = synthesize_codec_media_table(6)
    st = MediaStats()(tbl).to_pandas().set_index("media_id")
    i = np.arange((12 + 0) * (20 + 0) * 3, dtype=np.int64)
    v = (0 * 7 + i * 13) % 256
    assert st.loc[0, "n_values"] == len(v)
    assert st.loc[0, "sum_values"] == v.sum()
    assert st.loc[0, "wsum_values"] == (i * v).sum()


def _has(mod):
    try:
        __import__(mod)
        return True
    except ImportError:
        return False


@pytest.mark.skipif(_has("PIL"), reason="container has Pillow; stub-raise test n/a")
def test_multimodal_real_decoder_raises_without_libs():
    media = synthesize_media_table(4)
    with pytest.raises(NotImplementedError):
        DecodeImage(decoder="real")(media)


@pytest.mark.skipif(not _has("PIL"), reason="Pillow not installed in this container")
def test_multimodal_real_image_decode():
    """Integration test for the REAL decode path — runs wherever Pillow
    exists (skip-marked here; the sandbox ships no media libs)."""
    import io

    from PIL import Image

    imgs = []
    for i in range(4):
        buf = io.BytesIO()
        Image.new("RGB", (48, 32), color=(i * 60, 10, 200)).save(buf, format="PNG")
        imgs.append(buf.getvalue())
    media = pa.table({
        "media_id": pa.array(np.arange(4, dtype=np.int64)),
        "kind": pa.array(["image"] * 4),
        "payload": pa.array(imgs, pa.binary()),
        "mime": pa.array(["image/png"] * 4),
        "width": pa.array(np.full(4, 48, np.int32)),
        "height": pa.array(np.full(4, 32, np.int32)),
        "duration_ms": pa.array(np.zeros(4, np.int32)),
    })
    out = DecodeImage(decoder="real", feat_dim=16)(media)
    assert out.num_rows == 4 and len(out["feature"][0].as_py()) == 16
    # deterministic: same payload → same feature
    out2 = DecodeImage(decoder="real", feat_dim=16)(media)
    assert np.allclose(np.stack(out["feature"].to_numpy(zero_copy_only=False)),
                       np.stack(out2["feature"].to_numpy(zero_copy_only=False)))


def test_rolling_mean_brute_force():
    """rolling_mean vs a pandas groupby().rolling() reference, covering
    window clamping at segment starts, duplicate-ts tiebreak ordering,
    mean and (sum, count) emit modes, and partition invariance."""
    from rayrep.ops.windows import rolling_mean

    rng = np.random.default_rng(3)
    n, n_keys, w = 500, 40, 5
    df = pd.DataFrame({
        "k": rng.integers(0, n_keys, n).astype(np.int64),
        "ts": rng.integers(0, 80, n).astype(np.int64),  # many ts ties
        "event_id": np.arange(n, dtype=np.int64),
        "value": np.round(rng.uniform(0, 100, n), 2),
    })
    ref = df.sort_values(["k", "ts", "event_id"], kind="stable")
    g = ref.groupby("k")["value"]
    ref = ref.assign(
        exp_mean=g.transform(lambda s: s.rolling(w, min_periods=1).mean()),
        exp_sum=g.transform(lambda s: s.rolling(w, min_periods=1).sum()),
        exp_n=g.transform(lambda s: s.rolling(w, min_periods=1).count()),
    ).sort_values("event_id").reset_index(drop=True)

    for parts in (1, 7):
        out = (
            rolling_mean(rd.from_pandas(df), key="k", ts_col="ts",
                         value_col="value", n=w, num_partitions=parts)
            .to_pandas().sort_values("event_id").reset_index(drop=True)
        )
        assert np.allclose(out["rolling_avg"], ref["exp_mean"], atol=1e-9)

    out = (
        rolling_mean(rd.from_pandas(df), key="k", ts_col="ts",
                     value_col="value", n=w, out_col="s",
                     emit_sum_count=True, num_partitions=4)
        .to_pandas().sort_values("event_id").reset_index(drop=True)
    )
    assert np.allclose(out["s"], ref["exp_sum"], atol=1e-9)
    assert np.array_equal(out["n_window"].to_numpy(np.int64),
                          ref["exp_n"].to_numpy(np.int64))


def test_ordered_string_agg_brute_force():
    """ordered_string_agg vs a pandas sort + groupby-join reference,
    covering ts ties (tiebreak ordering), single-row keys, and
    partition invariance."""
    from rayrep.ops.windows import ordered_string_agg

    rng = np.random.default_rng(5)
    n, n_keys = 400, 60  # some keys get 1 row, some many
    df = pd.DataFrame({
        "k": rng.integers(0, n_keys, n).astype(np.int64),
        "ts": rng.integers(0, 50, n).astype(np.int64),
        "event_id": np.arange(n, dtype=np.int64),
        "v": rng.choice(["a", "bb", "ccc", ""], n),  # incl. empty strings
    })
    ref = (
        df.sort_values(["k", "ts", "event_id"], kind="stable")
        .groupby("k")
        .agg(journey=("v", ">".join), n_events=("v", "size"))
        .reset_index()
    )
    for parts in (1, 9):
        out = (
            ordered_string_agg(rd.from_pandas(df), key="k", value_col="v",
                               ts_col="ts", tiebreak="event_id",
                               num_partitions=parts)
            .to_pandas().sort_values("k").reset_index(drop=True)
        )
        assert out["k"].tolist() == ref["k"].tolist()
        assert out["journey"].tolist() == ref["journey"].tolist()
        assert out["n_events"].tolist() == ref["n_events"].tolist()


def test_kmv_distinct_accuracy_and_batch_invariance():
    """KMV sketch: (a) exact when a group has < k distinct values, (b)
    within the ~1/sqrt(k) error envelope when over k, (c) the estimate is
    invariant to how rows are split into batches/blocks (mergeability)."""
    from rayrep.ops.sketch import kmv_distinct

    rng = np.random.default_rng(7)
    small = rng.integers(0, 40, 500)        # 'small': <k distinct -> exact
    big = rng.integers(0, 5000, 20000)      # 'big': >>k distinct -> approx
    df = pd.DataFrame({
        "g": ["small"] * len(small) + ["big"] * len(big),
        "v": np.concatenate([small, big]).astype(np.int64),
    })
    outs = []
    for parts in (1, 7):
        ds = rd.from_pandas(df).repartition(parts)
        out = kmv_distinct(ds, group_col="g", value_col="v", k=64)
        outs.append(out.set_index("g")["approx_distinct"])
    # batch/partition invariance: identical estimates
    pd.testing.assert_series_equal(outs[0], outs[1])
    est = outs[0]
    assert est["small"] == float(len(np.unique(small)))  # exact branch
    true_big = len(np.unique(big))
    assert abs(est["big"] - true_big) / true_big < 4 / np.sqrt(64)  # ~4 sigma


def test_cms_one_sided_and_batch_invariant():
    """Count-min sketch: (a) estimates never under-count (one-sided
    error), (b) keys with no bucket collisions in some depth row are
    exact, (c) the sketch is invariant to batch/partition splits
    (mergeability), (d) an absent key whose cells are all empty reads 0."""
    from rayrep.ops.sketch import cms_build, cms_estimate

    rng = np.random.default_rng(3)
    keys = rng.zipf(1.3, 30000) % 500  # skewed frequencies
    df = pd.DataFrame({"k": keys.astype(np.int64)})
    true = pd.Series(keys).value_counts()
    sketches = []
    for parts in (1, 6):
        ds = rd.from_pandas(df).repartition(parts)
        sketches.append(cms_build(ds, "k", width=4096, depth=4))
    assert np.array_equal(sketches[0], sketches[1])  # mergeability
    probe = np.arange(600, dtype=np.int64)  # 500..599 absent
    est = cms_estimate(sketches[0], probe)
    exact = np.array([true.get(int(k), 0) for k in probe], dtype=np.int64)
    assert (est >= exact).all()                      # one-sided
    # at width 4096 with ~500 distinct keys, most estimates are exact
    assert (est == exact).mean() > 0.9
    assert est.sum() >= exact.sum()


def test_ivf_exact_pruned_read_matches_and_prunes(tmp_path):
    """The materialized cell-partitioned IVF layout must (a) return the
    IDENTICAL pruned top-k as the per-query full-scan path, and (b)
    actually prune the READ: the probed files' bytes must be a strict
    minority of the index (nprobe=2 of 8 cells).  Regression for the r3
    'full scan per query' verdict item."""
    from rayrep.ops.similarity import (ivf_exact_build,
                                       ivf_exact_pruned_read_topk,
                                       ivf_exact_pruned_topk)

    SF = "/root/testdata/sf0.001"
    ds = rd.read_parquet(SF + "/embeddings.parquet",
                         columns=["vec_id", "embedding"])
    legacy = ivf_exact_pruned_topk(ds, k_clusters=8, iters=3, nprobe=2, k=10)
    index_dir = str(tmp_path / "ivfx")
    ivf_exact_build(ds, index_dir, k_clusters=8, iters=3)
    import pyarrow.parquet as pq

    from rayrep.ops.similarity import KM_SCALE
    t = pq.read_table(SF + "/embeddings.parquet",
                      columns=["vec_id", "embedding"])
    qpos = t["vec_id"].to_pylist().index(0)
    q_int = np.floor(np.asarray(t["embedding"][qpos].as_py(),
                                dtype=np.float64) * KM_SCALE).astype(np.int64)
    out, detail = ivf_exact_pruned_read_topk(index_dir, q_int, nprobe=2,
                                             k=10, return_detail=True)
    pd.testing.assert_frame_equal(out, legacy)
    assert detail["bytes_read"] < 0.75 * detail["bytes_total"], detail
    assert len(detail["paths"]) >= 1


def test_ivf_float_index_exhaustive_probe_is_exact(tmp_path):
    """Materialized float-IVF layout with nprobe=n_cells must equal brute
    force (the layout loses no rows); nprobe<n_cells reads fewer files."""
    from rayrep.ops.similarity import (IVFIndex, topk_cosine,
                                       train_ivf_from_dataset)

    SF = "/root/testdata/sf0.001"
    ds = rd.read_parquet(SF + "/embeddings.parquet",
                         columns=["vec_id", "embedding"])
    import pyarrow.parquet as pq

    t = pq.read_table(SF + "/embeddings.parquet", columns=["vec_id", "embedding"])
    q = np.asarray(t["embedding"][t["vec_id"].to_pylist().index(0)].as_py())
    idx = train_ivf_from_dataset(ds, n_cells=8, sample_rows=1024)
    index_dir = str(tmp_path / "ivff")
    idx.materialize(ds, index_dir)
    loaded = IVFIndex.load(index_dir)
    full = sorted(topk_cosine(ds, q, k=10).to_pandas()["vec_id"])
    via_index = sorted(
        loaded.search_index(index_dir, q, k=10, nprobe=8).to_pandas()["vec_id"])
    assert via_index == full
    pruned_files = loaded._probe_paths(
        index_dir,
        np.argsort(-( q / np.linalg.norm(q) @ loaded.centroids.T))[:2])
    all_files = loaded._probe_paths(index_dir, range(8))
    assert len(pruned_files) < len(all_files)


def test_sketch_sql_hash_parity_negative_keys():
    """The DuckDB oracle's double-hash family must be bit-identical to the
    numpy kernels for ANY int64 key — negative keys wrap through two's
    complement (numpy ``astype(uint64)``), the shift is LOGICAL, and the
    mul-mod is overflow-free HUGEINT arithmetic.  Regression for the r3
    advice item: the old SQL used the signed value directly, so buckets
    silently depended on keys being non-negative."""
    import duckdb

    from rayrep.ops.sketch import (KMV_MULT, _bloom_positions, _kmv_hash,
                                   _sql_mulmod64, _sql_u64,
                                   sql_hash_pair_select)

    rng = np.random.default_rng(11)
    keys = np.concatenate([
        rng.integers(-2**63, 2**63, 400, dtype=np.int64),
        np.array([0, -1, 1, -2**63, 2**63 - 1], dtype=np.int64)])
    con = duckdb.connect()
    con.register("t", pa.table({"k": keys}))
    hv_sql = [int(r[0]) for r in con.sql(
        f"SELECT {_sql_mulmod64(_sql_u64('k'), int(KMV_MULT))} FROM t"
    ).fetchall()]
    assert hv_sql == [int(h) for h in _kmv_hash(keys)]
    width, depth = 8192, 4
    pos_np = _bloom_positions(keys, width, depth)
    rows = con.sql(f"""
        SELECT k, t2.i,
               ((h1 + t2.i::HUGEINT * h2) % 18446744073709551616::HUGEINT)
                   % {width}
        FROM {sql_hash_pair_select('k', 't')} t1, range({depth}) t2(i)
    """).fetchall()
    pm = {(int(k), int(i)): int(b) for k, i, b in rows}
    for j, k in enumerate(keys):
        for i in range(depth):
            assert pm[(int(k), i)] == int(pos_np[j, i])
    con.close()


def test_bloom_prefilter_no_false_negatives():
    """Every key present in the filter side MUST survive the prefilter
    (no false negatives); composition with an exact join is therefore
    exact. Also checks the bitmap actually prunes (false-positive rate
    well under 50% at these sizes)."""
    import ray

    from rayrep.ops.sketch import bloom_filter, bloom_prefilter

    rng = np.random.default_rng(11)
    keys = np.unique(rng.integers(0, 1 << 40, 2000).astype(np.int64))
    probe_hit = rng.choice(keys, 1500)
    probe_miss = np.unique(rng.integers(1 << 41, 1 << 42, 3000).astype(np.int64))
    keys_ds = rd.from_pandas(pd.DataFrame({"k": keys})).repartition(4)
    bref = bloom_filter(keys_ds, "k", m_bits=1 << 16, n_hashes=4)
    probe = rd.from_pandas(pd.DataFrame(
        {"k": np.concatenate([probe_hit, probe_miss])})).repartition(3)
    kept = bloom_prefilter(probe, "k", bref).to_pandas()["k"].to_numpy()
    kept_set = set(kept.tolist())
    assert all(int(k) in kept_set for k in probe_hit)          # no false negatives
    fp = sum(1 for k in probe_miss if int(k) in kept_set)
    assert fp / len(probe_miss) < 0.5                          # real pruning


def test_histogram_quantiles_accuracy_and_partition_invariance():
    """Histogram quantile sketch: within one bin width of the exact
    discrete quantile, and invariant to batch/partition splits."""
    from rayrep.ops.sketch import histogram_quantiles

    rng = np.random.default_rng(3)
    df = pd.DataFrame({
        "g": rng.choice(["a", "b"], 5000),
        "v": rng.gamma(2.0, 20.0, 5000),
    })
    outs = []
    for parts in (1, 8):
        out = histogram_quantiles(rd.from_pandas(df).repartition(parts),
                                  group_col="g", value_col="v",
                                  quantiles=(0.5, 0.95), scale=10.0)
        outs.append(out.set_index("g"))
    pd.testing.assert_frame_equal(outs[0], outs[1])  # mergeability
    import math

    for g in ("a", "b"):
        v = np.sort(df.loc[df["g"] == g, "v"].to_numpy())
        for q, col in ((0.5, "p50_est"), (0.95, "p95_est")):
            # the sketch's contract: the lower bin edge of the element at
            # rank ceil(q*n) (1-based) — assert exact equality to it, and
            # one-bin-width closeness to the interpolated quantile
            rank_val = v[math.ceil(q * len(v)) - 1]
            assert outs[0].loc[g, col] == np.floor(rank_val * 10.0) / 10.0
            assert abs(outs[0].loc[g, col] - np.quantile(v, q)) <= 0.2 + 1e-9


def test_semdedup_group_block_invariance_and_rule():
    """_semdedup_group: blocked pairwise pass equals the O(n²) brute-force
    lowest-id-wins rule, independent of block size and input row order."""
    import pyarrow as pa

    from rayrep.ops.similarity import _semdedup_group, _quantize_embeddings

    rng = np.random.default_rng(7)
    n, d = 200, 16
    base = rng.normal(size=(n, d)).astype(np.float32)
    base[50] = base[10] + 1e-4  # planted near-dup (higher id loses)
    base[3] = base[120] + 1e-4  # planted near-dup (LOWER id of the pair)
    ids = rng.permutation(n)  # shuffled row order
    g = pa.table({
        "vec_id": pa.array(ids.astype(np.int64)),
        "embedding": pa.array([base[i].tolist() for i in ids],
                              pa.list_(pa.float32())),
        "cluster": pa.array(np.zeros(n, np.int64)),
    })
    q = _quantize_embeddings(g.column("embedding"))
    order = np.argsort(ids)
    qs = q[order]
    theta = 10_000_000
    d2 = ((qs[:, None, :] - qs[None, :, :]) ** 2).sum(axis=2)
    expect = (np.tril(d2 <= theta, -1)).any(axis=1)
    assert expect.sum() >= 2  # both planted pairs found
    for block in (7, 64, 1024):
        out = _semdedup_group(g, theta=theta, id_col="vec_id",
                              emb_col="embedding", block=block)
        assert out.column("vec_id").to_pylist() == sorted(ids.tolist())
        assert np.array_equal(
            out.column("is_dup").to_numpy(zero_copy_only=False), expect)


def test_dup_span_matches_bruteforce_and_split_invariant():
    """Duplicate-span counts equal an O(n^2) per-doc brute force over a
    corpus with planted shared spans, and are invariant to how docs are
    split into blocks."""
    from rayrep.ops.text import dup_span_doc_counts

    rng = np.random.default_rng(5)
    shared = "the quick brown fox jumps over it"  # 33 chars
    docs = []
    for i in range(40):
        base = "".join(rng.choice(list("abcdefgh "), 60))
        if i % 5 == 0:
            base = base[:20] + shared + base[20:]
        docs.append(base)
    df = pd.DataFrame({"doc_id": np.arange(40, dtype=np.int64), "text": docs})

    k = 20
    grams = {}
    for i, t in enumerate(docs):
        for p in range(len(t) - k + 1):
            grams.setdefault(t[p:p + k], set()).add(i)
    expect = {}
    for i, t in enumerate(docs):
        c = sum(1 for p in range(len(t) - k + 1)
                if len(grams[t[p:p + k]]) >= 2)
        if c:
            expect[i] = c

    outs = []
    for parts in (1, 7):
        ds = rd.from_pandas(df).repartition(parts)
        out = dup_span_doc_counts(ds, k=k)
        outs.append(dict(zip(out["doc_id"], out["dup_spans"])))
    assert outs[0] == outs[1] == expect


def test_dup_span_scale_levers():
    """hashed=True must reproduce the exact-string doc counts on the test
    corpus (64-bit collisions effectively impossible at this size);
    content-defined stride sampling must (a) flag a subset of the exact
    mode's docs, (b) still catch a long planted shared span, (c) pick the
    SAME grams in both docs sharing a span (content-defined, not
    positional)."""
    from rayrep.ops.text import dup_span_doc_counts

    rng = np.random.default_rng(9)
    shared = "a very long shared passage that two documents have in common verbatim"
    docs = []
    for i in range(30):
        base = "".join(rng.choice(list("abcdefgh "), 80))
        if i in (3, 17):
            base = base[:10] + shared + base[10:]
        docs.append(base)
    df = pd.DataFrame({"doc_id": np.arange(30, dtype=np.int64), "text": docs})
    ds = rd.from_pandas(df).repartition(4)

    exact = dup_span_doc_counts(ds, k=20)
    hashed = dup_span_doc_counts(ds, k=20, hashed=True)
    pd.testing.assert_frame_equal(exact, hashed)

    sampled = dup_span_doc_counts(ds, k=20, stride=4, hashed=True)
    flagged = set(sampled["doc_id"])
    assert flagged <= set(exact["doc_id"])          # no new docs appear
    assert {3, 17} <= flagged                       # long span still caught
    # both members of the pair see the same sampled grams → equal counts
    s = sampled.set_index("doc_id")["dup_spans"]
    assert s[3] == s[17] > 0


def test_tumbling_window_drops_cross_part_watermark():
    """Hand-computed late-drop case whose watermark crosses a part
    boundary (chunk=2 -> ids {0,1} and {2,3} in different parts): id2 is
    backdated behind a watermark the PREVIOUS part set, so it must drop
    via the broadcast incoming prefix max, not local state."""
    from rayrep.ops.windows import tumbling_window_agg

    base = np.datetime64("2024-01-01T00:00:00", "us").astype(np.int64)
    et = np.array([100, 5000, 150, 5100], dtype=np.int64)  # event-time us
    t = pa.table({
        "event_id": pa.array(np.arange(4, dtype=np.int64)),
        "ts": pa.array((base + et).astype("datetime64[us]")),
        "user_id": pa.array(np.array([7, 7, 7, 7], dtype=np.int64)),
        "value": pa.array([1.5, 2.5, 100.0, 4.0]),
    })
    out = tumbling_window_agg(
        rd.from_arrow(t).repartition(2), width_us=1000, lateness_us=0,
        chunk=2,
    ).to_pandas().sort_values("window_start").reset_index(drop=True)
    # id0 (ws=base+0) keeps; id1 (ws=base+5000) keeps; id2 (ws=base+0)
    # arrives at wm=5000 > 0+1000+0 -> DROPPED; id3 (ws=base+5000) keeps.
    ws0 = (base + 100) // 1000 * 1000
    ws5 = (base + 5000) // 1000 * 1000
    assert out["window_start"].tolist() == [ws0, ws5]
    assert out["n_events"].tolist() == [1, 2]
    assert out["value_fp"].tolist() == [15000, 25000 + 40000]


def test_tumbling_window_no_lateness_equals_plain_groupby():
    """With unlimited lateness nothing drops: result == a plain
    (user, floor(ts/width)) groupby, regardless of partitioning."""
    from rayrep.ops.windows import tumbling_window_agg

    rng = np.random.default_rng(7)
    n = 500
    ts = (np.datetime64("2024-01-01", "us").astype(np.int64)
          + rng.integers(0, 10**10, n))
    t = pa.table({
        "event_id": pa.array(np.arange(n, dtype=np.int64)),
        "ts": pa.array(ts.astype("datetime64[us]")),
        "user_id": pa.array(rng.integers(0, 9, n)),
        "value": pa.array(rng.uniform(0, 50, n)),
    })
    width = 3_600_000_000
    out = tumbling_window_agg(
        rd.from_arrow(t).repartition(5), width_us=width,
        lateness_us=np.iinfo(np.int64).max // 2, chunk=64,
    ).to_pandas()
    df = t.to_pandas()
    df["window_start"] = (df.ts.astype("int64") // width) * width
    df["v_fp"] = np.floor(df.value * 10_000).astype(np.int64)
    exp = (df.groupby(["user_id", "window_start"], as_index=False)
           .agg(n_events=("v_fp", "size"), value_fp=("v_fp", "sum")))
    key = ["user_id", "window_start"]
    got = out.sort_values(key).reset_index(drop=True)
    exp = exp.sort_values(key).reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got[key + ["n_events", "value_fp"]].astype("int64"),
        exp[key + ["n_events", "value_fp"]].astype("int64"))


def test_hopping_window_brute_force():
    """Every (key, window) count/sum equals the O(n·m) reference fan-out."""
    from rayrep.ops.windows import hopping_window_agg

    rng = np.random.default_rng(11)
    n = 300
    ts = (np.datetime64("2024-01-01", "us").astype(np.int64)
          + rng.integers(0, 10**10, n))
    t = pa.table({
        "user_id": pa.array(rng.integers(0, 5, n)),
        "ts": pa.array(ts.astype("datetime64[us]")),
        "value": pa.array(rng.uniform(0, 9, n)),
    })
    width, hop = 3_600_000_000, 1_200_000_000
    out = (hopping_window_agg(rd.from_arrow(t).repartition(4),
                              width_us=width, hop_us=hop)
           .to_pandas().sort_values(["user_id", "window_start"])
           .reset_index(drop=True))
    rows = []
    df = t.to_pandas()
    for _, r in df.iterrows():
        et = int(pd.Timestamp(r.ts).value // 1000)
        for m in range(width // hop):
            ws = (et // hop) * hop - m * hop
            if ws >= 0:
                rows.append((r.user_id, ws,
                             int(np.floor(r.value * 10_000))))
    exp = (pd.DataFrame(rows, columns=["user_id", "window_start", "v"])
           .groupby(["user_id", "window_start"], as_index=False)
           .agg(n_events=("v", "size"), value_fp=("v", "sum"))
           .sort_values(["user_id", "window_start"]).reset_index(drop=True))
    pd.testing.assert_frame_equal(
        out[["user_id", "window_start", "n_events", "value_fp"]]
        .astype("int64"),
        exp.astype("int64"))


def test_pii_redact_counts_and_masks():
    import pyarrow as pa

    from rayrep.ops.text import PIIRedact

    batch = pa.table({
        "doc_id": pa.array([1, 2, 3], pa.int64()),
        "text": pa.array([
            "mail a@b.co and c.d+x@e-f.org then call 415-555-0199 now",
            "no pii here at all",
            "double 212-555-1 and 212-555-12 plus bob@x.io",
        ]),
    })
    out = PIIRedact()(batch)
    assert out.column("n_emails").to_pylist() == [2, 0, 1]
    assert out.column("n_phones").to_pylist() == [1, 0, 2]
    red = out.column("redacted_text").to_pylist()
    assert red[0] == "mail <EMAIL> and <EMAIL> then call <PHONE> now"
    assert red[1] == "no pii here at all"
    assert red[2] == "double <PHONE> and <PHONE> plus <EMAIL>"
    # idempotent: a second pass finds nothing left to redact
    again = PIIRedact(text_col="redacted_text")(
        out.select(["doc_id", "redacted_text"]))
    assert again.column("n_emails").to_pylist() == [0, 0, 0]
    assert again.column("n_phones").to_pylist() == [0, 0, 0]


def test_asof_join_arrow_kernel_edges():
    """The Arrow searchsorted kernel must preserve the pandas-era edge
    semantics: matched rows whose VALUE is null are KEPT (inner-asof is a
    match test, not a value-null test), unmatched left rows drop even
    with empty value_cols, equal-(key, ts) right rows dedup to the
    max-tiebreak winner, and a left ts before every right ts for its key
    is unmatched — across string keys and multiple partitions."""
    from rayrep.ops.windows import asof_join

    left = pd.DataFrame({
        "k": ["a", "a", "b", "b", "c", "zz"],
        "ts": pd.to_datetime([10, 25, 5, 30, 7, 50], unit="s"),
        "lval": [1, 2, 3, 4, 5, 6],
    })
    right = pd.DataFrame({
        # (a,20) appears twice: tiebreak 9 must win; c has only ts=8 (> 7)
        "k": ["a", "a", "a", "b", "c"],
        "ts": pd.to_datetime([20, 20, 2, 30, 8], unit="s"),
        "v": [100.0, None, 300.0, None, 500.0],
        "tb": [4, 9, 1, 1, 1],
    })
    lt = pa.Table.from_pandas(left).set_column(
        1, "ts", pa.Table.from_pandas(left)["ts"].cast(pa.timestamp("us")))
    rt = pa.Table.from_pandas(right).set_column(
        1, "ts", pa.Table.from_pandas(right)["ts"].cast(pa.timestamp("us")))
    out = asof_join(
        rd.from_arrow(lt), rd.from_arrow(rt),
        key="k", ts_col="ts", value_cols=["v"], right_tiebreak="tb",
        num_partitions=3,
        left_schema=lt.schema, right_schema=rt.schema,
    ).to_pandas().sort_values("lval").reset_index(drop=True)
    # a@10 -> right a@2 (300); a@25 -> a@20 winner tb=9 (null value KEPT);
    # b@5 unmatched (earliest right b is 30); b@30 -> b@30 (null KEPT);
    # c@7 unmatched; zz@50 unmatched (no right key)
    assert out["lval"].tolist() == [1, 2, 4]
    assert out["v"].tolist()[0] == 300.0
    assert pd.isna(out["v"].tolist()[1]) and pd.isna(out["v"].tolist()[2])
