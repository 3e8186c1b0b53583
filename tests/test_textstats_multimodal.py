"""Text analysis + multimodal plumbing."""

from __future__ import annotations

from cie_spark.operators import multimodal, textstats


def test_token_stats(spark):
    d = spark.createDataFrame(
        [(1, "one two  three"), (2, ""), (3, None), (4, "  padded  ")],
        "doc_id long, text string",
    )
    got = {r.doc_id: r.n_tokens for r in textstats.doc_token_stats(d).collect()}
    assert got == {1: 3, 2: 0, 3: 0, 4: 1}


def test_quality_counts(spark):
    d = spark.createDataFrame(
        [(1, "The cat, and a dog! 42 times.")], "doc_id long, text string"
    )
    r = textstats.doc_quality(d).collect()[0]
    assert r.n_chars == 29
    assert r.n_digit == 2
    assert r.n_punct == 3  # , ! .  (two periods? -> ',', '!', '.')
    assert r.n_tokens == 7
    assert r.len_ok == 0


def test_lang_guess_markers(spark):
    d = spark.createDataFrame(
        [
            (1, "the cat and the dog of the house is here"),
            (2, "el gato de la casa que los perros"),
            (3, "der hund und die katze das ist gut"),
        ],
        "doc_id long, text string",
    )
    got = {r.doc_id: r.lang_guess for r in textstats.doc_lang_guess(d).collect()}
    assert got == {1: "en", 2: "es", 3: "de"}


def test_fingerprint_whitespace_insensitive(spark):
    d = spark.createDataFrame(
        [(1, "Hello   world"), (2, "hello world "), (3, "other")],
        "doc_id long, text string",
    )
    got = {r.doc_id: r.fingerprint for r in textstats.doc_fingerprint(d).collect()}
    assert got[1] == got[2] != got[3]


def test_multimodal_feature_plumbing(spark):
    media = multimodal.synthesize_media(spark, n=12)
    feats = multimodal.extract_features(media).collect()
    assert len(feats) == 12
    for r in feats:
        assert r.n_bytes > 0 and len(r.digest) == 64
        assert len(r.feature) == 16
        assert all(0.0 <= x <= 1.0 for x in r.feature)
    # determinism across runs
    again = {r.media_id: r.digest for r in multimodal.extract_features(media).collect()}
    assert all(again[r.media_id] == r.digest for r in feats)


def test_multimodal_resize_and_frames(spark):
    media = multimodal.synthesize_media(spark, n=12).cache()
    resized = multimodal.resize_images(media).collect()
    assert resized and all(r.meta.width == 224 and r.meta.height == 224 for r in resized)
    frames = multimodal.sample_frames(media, every_ms=1000).collect()
    assert frames
    for r in frames:
        assert r.frame_ms % 1000 == 0
    media.unpersist()


def test_sample_frames_skips_null_duration_videos(spark):
    """ADVICE r2: a non-CBMV video with NULL/0 duration has no sampleable
    timeline — it must emit zero frame rows, not a spurious t=0 frame."""
    import pandas as pd

    rows = [
        {"media_id": 1, "kind": "video", "payload": None,
         "meta": {"width": None, "height": None, "duration_ms": None,
                  "codec": "h264"}},
        {"media_id": 2, "kind": "video", "payload": None,
         "meta": {"width": None, "height": None, "duration_ms": 0,
                  "codec": "h264"}},
        {"media_id": 3, "kind": "video", "payload": None,
         "meta": {"width": None, "height": None, "duration_ms": 2500,
                  "codec": "h264"}},
    ]
    df = spark.createDataFrame(
        pd.DataFrame(rows),
        schema=multimodal.MEDIA_SCHEMA,
    )
    got = multimodal.sample_frames(df, every_ms=1000).collect()
    by_id = {}
    for r in got:
        by_id.setdefault(r.media_id, []).append(r.frame_ms)
    assert 1 not in by_id and 2 not in by_id
    assert sorted(by_id[3]) == [0, 1000, 2000]
