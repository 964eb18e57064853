"""Multimodal mapInPandas plumbing + the stateful streaming suppressor."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from openlogreplicator_spark.multimodal import (
    MEDIA_DDL,
    extract_media_features,
    fake_payload,
    sample_frames,
)


@pytest.fixture(scope="module")
def media_df(spark):
    rows = [
        (1, "image", fake_payload("image", 640, 480, 1, 0, b"img-one-bytes"), None),
        (2, "image", fake_payload("image", 32, 32, 1, 0, b"img-two"), None),
        (3, "audio", fake_payload("audio", 0, 0, 1, 44100, b"pcm" * 50), None),
        (4, "video", fake_payload("video", 1280, 720, 8, 0, b"frame" * 64), None),
        (5, "image", b"\x89PNG not really", None),  # non-FAKE payload
        (6, "image", fake_payload("image", 640, 480, 1, 0, b"img-one-bytes"), None),
    ]
    return spark.createDataFrame(rows, MEDIA_DDL).cache()


def test_feature_extraction_schema_and_determinism(media_df):
    feats = extract_media_features(media_df).toPandas().set_index("media_id")
    assert feats.loc[1, "width"] == 640 and feats.loc[1, "height"] == 480
    assert feats.loc[3, "sample_rate"] == 44100
    assert all(len(e) == 16 for e in feats["embedding"])
    # identical payloads -> identical sha + embedding (exact-dup detection)
    assert feats.loc[1, "content_sha"] == feats.loc[6, "content_sha"]
    assert list(feats.loc[1, "embedding"]) == list(feats.loc[6, "embedding"])
    # unknown container: plumbing still yields a row (decode stubbed to zeros)
    assert feats.loc[5, "width"] == 0 and feats.loc[5, "n_bytes"] > 0
    # unit-norm embeddings feed the ANN operators directly
    import numpy as np

    assert abs(np.linalg.norm(np.array(feats.loc[2, "embedding"])) - 1.0) < 1e-5


def test_feature_extraction_partition_invariance(media_df):
    a = extract_media_features(media_df).toPandas().sort_values("media_id")
    b = extract_media_features(media_df.repartition(7)).toPandas().sort_values("media_id")
    assert list(a["content_sha"]) == list(b["content_sha"])


def test_frame_sampling(media_df):
    frames = sample_frames(media_df, every_nth=2).toPandas()
    assert set(frames["media_id"]) == {4}
    assert list(frames["frame_idx"]) == [0, 2, 4, 6]  # every 2nd of 8
    assert (frames["frame_bytes"] > 0).all()


def test_stateful_suppressor_cross_epoch(spark, events_dir, events_pdf, tmp_path):
    """Events at-or-below a key's stored high-watermark are suppressed across
    micro-batches; survivors still contain every LWW winner."""
    from openlogreplicator_spark.operators.decode import EVENTS_DDL
    from openlogreplicator_spark.streaming.stateful import suppress_stale_events

    stream = (
        spark.readStream.schema(EVENTS_DDL)
        .option("maxFilesPerTrigger", 2)
        .parquet(events_dir)
        .filter((F.col("op") != "ddl") & (~F.col("rolled_back")))
        .withColumn("extras_json", F.to_json("extras"))
        .withColumn("before_json", F.to_json("before"))
        .select("url", "warc_ts", "seq", "op", "html", "text", "lang",
                "extras_json", "before_json", "schema_ver")
    )
    out = suppress_stale_events(stream)
    q = (
        out.writeStream.format("memory")
        .queryName("suppressed")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = spark.sql("SELECT * FROM suppressed").toPandas()

    dml = events_pdf[(events_pdf["op"] != "ddl") & (~events_pdf["rolled_back"])]
    assert 0 < len(got) < len(dml)  # something suppressed, something kept
    # survivors per url are strictly increasing in (warc_ts, seq) within each
    # epoch boundary; final winner always survives:
    winners = (
        dml.sort_values(["warc_ts", "seq"], kind="stable").groupby("url").tail(1)
    )
    got_keys = set(zip(got["url"], got["seq"]))
    for _, w in winners.iterrows():
        assert (w["url"], w["seq"]) in got_keys
    # no row is emitted twice
    assert len(got_keys) == len(got)
    # LWW over the survivors equals LWW over the full stream (suppression
    # only removes rows that could never win)
    surv = dml.merge(got[["url", "seq"]], on=["url", "seq"])
    surv_winners = (
        surv.sort_values(["warc_ts", "seq"], kind="stable").groupby("url").tail(1)
    )
    a = winners.sort_values("url")[["url", "seq"]].reset_index(drop=True)
    b = surv_winners.sort_values("url")[["url", "seq"]].reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)


def test_pipeline_suppress_stale_matches_golden_and_shrinks(
    spark, events_dir, events_pdf, tmp_path
):
    """run_available_now(suppress_stale=True): final state identical to the
    unsuppressed run (the pre-filter only drops rows that cannot win), and
    later epochs see SHRUNKEN input (metrics events_in < raw rows) because
    duplicates / stale updates die at the state filter."""
    import glob
    import os

    from openlogreplicator_spark.streaming.pipeline import CdcPipeline

    ref = CdcPipeline(spark, events_dir, str(tmp_path / "tr"), str(tmp_path / "cr"))
    ref.run_available_now(max_files_per_trigger=2)

    sup = CdcPipeline(spark, events_dir, str(tmp_path / "ts"), str(tmp_path / "cs"),
                      metrics_path=str(tmp_path / "ms"))
    sup.run_available_now(max_files_per_trigger=2, suppress_stale=True)

    a = ref.target_state().toPandas().sort_values("url").reset_index(drop=True)
    b = sup.target_state().toPandas().sort_values("url").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)

    m = spark.read.parquet(str(tmp_path / "ms")).toPandas()
    raw_rows = len(events_pdf)
    assert m["events_in"].sum() < raw_rows  # stale rows died before the epoch
    # schema evolution still happened (ddl rows bypassed the state filter)
    assert dict(sup.target_state().dtypes)["http_status"] == "bigint"


def test_suppress_stale_carries_before_images(spark, events_dir, events_pdf, tmp_path):
    """ADVICE r02: the stale-suppression path must NOT null the before-image —
    a before-image sink fed from a suppress_stale stream keeps its
    update/delete before rows (base64 JSON ride through the state operator)."""
    from openlogreplicator_spark.operators.decode import EVENTS_DDL
    from openlogreplicator_spark.streaming.pipeline import CdcPipeline

    p = CdcPipeline(spark, events_dir, str(tmp_path / "t"), str(tmp_path / "c"))
    stream = (
        spark.readStream.schema(EVENTS_DDL)
        .option("maxFilesPerTrigger", 2)
        .parquet(events_dir)
    )
    q = (
        p._with_stale_suppression(stream)
        .writeStream.format("memory")
        .queryName("with_before")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = spark.sql("SELECT url, seq, before FROM with_before").toPandas()
    # rolled-back rows bypass the state filter (union branch) and keep their
    # before-image too — compare against ALL non-ddl rows
    src = events_pdf[events_pdf["op"] != "ddl"]
    src_before = {
        (r["url"], r["seq"]): dict(r["before"])
        for _, r in src.iterrows() if r["before"] is not None
    }
    matched = 0
    for _, r in got.iterrows():
        if r["before"] is not None:
            want = src_before[(r["url"], r["seq"])]
            assert dict(r["before"]) == want
            matched += 1
    assert matched > 0  # update/delete before-images actually flowed through


# ---------------------------------------------------------- real codecs


def _gradient_img(h, w):
    import numpy as np

    y = np.arange(h, dtype=np.uint8)[:, None]
    x = np.arange(w, dtype=np.uint8)[None, :]
    return np.stack(
        [y + 0 * x, x + 0 * y, (y + x) % 256], axis=2
    ).astype("uint8")


def test_ppm_bmp_roundtrip_and_resize():
    import numpy as np

    from openlogreplicator_spark import media_codecs as MC

    img = _gradient_img(13, 17)
    assert np.array_equal(MC.decode_ppm(MC.encode_ppm(img)), img)
    assert np.array_equal(MC.decode_bmp(MC.encode_bmp(img)), img)
    # PPM comments and multi-whitespace headers parse
    with_comment = b"P6\n# a comment\n17 13\n255\n" + img.tobytes()
    assert np.array_equal(MC.decode_ppm(with_comment), img)
    # non-matching payloads refuse cleanly
    assert MC.decode_ppm(b"JUNK") is None
    assert MC.decode_bmp(b"JUNK") is None
    assert MC.decode_wav(b"JUNK") is None
    small = MC.resize_nearest(img, 4, 4)
    assert small.shape == (4, 4, 3)
    assert np.array_equal(MC.resize_nearest(img, 13, 17), img)  # identity


def test_wav_roundtrip_and_energy_embedding():
    import numpy as np

    from openlogreplicator_spark import media_codecs as MC

    t = np.arange(8000)
    tone = (np.sin(2 * np.pi * 440 * t / 8000) * 20000).astype(np.int16)
    quiet = np.concatenate([tone[:4000], np.zeros(4000, dtype=np.int16)])
    decoded = MC.decode_wav(MC.encode_wav(quiet, 8000))
    assert decoded is not None
    samples, rate = decoded
    assert rate == 8000 and samples.shape == (8000, 1)
    emb = MC.audio_energy_embedding(samples, n_bins=16)
    # energy concentrated in the first half: loud bins >> silent bins
    assert emb[:8].min() > 10 * max(emb[8:].max(), 1e-9)


def test_extract_features_real_decode_via_spark(spark):
    """The mapInPandas stage must parse REAL uncompressed payloads: correct
    width/height/sample_rate, and CONTENT-real embeddings (a near-duplicate
    image lands closer than an unrelated one — the property the ANN
    operators need)."""
    import numpy as np

    from openlogreplicator_spark import media_codecs as MC
    from openlogreplicator_spark.multimodal import MEDIA_DDL

    img = _gradient_img(32, 48)
    near = img.copy(); near[0, 0] = [255, 255, 255]        # 1-pixel change
    other = 255 - img                                      # inverted
    tone = (np.sin(np.arange(4000) / 3.0) * 15000).astype(np.int16)
    rows = [
        (1, "image", bytearray(MC.encode_ppm(img)), None),
        (2, "image", bytearray(MC.encode_bmp(near)), None),
        (3, "image", bytearray(MC.encode_ppm(other)), None),
        (4, "audio", bytearray(MC.encode_wav(tone, 16000)), None),
    ]
    df = spark.createDataFrame(rows, MEDIA_DDL)
    out = {r["media_id"]: r for r in extract_media_features(df).collect()}
    assert (out[1]["width"], out[1]["height"]) == (48, 32)
    assert (out[2]["width"], out[2]["height"]) == (48, 32)
    assert out[4]["sample_rate"] == 16000 and out[4]["n_frames"] == 4000
    e1, e2, e3 = (np.array(out[i]["embedding"]) for i in (1, 2, 3))
    assert float(e1 @ e2) > 0.99        # near-dup: almost identical feature
    assert float(e1 @ e2) > float(e1 @ e3)  # ...and closer than unrelated


def test_codec_roundtrip_property():
    """Property: encode→decode is the identity for every image shape and
    sample count (padding math, header arithmetic, channel order)."""
    import numpy as np
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from openlogreplicator_spark import media_codecs as MC

    @settings(max_examples=60, deadline=None)
    @given(
        h=st.integers(1, 40), w=st.integers(1, 40),
        seed=st.integers(0, 2**31 - 1),
    )
    def img_roundtrip(h, w, seed):
        rng = np.random.default_rng(seed)
        img = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
        assert np.array_equal(MC.decode_ppm(MC.encode_ppm(img)), img)
        assert np.array_equal(MC.decode_bmp(MC.encode_bmp(img)), img)

    @settings(max_examples=40, deadline=None)
    @given(
        n=st.integers(1, 5000), ch=st.integers(1, 2),
        rate=st.sampled_from([8000, 16000, 44100]),
        seed=st.integers(0, 2**31 - 1),
    )
    def wav_roundtrip(n, ch, rate, seed):
        rng = np.random.default_rng(seed)
        samples = rng.integers(-32768, 32768, size=(n, ch)).astype(np.int16)
        decoded = MC.decode_wav(MC.encode_wav(samples, rate))
        assert decoded is not None
        got, got_rate = decoded
        assert got_rate == rate and np.array_equal(got, samples)

    img_roundtrip()
    wav_roundtrip()
