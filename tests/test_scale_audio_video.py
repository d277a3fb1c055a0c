"""Scale stress for the audio/video modality tier (slow-marked).

80k synthesized WAVs (16x the sf0.1 documents) through the full
decode->feature pass, and 40k concatenated-PPM videos through the
frame-sampling walk — the evidence that the Arrow-batched binary
kernels hold at replication, with output row counts known in closed
form. Timings recorded in PERF.md.
"""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from dataset_grouper_spark.operators import audio, multimodal
from dataset_grouper_spark.sources import read_table

SF = "/root/testdata/sf0.1"


def _replicate(df, times, id_col, id_stride):
    out = df
    for i in range(1, times):
        out = out.unionAll(
            df.withColumn(id_col, F.col(id_col) + F.lit(i * id_stride))
        )
    return out


def _wavs(df):
    def gen(it):
        for pdf in it:
            ids = pdf["doc_id"].astype("int64")
            outs = []
            for d in ids:
                d = int(d)
                n = 64 + d % 57
                i = np.arange(n, dtype=np.int64)
                s = ((d * 31 + i * 17) % 4001) - 2000
                outs.append(audio.encode_wav_pcm16(s, 8000))
            yield pd.DataFrame({"doc_id": ids, "content": outs})

    return df.select("doc_id").mapInPandas(gen, "doc_id long, content binary")


@pytest.mark.slow
def test_audio_features_at_16x(spark):
    docs = _replicate(
        read_table(spark, SF, "documents"), 16, "doc_id", 1_000_000
    )
    feats = audio.audio_features(_wavs(docs), "content", "doc_id")
    agg = feats.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("n_frames").alias("frames"),
        F.min("peak").alias("min_peak"),
        F.min("sum_sq").alias("min_ssq"),
    ).collect()[0]
    assert agg["n"] == 80_000
    # frame total in closed form: sum over docs of (64 + d % 57)
    expected_frames = (
        docs.select((F.lit(64) + F.col("doc_id") % 57).alias("nf"))
        .agg(F.sum("nf"))
        .collect()[0][0]
    )
    assert agg["frames"] == expected_frames
    assert agg["min_peak"] > 0 and agg["min_ssq"] > 0


@pytest.mark.slow
def test_video_frame_sample_at_8x(spark):
    docs = _replicate(
        read_table(spark, SF, "documents"), 8, "doc_id", 1_000_000
    )

    def gen(it):
        for pdf in it:
            ids = pdf["doc_id"].astype("int64")
            outs = []
            for d in ids:
                d = int(d)
                w, h = 4 + d % 5, 3 + d % 3
                y, x, c = np.ogrid[0:h, 0:w, 0:3]
                frames = []
                for f in range(2 + d % 5):
                    arr = ((x * 7 + y * 13 + d * 3 + f * 29 + c * 37) % 256).astype(
                        np.uint8
                    )
                    frames.append(multimodal.encode_ppm_pixels(arr))
                outs.append(b"".join(frames))
            yield pd.DataFrame({"doc_id": ids, "content": outs})

    vids = docs.select("doc_id").mapInPandas(
        gen, "doc_id long, content binary"
    )
    out = multimodal.sample_video_frames(vids, "content", "doc_id", every_k=2)
    # closed form: doc d contributes ceil((2 + d%5) / 2) sampled frames
    expected = (
        docs.select(
            (
                F.floor((F.lit(2) + F.col("doc_id") % 5 + 1) / 2)
            ).alias("k")
        )
        .agg(F.sum("k"))
        .collect()[0][0]
    )
    assert out.count() == expected
