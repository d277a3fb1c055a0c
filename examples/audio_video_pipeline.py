"""Example: the audio/video ingestion path end to end — WAV files on
disk -> binaryFile source -> header metadata -> PCM features -> frame
energies; plus a concatenated-PPM "video" walked into sampled frames.
All pure-stdlib codecs (RIFF/PCM, P6).

Run: python examples/audio_video_pipeline.py
"""

import os
import sys
import tempfile

sys.path.insert(0, ".")

import numpy as np
from pyspark.sql import functions as F

from dataset_grouper_spark.operators import audio, multimodal
from dataset_grouper_spark.session import get_spark
from dataset_grouper_spark.sources import read_binary_files


def main() -> None:
    spark = get_spark("example-audio-video")
    wav_dir = tempfile.mkdtemp(prefix="av_wavs_")

    rng = np.random.RandomState(0)
    for i in range(12):
        n = 800 + 100 * (i % 4)
        tone = (
            2000 * np.sin(2 * np.pi * (110 * (i + 1)) * np.arange(n) / 8000)
        ).astype(np.int64) + rng.randint(-50, 50, size=n)
        with open(os.path.join(wav_dir, f"a{i:02d}.wav"), "wb") as f:
            f.write(audio.encode_wav_pcm16(tone, 8000))

    files = read_binary_files(spark, os.path.join(wav_dir, "*.wav")).withColumn(
        "file_id", F.crc32(F.col("path")).cast("long")
    )
    feats = audio.audio_features(files, "content", "file_id")
    print("--- per-file audio features (peak / energy / crossings) ---")
    feats.select(
        "id", "sample_rate", "n_frames", "duration_ms", "peak",
        "zero_crossings",
    ).show(12, truncate=False)

    frames = audio.frame_energy(files, "content", "file_id", frame_len=160)
    print("--- loudest 10-of-%d analysis frames (20ms) ---" % frames.count())
    frames.orderBy(F.col("energy").desc()).show(10, truncate=False)

    # a 6-frame "video" per clip: gradient rasters, every 2nd sampled
    def gen(it):
        import pandas as pd

        for pdf in it:
            ids = pdf["file_id"].astype("int64")
            outs = []
            for d in ids:
                d = int(d)
                y, x, c = np.ogrid[0:6, 0:8, 0:3]
                outs.append(
                    b"".join(
                        multimodal.encode_ppm_pixels(
                            ((x * 3 + y * 5 + f * 29 + c * 11 + d) % 256).astype(
                                np.uint8
                            )
                        )
                        for f in range(6)
                    )
                )
            yield pd.DataFrame({"file_id": ids, "content": outs})

    vids = files.select("file_id").mapInPandas(
        gen, "file_id long, content binary"
    )
    sampled = multimodal.sample_video_frames(vids, "content", "file_id", 2)
    print("--- sampled video frames (every 2nd of 6) ---")
    sampled.groupBy("id").agg(
        F.count(F.lit(1)).alias("n_sampled"),
        F.sum("pixel_sum").alias("pixels"),
    ).show(12, truncate=False)

    spark.stop()


if __name__ == "__main__":
    main()
