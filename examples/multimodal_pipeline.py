"""Example: the multimodal ingestion path end to end — image files on
disk -> binaryFile source -> header metadata -> pixel resize ->
thumbnail embeddings -> cosine top-k, all codec-free on uncompressed
formats (24-bpp BMP / P6 PPM).

Run: python examples/multimodal_pipeline.py
"""

import sys
import tempfile

sys.path.insert(0, ".")

import numpy as np
from pyspark.sql import functions as F

from dataset_grouper_spark.operators import multimodal, similarity
from dataset_grouper_spark.session import get_spark
from dataset_grouper_spark.sources import read_binary_files


def main() -> None:
    spark = get_spark("example-multimodal")
    out = tempfile.mkdtemp(prefix="mm_imgs_")

    rng = np.random.RandomState(0)
    arrays = [
        rng.randint(0, 256, size=(16 + i % 7, 12 + i % 5, 3), dtype=np.uint8)
        for i in range(23)
    ]
    # plant a near-duplicate of image 0: same pixels, one value nudged
    dup = arrays[0].copy()
    dup[0, 0, 0] = (int(dup[0, 0, 0]) + 1) % 256
    arrays.append(dup)
    for i, arr in enumerate(arrays):
        enc = (
            multimodal.encode_bmp_pixels(arr)
            if i % 2 == 0
            else multimodal.encode_ppm_pixels(arr)
        )
        with open(f"{out}/img_{i:03d}.{'bmp' if i % 2 == 0 else 'ppm'}", "wb") as f:
            f.write(enc)

    files = read_binary_files(spark, f"{out}/*")
    imgs = files.select(
        F.regexp_extract("path", r"img_(\d+)\.", 1).cast("long").alias("img_id"),
        "content",
    )

    meta = multimodal.decode_image_meta(imgs, "content", "img_id")
    print("-- header metadata (no codec library):")
    meta.orderBy("id").show(5)

    thumbs = multimodal.resize_images(imgs, "content", "img_id", 8, 8)
    print("-- resized to 8x8, deterministic checksums:")
    thumbs.select("id", "width", "height", "pixel_sum").orderBy("id").show(5)

    emb = multimodal.image_embeddings(imgs, "content", "img_id", dim=16)
    queries = emb.filter(F.col("id") < 2)
    top = similarity.cosine_topk(emb, queries, "embedding", "id", "id", k=3)
    print("-- nearest neighbors by thumbnail feature (23 is the planted dup of 0):")
    top.orderBy("query_id", "rank").show(10)


if __name__ == "__main__":
    main()
