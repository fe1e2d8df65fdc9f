"""Multimodal training-data pipeline — real codecs end to end.

Every byte below is really encoded and really decoded (pure
struct/zlib/NumPy — extensions/multimodal.py): PNG in any legal
variant, BMP including RLE and bitfields, sequential/progressive JPEG,
Motion-JPEG AVI video, PCM WAV audio. The pipeline is the map-only
shape that scales: binary stays on executors, the only shuffle is the
perceptual-hash groupBy.

Run: python examples/multimodal_pipeline.py
"""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

from nshm2022db_spark.extensions.multimodal import (
    dedup_image_ahash,
    multimodal_audio_resample,
    multimodal_decode_variants,
    multimodal_video_frames,
)
from nshm2022db_spark.session import get_spark

SF = "/root/testdata/sf0.001"


def main() -> None:
    spark = get_spark("multimodal-example")

    print("== codec-variant decode (7 formats, one scan) ==")
    variants = multimodal_decode_variants(spark, SF)
    variants.groupBy("variant").count().orderBy("variant").show()

    print("== perceptual near-dup image dedup (aHash) ==")
    groups = dedup_image_ahash(spark, SF)
    dup_groups = groups.filter("n_images > 1")
    print(
        f"{groups.count()} hash groups, "
        f"{dup_groups.count()} with duplicates"
    )
    dup_groups.orderBy("keeper").show(5)

    print("== video: MJPEG AVI decode + frame sampling ==")
    multimodal_video_frames(spark, SF).select(
        "media_id", "n_frames", "n_sampled", "width", "duration_s"
    ).show(5)

    print("== audio: 2:1 PCM resample ==")
    multimodal_audio_resample(spark, SF).select(
        "media_id", "rate_in", "rate_out", "n_in", "n_out"
    ).show(5)

    spark.stop()


if __name__ == "__main__":
    main()
