#!/usr/bin/env python
"""The reference's flagship use case — a 3-stage VLM captioning pipeline
(download -> caption on GPU -> write) — in this engine's idiom.

Reference shape: ``/root/reference/examples/simple_vlm_inference.py``
(_DownloadStage / _Phi35VisionStage / collected captions). Here each
stage is a ``Stage`` subclass compiled to Arrow-batched mapInPandas;
Spark schedules and scales the stages (no actor pools to size), and
nothing is collected to the driver — the sink is a partitioned parquet
write.

Network and GPU aren't available in this container, so the download
produces deterministic fake images and the "model" is a stub that
captions from decoded dimensions; the pipeline mechanics — per-process
model lifecycle, batching, GPU resource shape, fan-in write — are the
real thing. Swap the two marked bodies for requests + a vLLM/HF model
to run it for real.

Run:  python examples/vlm_caption_pipeline.py [sf_dir] [out_dir]
"""

from __future__ import annotations

import os
import sys
import tempfile

import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from cosmos_xenna_spark.catalog import load_table
from cosmos_xenna_spark.operators.multimodal import decode_image_stub, fake_image
from cosmos_xenna_spark.operators.pipeline import PipelineSpec, StageSpec, run_pipeline
from cosmos_xenna_spark.operators.stage import Resources, Stage
from cosmos_xenna_spark.session import get_spark


class DownloadStage(Stage):
    """Fetch image bytes for each URL (reference _DownloadStage)."""

    batch_size = 64
    resources = Resources(cpus=1.0)

    def setup(self) -> None:
        # a requests.Session in production; a seed here
        self.session = True

    def process_data(self, pdf: pd.DataFrame) -> pd.DataFrame:
        # PRODUCTION: self.session.get(url).content
        pdf = pdf.copy()
        pdf["image_bytes"] = [
            fake_image(int(i) % 16 + 4, int(i) % 8 + 4, seed=int(i)) for i in pdf["doc_id"]
        ]
        return pdf[["doc_id", "image_url", "image_bytes"]]


class CaptionStage(Stage):
    """Caption each image with a vision LLM (reference _Phi35VisionStage).

    ``setup`` runs once per executor process — the model load (60-90 s
    for a real vLLM checkpoint) is paid once, not per batch; declared
    GPU shape binds a ResourceProfile on cluster deployments.
    """

    batch_size = 16
    resources = Resources(cpus=1.0, gpus=1.0)

    def setup(self) -> None:
        # PRODUCTION: self.model = vllm.LLM(MODEL_NAME, ...)
        self.model = lambda w, h: f"a {w}x{h} test image"

    def process_data(self, pdf: pd.DataFrame) -> pd.DataFrame:
        captions = []
        for payload in pdf["image_bytes"]:
            w, h, _ = decode_image_stub(bytes(payload))
            captions.append(self.model(w, h))
        return pd.DataFrame(
            {"doc_id": pdf["doc_id"], "image_url": pdf["image_url"], "caption": captions}
        )


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    out_dir = sys.argv[2] if len(sys.argv) > 2 else os.path.join(
        tempfile.gettempdir(), "cxs_captions"
    )
    spark = get_spark(app_name="vlm_caption_example")

    # "dataset of image URLs" — derived from the documents table
    urls = load_table(spark, sf_dir, "documents").selectExpr(
        "doc_id", "concat('https://example.invalid/img/', doc_id, '.jpg') AS image_url"
    )

    spec = PipelineSpec(
        stages=[
            StageSpec(
                DownloadStage,
                "doc_id long, image_url string, image_bytes binary",
                name="download",
            ),
            StageSpec(
                CaptionStage,
                "doc_id long, image_url string, caption string",
                name="caption",
            ),
        ]
    )
    captions = run_pipeline(urls, spec)
    captions.write.mode("overwrite").parquet(out_dir)

    back = spark.read.parquet(out_dir)
    n = back.count()
    sample = back.orderBy("doc_id").limit(3).collect()
    print(f"captioned {n} images -> {out_dir}")
    for r in sample:
        print(f"  doc {r.doc_id}: {r.caption}")
    assert n == urls.count()
    spark.stop()


if __name__ == "__main__":
    main()
