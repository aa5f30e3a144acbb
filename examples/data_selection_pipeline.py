#!/usr/bin/env python
"""End-to-end LLM training-data SELECTION pipeline — the r10 operator
family composed the way a production curation run chains them:

  1. quality gate   — fastText-style hashed linear classifier
                      (``quality_linear_score``): drop docs scoring
                      below threshold;
  2. domain shift   — DSIR importance weights (``dsir_weights``):
                      rank survivors by target-domain likelihood
                      ratio and keep the top fraction;
  3. LM sanity      — reference-bigram surprisal
                      (``doc_surprisal_rank``): drop the far tail
                      (the CCNet "tail" bucket);
  4. mixture plan   — temperature sampling at alpha = 1/2
                      (``source_temperature_mix``): per-source quotas
                      for the final epoch over what survived.

Every stage is exact-integer scored (oracle-checkable in the
registry); this example wires them into one lazy DataFrame chain —
Spark fuses the stage filters into the scans, so the corpus is read
once per scoring pass, not once per gate.

Run:  python examples/data_selection_pipeline.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from cosmos_xenna_spark.catalog import load_table
from cosmos_xenna_spark.operators.curation import (
    dsir_weights,
    source_temperature_mix,
)
from cosmos_xenna_spark.operators.quality import (
    doc_surprisal_rank,
    quality_linear_score,
)
from cosmos_xenna_spark.session import get_spark

TARGET_SOURCES = ("src0", "src1", "src2", "src3")


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark(app_name="data_selection_example")

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "text", "source"
    )
    n0 = docs.count()

    # 1. quality gate — threshold on the length-normalized milli score
    # (the demo model's weights are hash-derived, so the corpus-wide
    # score distribution is arbitrary; a production model thresholds
    # at its trained operating point exactly the same way)
    q = quality_linear_score(docs, "doc_id", "text")
    cut = q.approxQuantile("score_milli", [0.25], 0.0)[0]
    kept_q = docs.join(
        q.filter(F.col("score_milli") >= cut).select("doc_id"), "doc_id"
    )
    n1 = kept_q.count()

    # 2. DSIR: keep the top half by importance weight (exact integer
    # rank cutoff via percent_rank over the scored frame — the scored
    # frame is doc-count-sized, far below the corpus's token explode)
    w = dsir_weights(kept_q, F.col("source").isin(*TARGET_SOURCES), "doc_id", "text")
    med = w.approxQuantile("dsir_weight", [0.5], 0.0)[0]
    kept_w = kept_q.join(
        w.filter(F.col("dsir_weight") >= med).select("doc_id"), "doc_id"
    )
    n2 = kept_w.count()

    # 3. surprisal tail cut: drop docs whose mean surprisal exceeds
    # 15 of the 20 max milli-bit units (far from the reference LM)
    ref = docs.filter(F.col("source").isin(*TARGET_SOURCES))
    s = doc_surprisal_rank(kept_w, ref, "doc_id", "text")
    kept_s = kept_w.join(
        s.filter(F.col("mean_surprisal_milli") <= 15_000).select("doc_id"),
        "doc_id",
    )
    n3 = kept_s.count()

    # 4. per-source epoch quotas over the survivors
    plan = source_temperature_mix(kept_s, "source", "doc_id", budget=1_000)
    rows = plan.orderBy("source").collect()

    print(f"corpus: {n0} docs")
    print(f"after quality gate: {n1}")
    print(f"after DSIR top-half: {n2}")
    print(f"after surprisal tail cut: {n3}")
    print("mixture plan (source, n_docs, quota_capped):")
    for r in rows[:10]:
        print(f"  {r[plan.columns[0]]}: n={r.n_docs} quota={r.quota_capped}")
    assert n0 >= n1 >= n2 >= n3 and n3 > 0
    spark.stop()


if __name__ == "__main__":
    main()
