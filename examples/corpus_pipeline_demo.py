#!/usr/bin/env python
"""Demo: the LLM-corpus curation surface end-to-end on the synthetic
documents table — run `python examples/corpus_pipeline_demo.py [sf_dir]`.

Shows the composed pre-training pipeline (q123: dedup → boilerplate gate
→ benchmark decontamination → shard assignment) plus the individual
audits a corpus engineer runs around it: boilerplate fraction (q110),
contamination hits (q111), split drift (q127), and a weighted subsample
(q115).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry
from recommandation_de_films_jay_z_entertainment_int_gration_de_big_data_et_ia_spark.session import (
    get_spark,
)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("corpus-pipeline-demo")
    queries = entry.queries()

    print(f"\n=== corpus pipeline over {sf_dir} ===")
    for name, title, n in (
        ("q110_boilerplate_ngrams", "boilerplate audit (worst 5 docs)", 5),
        ("q111_ngram_decontaminate", "benchmark contamination hits", 10),
        ("q127_split_drift_kl", "split drift (KL terms per domain)", 10),
        ("q115_weighted_sample", "weighted subsample (top 5 keys)", 5),
        ("q123_pretraining_pipeline", "composed pipeline: per-shard output", 20),
    ):
        print(f"\n--- {title} [{name}] ---")
        queries[name](spark, sf_dir).show(n, truncate=False)

    spark.stop()


if __name__ == "__main__":
    main()
