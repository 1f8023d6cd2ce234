"""Regenerate EVERY pinned oracle artifact in one shot.

The suite pins seven fitted artifacts against sf0.01 testdata so the
oracle can carry them as literals while the Spark side fits live:

* ``sed_spark/suite/_trained_centroids.py`` — IVF k-means fit
  (tools/gen_trained_centroids.py)
* ``sed_spark/suite/_dsir_logratios.py`` — DSIR log-ratio fit
  (tools/gen_dsir_logratios.py)
* ``sed_spark/suite/_bpe_expected.py`` — BPE merges + per-doc counts
  from the independent pure-Python reference (tools/gen_bpe_expected.py)
* ``sed_spark/suite/_unigram_expected.py`` — unigram-LM pieces + per-doc
  counts/digests from the independent pure-Python reference
  (tools/gen_unigram_expected.py)
* ``sed_spark/suite/_trained_classifier.py`` — logistic-regression fit
  (tools/gen_trained_classifier.py)
* ``sed_spark/suite/_pq_codebooks.py`` — product-quantization codebooks
  (tools/gen_pq_codebooks.py)
* ``sed_spark/suite/_ivfpq_codebooks.py`` — residual PQ codebooks
  (tools/gen_ivfpq_codebooks.py)

If the driver regenerates ``/root/testdata/sf0.01`` the pins go stale and
the affected rows (ann_topk, text_metrics) go red BY DESIGN — run this,
eyeball the diff, and commit:

    PYTHONPATH=/root/repo python tools/regen_pins.py
"""

from __future__ import annotations

import runpy
import sys

sys.path.insert(0, "/root/repo")


def main() -> None:
    for mod in (
        "tools/gen_trained_centroids.py",
        "tools/gen_dsir_logratios.py",
        "tools/gen_bpe_expected.py",
        "tools/gen_unigram_expected.py",
        "tools/gen_trained_classifier.py",
        "tools/gen_pq_codebooks.py",
        "tools/gen_ivfpq_codebooks.py",
    ):
        print(f"== {mod}")
        runpy.run_path(f"/root/repo/{mod}", run_name="__main__")


if __name__ == "__main__":
    main()
