"""ANN quality gate: the IVF probe path must actually find neighbors.

q33 has no SQL oracle (approximate by design; the driver records a
rows-only check), so this test pins its quality against the exact
brute-force ranking (q23) on the same embeddings: recall@k must clear a
floor at the default n_probe. Measured 0.92 mean / 0.60 min on the sf0.01
synthetic embeddings; bounds leave margin for table regeneration.
"""

from __future__ import annotations

from collections import defaultdict

from conftest import SF_DIR
from synth_transform_spark.plans import REGISTRY


def test_ivf_recall_against_brute_force(spark):
    bf = REGISTRY["q23_cosine_topk"].spark(spark, SF_DIR).toPandas()
    ivf = REGISTRY["q33_ivf_topk"].spark(spark, SF_DIR).toPandas()
    truth, got = defaultdict(set), defaultdict(set)
    for r in bf.itertuples():
        truth[r.query_id].add(r.neighbor_id)
    for r in ivf.itertuples():
        got[r.query_id].add(r.neighbor_id)
    assert truth, "brute-force baseline returned no rows"
    recalls = [len(truth[q] & got[q]) / len(truth[q]) for q in truth]
    assert sum(recalls) / len(recalls) >= 0.7
    assert min(recalls) >= 0.4
