"""End-to-end slice: synthetic data -> split -> co-visitation counting ->
heuristic retrieval -> recall@20 (SURVEY.md §7 'Minimum end-to-end slice').
Asserts the pipeline actually learns sequential structure: its recall must
beat a popularity-only recommender."""
import numpy as np
import pytest

from otto_tpu.config import CoVisConfig
from otto_tpu.data.split import split_events
from otto_tpu.data.synthetic import SyntheticSpec, generate
from otto_tpu.engine.baseline import recommend
from otto_tpu.engine.covis import CoVisCounter
from otto_tpu.eval.recall import evaluate_topk


@pytest.fixture(scope="module")
def pipeline_result():
    spec = SyntheticSpec(
        n_sessions=4000, n_aids=2000, mean_len=12, span_days=21, seed=7
    )
    ev = generate(spec)
    sp = split_events(ev, test_days=7, seed=0)

    cfg = CoVisConfig()
    counter = CoVisCounter(cfg, capacity=1 << 17, pair_budget=1 << 16,
                           bucket_lens=(8, 32, 64))
    counter.update(sp.train)
    counter.update(sp.test)  # reference counts train+test (merge_train_test)
    tables = counter.retrieval_tables(n_aids=spec.n_aids)

    sessions, aids = recommend(sp.test, tables, keep_aids=16, top_k=20)
    return sp, sessions, aids


def test_slice_produces_predictions(pipeline_result):
    sp, sessions, aids = pipeline_result
    assert len(sessions) == len(np.unique(sp.test.session))
    assert aids.shape[1] == 20
    # most sessions should have some candidates
    assert (aids[:, 0] >= 0).mean() > 0.95


def test_slice_beats_popularity(pipeline_result):
    sp, sessions, aids = pipeline_result
    preds = {t: (sessions, aids) for t in ("clicks", "carts", "orders")}
    res = evaluate_topk(preds, sp.labels)

    # popularity-only baseline: global top-20 aids for everyone
    top20 = np.argsort(-np.bincount(sp.train.aid, minlength=2000))[:20]
    pop_aids = np.tile(top20.astype(np.int32), (len(sessions), 1))
    pop = {t: (sessions, pop_aids) for t in ("clicks", "carts", "orders")}
    res_pop = evaluate_topk(pop, sp.labels)

    assert res["total"] > res_pop["total"] * 1.5
    assert res["total"] > 0.05
