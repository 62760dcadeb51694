"""Phase-level pass-A (retrieve + downsample) profiling at smoke scale,
reusing the /tmp/fs_smoke artifact cache: where do the ~0.65 s/batch go?"""
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_comp_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_comp_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from otto_tpu.config import TYPE2ID, TYPES, config_from_json, setup_logging

# the smoke work dir was written under the config of its launch time; use
# it verbatim so the stale-cache guard accepts the artifacts
DEFAULT = config_from_json("/tmp/fs_smoke/config.json")
from otto_tpu.data.split import split_events
from otto_tpu.data.synthetic import SyntheticSpec, generate_device
from otto_tpu.engine import rank as rank_engine
from otto_tpu.engine.retrieval import join_labels
from otto_tpu.eval.per_source import SrcFlagBatch
from otto_tpu.pipeline.runner import Pipeline

setup_logging(None)
N = int(os.environ.get("N_SESSIONS", 300_000))
A = int(os.environ.get("N_AIDS", 300_000))
BATCH = int(os.environ.get("BATCH", 512))
MAXB = int(os.environ.get("MAX_BATCHES", 40))

t0 = time.time()
ev = generate_device(SyntheticSpec(
    n_sessions=N, n_aids=A, mean_len=13.4, max_len=128, span_days=28, seed=7
))
sp = split_events(ev, DEFAULT.data.test_days, DEFAULT.data.seed)
print(f"gen+split {time.time()-t0:.1f}s", flush=True)

# ranker fields gained defaults since the smoke wrote its config.json; only
# retrieval-side artifacts are reused here, so refresh the stored config
if os.path.exists("/tmp/fs_smoke/config.json"):
    os.remove("/tmp/fs_smoke/config.json")
pipe = Pipeline(cfg=DEFAULT, work_dir="/tmp/fs_smoke", n_aids=A)
t = time.time()
retriever = pipe.build_retriever(sp.train, sp.test)
print(f"build_retriever (cached) {time.time()-t:.1f}s", flush=True)

ph = {k: 0.0 for k in ("iter", "flags", "join", "select", "feats")}
rngs = {t_: np.random.default_rng(42) for t_ in TYPES}
n = 0
t = time.time()
it = retriever.iter_run(sp.test, batch_sessions=BATCH)
for b in it:
    ph["iter"] += time.time() - t
    t = time.time()
    SrcFlagBatch.from_batch(b)
    ph["flags"] += time.time() - t
    t = time.time()
    tgt = join_labels([b], sp.labels)[0]
    ph["join"] += time.time() - t
    t = time.time()
    sels = {}
    for tname in TYPES:
        got = rank_engine.downsample_select(
            b, tgt, TYPE2ID[tname], DEFAULT.ranker, rngs[tname]
        )
        if got is not None:
            sels[tname] = got
    ph["select"] += time.time() - t
    t = time.time()
    if sels:
        si = np.concatenate([s[0] for s in sels.values()])
        ci = np.concatenate([s[1] for s in sels.values()])
        b.feats_rows(si, ci)
    ph["feats"] += time.time() - t
    n += 1
    if n >= MAXB:
        break
    t = time.time()

print(f"{n} batches of {BATCH}:", flush=True)
for k, v in ph.items():
    print(f"  {k:8s} {v:7.1f}s total  {v/n*1e3:7.0f} ms/batch", flush=True)
print(f"sessions/s = {n*BATCH/sum(ph.values()):.0f}", flush=True)
