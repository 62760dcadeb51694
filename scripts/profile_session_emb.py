"""Phase-level session-embedding (C10) profiling at reference scale.

VERDICT r4 weak 2: session_emb regressed to 902.9 s at 12.9M sessions
(vs 821.2 r3, ~720 reference CPU) *after* the pull double-buffering, and
no artifact explains where the time goes. This splits the stage into its
real phases against the cached full-scale artifacts:

  pack     host pack_sessions(full) -> bucketed padded [S, L] grids
  upload   jnp.asarray of the microbatch aid/ts/type columns
  compute  the jitted weighted-mean program (device, honest sync)
  pull     fast_pull of the [S, D] embedding batches
  tail     concatenate + session argsort

Usage (chip must be idle):
  python scripts/profile_session_emb.py            # full 12.9M from cache
  N_SESSIONS=1000000 python scripts/profile_session_emb.py  # subset
Requires /tmp/fullscale/{events.npz,w2v-w2v-all.npz} (the flagship run's
cache).
"""
import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_comp_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

WORK = os.environ.get("OTTO_FS_WORKDIR", "/tmp/fullscale")


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir",
                      os.environ["JAX_COMPILATION_CACHE_DIR"])
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from otto_tpu.config import DEFAULT, Word2VecConfig
    from otto_tpu.data.batching import iter_microbatches, pack_sessions
    from otto_tpu.data.schema import Events
    from otto_tpu.engine.session_embed import session_embedding_batch
    from otto_tpu.models.word2vec import Word2Vec
    from otto_tpu.utils.transfer import fast_pull

    t0 = time.time()
    z = np.load(os.path.join(WORK, "events.npz"))
    ev = Events(z["session"], z["aid"], z["ts"], z["type"])
    n_sub = int(os.environ.get("N_SESSIONS", 0))
    if n_sub:
        keep = ev.session < np.partition(np.unique(ev.session), n_sub)[n_sub]
        ev = ev.select(keep)
    name = list(DEFAULT.w2vec)[0]
    model = Word2Vec.load(os.path.join(WORK, f"w2v-{name}.npz"),
                          DEFAULT.w2vec[name])
    n_aids = json.load(open(os.path.join(WORK, "meta.json")))["n_aids"]
    table_np = model.embedding_by_aid(n_aids)
    print(f"# load {time.time()-t0:.1f}s: {len(ev)} events, "
          f"table {table_np.shape}", flush=True)

    ph = {"pack": 0.0, "upload": 0.0, "compute": 0.0, "pull": 0.0,
          "tail": 0.0}
    t = time.time()
    packs = pack_sessions(ev)
    ph["pack"] = time.time() - t
    print(f"# pack {ph['pack']:.1f}s: buckets "
          f"{[ (p.aid.shape) for p in packs ]}", flush=True)

    table = jnp.asarray(table_np)
    lane_budget = 1 << 19
    sids, embs = [], []
    n_mb = 0
    for p in packs:
        L = p.aid.shape[1]
        rows = max(8, 1 << (max(1, lane_budget // L).bit_length() - 1))
        for mb in iter_microbatches(p, min(rows, 1 << 20)):
            t = time.time()
            a = jnp.asarray(mb.aid)
            ts_ = jnp.asarray(mb.ts)
            ty = jnp.asarray(mb.type)
            ph["upload"] += time.time() - t
            t = time.time()
            e = session_embedding_batch(a, ts_, ty, table)
            # honest device sync via a dependent scalar
            float(jnp.sum(e[0, :1]))
            ph["compute"] += time.time() - t
            t = time.time()
            keep = mb.session >= 0
            sids.append(mb.session[keep])
            embs.append(fast_pull(e)[keep])
            ph["pull"] += time.time() - t
            n_mb += 1
    t = time.time()
    session = np.concatenate(sids)
    emb = np.concatenate(embs)
    order = np.argsort(session)
    session, emb = session[order], emb[order]
    ph["tail"] = time.time() - t

    total = sum(ph.values())
    print(json.dumps({
        "n_sessions": int(len(session)), "n_microbatches": n_mb,
        "phases_s": {k: round(v, 1) for k, v in ph.items()},
        "total_s": round(total, 1),
        "note": ("serial-phase sum; the production double-buffer overlaps "
                 "pull with the next batch's upload+compute, so its "
                 "wall-clock ~= max chain, not this sum"),
    }, indent=2), flush=True)


if __name__ == "__main__":
    main()
