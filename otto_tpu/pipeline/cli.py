"""Command-line interface.

The reference's surface is 15 numbered `python -m model.*` scripts
(reference: README.md:282-368); here a single `otto-tpu` entrypoint exposes
the same stages plus an end-to-end runner. Stage artifacts and resume
semantics live in otto_tpu.pipeline.runner.
"""
from __future__ import annotations

import argparse
import json
import logging
import sys

import numpy as np

from otto_tpu.config import DEFAULT, Config, setup_logging
from otto_tpu.data.schema import Events, Labels
from otto_tpu.data.split import split_events
from otto_tpu.data.synthetic import SyntheticSpec, generate
from otto_tpu.pipeline.runner import Pipeline, run_synthetic

log = logging.getLogger(__name__)


def _add_common(p: argparse.ArgumentParser) -> None:
    p.add_argument("--work-dir", default="artifacts", help="artifact directory")
    p.add_argument("--no-cache", action="store_true", help="recompute all stages")
    p.add_argument(
        "--mesh", default=None, metavar="data=N,model=M",
        help="device mesh: run every stage sharded over an NxM (data, "
             "model) mesh (e.g. data=8 or data=4,model=2; data=-1 means "
             "'all remaining devices'). Initializes jax.distributed when "
             "JAX_COORDINATOR_ADDRESS etc. are set (multi-host).",
    )


def parse_mesh_spec(spec: "str | None") -> "dict | None":
    """'data=N,model=M' -> {'data_parallel': N, 'model_parallel': M}.
    Either axis may be omitted (model defaults to 1, data to -1 = rest)."""
    if not spec:
        return None
    out = {"data_parallel": -1, "model_parallel": 1}
    for part in spec.split(","):
        part = part.strip()
        if not part:
            continue
        if "=" not in part:
            raise ValueError(f"bad --mesh component {part!r}; want axis=N")
        k, v = part.split("=", 1)
        k = k.strip()
        if k not in ("data", "model"):
            raise ValueError(f"unknown mesh axis {k!r} (want data/model)")
        out[f"{k}_parallel"] = int(v)
    return out


def build_mesh(args):
    """--mesh -> MeshContext (None when unset or trivially 1x1): bootstrap
    jax.distributed (multi-host env) then lay the (data, model) mesh over
    all global devices — the operator surface the reference exposes via
    set_up_dask_client (reference: dask_utils.py:9-32)."""
    kw = parse_mesh_spec(getattr(args, "mesh", None))
    if kw is None:
        return None
    from otto_tpu.parallel.distributed import init_distributed
    from otto_tpu.parallel.mesh import make_mesh

    init_distributed()
    import jax

    devices = jax.devices()
    d, m = kw["data_parallel"], kw["model_parallel"]
    if d != -1 and d * m > len(devices):
        raise SystemExit(
            f"--mesh wants {d}x{m} devices but only {len(devices)} are "
            "visible. For a virtual CPU mesh set JAX_PLATFORMS=cpu and "
            "XLA_FLAGS=--xla_force_host_platform_device_count=N."
        )
    if d != -1 and d * m < len(devices):
        devices = devices[: d * m]  # an explicit sub-mesh is allowed
    ctx = make_mesh(devices, **kw)
    if ctx.n_devices == 1:
        log.info("--mesh resolved to a single device; running unsharded")
        return None
    log.info(
        "mesh: %d devices (data=%d, model=%d)",
        ctx.n_devices, ctx.n_data, ctx.n_model,
    )
    return ctx


def cmd_synth(args) -> int:
    """Generate a synthetic OTTO-like dataset to parquet."""
    spec = SyntheticSpec(
        n_sessions=args.sessions, n_aids=args.aids, seed=args.seed
    )
    ev = generate(spec)
    ev.to_parquet(args.out)
    log.info("wrote %d events to %s", len(ev), args.out)
    return 0


def cmd_ingest(args) -> int:
    """OTTO-format JSONL -> columnar parquet (C6; native C++ fast path)."""
    from otto_tpu.data.jsonl import load_labels_jsonl, load_sessions_jsonl

    ev = load_sessions_jsonl(args.sessions_jsonl)
    ev.to_parquet(args.out_prefix + "-events.parquet")
    log.info("ingested %d events from %s", len(ev), args.sessions_jsonl)
    if args.labels_jsonl:
        lab = load_labels_jsonl(args.labels_jsonl)
        lab.to_parquet(args.out_prefix + "-labels.parquet")
        log.info("ingested %d labels from %s", len(lab), args.labels_jsonl)
    return 0


def cmd_split(args) -> int:
    """Carve the last-N-days local test split with labels (C5)."""
    ev = Events.from_parquet(args.events)
    sp = split_events(ev, test_days=args.days, seed=args.seed)
    sp.train.to_parquet(args.out_prefix + "-train.parquet")
    sp.test.to_parquet(args.out_prefix + "-test.parquet")
    sp.labels.to_parquet(args.out_prefix + "-labels.parquet")
    log.info(
        "split: train=%d test=%d labels=%d",
        len(sp.train), len(sp.test), len(sp.labels),
    )
    return 0


def cmd_run(args) -> int:
    """Full pipeline on parquet inputs (count -> embed -> retrieve -> rank
    -> submit -> eval)."""
    train = Events.from_parquet(args.train)
    test = Events.from_parquet(args.test)
    labels = Labels.from_parquet(args.labels) if args.labels else None
    n_aids = int(max(train.aid.max(), test.aid.max())) + 1
    pipe = Pipeline(
        cfg=DEFAULT, work_dir=args.work_dir, n_aids=n_aids,
        use_cache=not args.no_cache, mesh=build_mesh(args),
    )
    streaming = args.streaming or (
        not args.no_streaming and len(np.unique(test.session)) > 50_000
    )
    runner = pipe.run_streaming if streaming else pipe.run
    metrics = runner(train, test, labels, batch_sessions=args.batch_sessions)
    print(json.dumps(metrics, indent=2))
    return 0


def cmd_rank(args) -> int:
    """Inference-only: score an unlabeled test set with previously trained
    rankers and write submission.csv (reference: model/rank.py + submit.py).
    Requires a prior labeled run in the same work dir (ranker artifacts)."""
    import os

    from otto_tpu.config import config_from_json

    train = Events.from_parquet(args.train)
    test = Events.from_parquet(args.test)
    n_aids = int(max(train.aid.max(), test.aid.max())) + 1
    # reload the configuration the work dir's artifacts were built with
    cpath = os.path.join(args.work_dir, "config.json")
    cfg = config_from_json(cpath) if os.path.exists(cpath) else DEFAULT
    pipe = Pipeline(
        cfg=cfg, work_dir=args.work_dir, n_aids=n_aids,
        use_cache=not args.no_cache, mesh=build_mesh(args),
    )
    streaming = args.streaming or (
        not args.no_streaming and len(np.unique(test.session)) > 50_000
    )
    runner = pipe.run_streaming if streaming else pipe.run
    runner(train, test, None, batch_sessions=args.batch_sessions)
    log.info("wrote %s", pipe._p("submission.csv"))
    return 0


def _tiny_config() -> Config:
    """Small-model config for CPU demos / smoke runs."""
    import dataclasses

    from otto_tpu.config import (
        CoVisConfig, GBDTConfig, KMeansConfig, RankerConfig, RetrievalConfig,
        Word2VecConfig,
    )

    return Config(
        covis=dataclasses.replace(CoVisConfig(), accumulator_capacity=1 << 17),
        retrieval=RetrievalConfig(
            max_session_aids=16, max_candidates=128,
            session_len_buckets=(8, 32),
        ),
        w2vec=dict(
            wall=Word2VecConfig(name="wall", types=(0, 1, 2), vector_size=16,
                                window=4, min_count=2, epochs=2,
                                batch_size=4096, knn_k=10,
                                knn_first_n_aids=5000),
            w12=Word2VecConfig(name="w12", types=(1, 2), vector_size=16,
                               window=4, min_count=2, epochs=1,
                               batch_size=4096, knn_k=10,
                               knn_first_n_aids=5000),
        ),
        kmeans=dataclasses.replace(KMeansConfig(), max_iter=10),
        ranker=RankerConfig(hidden_dims=(32, 16), epochs=3,
                            batch_sessions=64, max_group=64,
                            learning_rate=3e-3),
        gbdt=GBDTConfig(n_trees=20, max_depth=3, n_bins=16, colsample=0.5,
                        subsample=0.8, min_child_samples=5, max_group=64,
                        row_chunk=4096, group_chunk=256),
    )


def cmd_run_synthetic(args) -> int:
    """Full pipeline on generated data (demo / smoke)."""
    spec = SyntheticSpec(
        n_sessions=args.sessions, n_aids=args.aids, seed=args.seed
    )
    cfg = _tiny_config() if args.tiny else DEFAULT
    streaming = True if args.streaming else (None if not args.no_streaming else False)
    metrics = run_synthetic(
        cfg, args.work_dir, spec, batch_sessions=args.batch_sessions,
        streaming=streaming, mesh=build_mesh(args),
    )
    print(json.dumps(metrics, indent=2))
    return 0


def main(argv=None) -> int:
    from otto_tpu.config import enable_persistent_compilation_cache

    enable_persistent_compilation_cache()
    parser = argparse.ArgumentParser(prog="otto-tpu")
    sub = parser.add_subparsers(dest="cmd", required=True)

    p = sub.add_parser("synth", help=cmd_synth.__doc__)
    p.add_argument("--sessions", type=int, default=100_000)
    p.add_argument("--aids", type=int, default=50_000)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--out", required=True)
    p.set_defaults(fn=cmd_synth)

    p = sub.add_parser("ingest", help=cmd_ingest.__doc__)
    p.add_argument("--sessions-jsonl", required=True)
    p.add_argument("--labels-jsonl")
    p.add_argument("--out-prefix", required=True)
    p.set_defaults(fn=cmd_ingest)

    p = sub.add_parser("split", help=cmd_split.__doc__)
    p.add_argument("--events", required=True)
    p.add_argument("--days", type=int, default=7)
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--out-prefix", required=True)
    p.set_defaults(fn=cmd_split)

    p = sub.add_parser("run", help=cmd_run.__doc__)
    p.add_argument("--train", required=True)
    p.add_argument("--test", required=True)
    p.add_argument("--labels")
    p.add_argument("--batch-sessions", type=int, default=256)
    p.add_argument("--streaming", action="store_true",
                   help="two-pass streaming runner (O(one batch) device "
                        "feature memory; auto past 50k test sessions)")
    p.add_argument("--no-streaming", action="store_true",
                   help="force the batch runner")
    _add_common(p)
    p.set_defaults(fn=cmd_run)

    p = sub.add_parser("rank", help=cmd_rank.__doc__)
    p.add_argument("--train", required=True)
    p.add_argument("--test", required=True)
    p.add_argument("--batch-sessions", type=int, default=256)
    p.add_argument("--streaming", action="store_true")
    p.add_argument("--no-streaming", action="store_true")
    _add_common(p)
    p.set_defaults(fn=cmd_rank)

    p = sub.add_parser("run-synthetic", help=cmd_run_synthetic.__doc__)
    p.add_argument("--sessions", type=int, default=20_000)
    p.add_argument("--aids", type=int, default=5_000)
    p.add_argument("--seed", type=int, default=7)
    p.add_argument("--batch-sessions", type=int, default=256)
    p.add_argument("--tiny", action="store_true",
                   help="small-model config (fast CPU demo)")
    p.add_argument("--streaming", action="store_true",
                   help="two-pass streaming runner (O(one batch) device "
                        "feature memory; auto past 50k test sessions)")
    p.add_argument("--no-streaming", action="store_true",
                   help="force the batch runner")
    _add_common(p)
    p.set_defaults(fn=cmd_run_synthetic)

    args = parser.parse_args(argv)
    setup_logging(getattr(args, "work_dir", None))
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
