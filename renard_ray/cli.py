"""CLI entrypoint — the ``ray job submit`` surface.

Usage (on a cluster, or locally)::

    ray job submit --working-dir . -- \
        python -m renard_ray.cli run --pages /data/pages \
            --out /data/graph --preset full --ckpt /data/ckpt

    python -m renard_ray.cli synth --out /tmp/pages --n-pages 20000

A killed ``run`` resumes from the per-shard checkpoints (``--ckpt``).
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def _init_ray(num_cpus: int | None) -> None:
    import ray

    if not ray.is_initialized():
        kwargs: dict = {"include_dashboard": False, "logging_level": "ERROR"}
        if num_cpus is not None:
            kwargs["address"] = "local"
            kwargs["num_cpus"] = num_cpus
        ray.init(**kwargs)
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False


def cmd_run(args: argparse.Namespace) -> int:
    _init_ray(args.num_cpus)
    import ray

    from renard_ray.pipelines.kg import build_kg, read_pages, write_graph
    from renard_ray.pipelines.preconfigured import PRESETS

    cfg = PRESETS[args.preset]()
    t0 = time.time()
    if args.granular and not args.ckpt:
        print(
            "error: --granular requires --ckpt (per-step checkpoints need "
            "a checkpoint dir)",
            file=sys.stderr,
        )
        return 2
    if args.ckpt and args.granular:
        from renard_ray.pipelines.checkpoint import run_kg_checkpointed_granular

        triples, report = run_kg_checkpointed_granular(
            args.pages, args.ckpt, cfg, n_shards=args.shards
        )
    elif args.ckpt:
        from renard_ray.pipelines.checkpoint import run_kg_checkpointed

        triples, report = run_kg_checkpointed(
            args.pages, args.ckpt, cfg, n_shards=args.shards
        )
    else:
        triples, report = build_kg(read_pages(args.pages), cfg), {}
    write_graph(triples, args.out, num_buckets=args.buckets)
    import glob

    import pyarrow.parquet as pq

    n = sum(
        pq.read_metadata(f).num_rows
        for f in glob.glob(f"{args.out}/**/*.parquet", recursive=True)
    )
    print(
        json.dumps(
            {
                "pages": args.pages,
                "out": args.out,
                "preset": args.preset,
                "triples": n,
                "wall_sec": round(time.time() - t0, 2),
                **report,
            }
        )
    )
    ray.shutdown()
    return 0


def cmd_synth(args: argparse.Namespace) -> int:
    from renard_ray.sources.pages import write_pages_parquet

    write_pages_parquet(args.out, args.n_pages, seed=args.seed,
                        rows_per_file=args.rows_per_file)
    print(json.dumps({"out": args.out, "n_pages": args.n_pages}))
    return 0


def cmd_export(args: argparse.Namespace) -> int:
    import glob

    import pandas as pd
    import pyarrow.parquet as pq

    if args.format == "nt":
        # distributed RDF interchange sink (shards under --out DIR):
        # reads the graph as a Dataset — nothing edge-sized on the
        # driver — and pre-aggregates inside the sink
        import sys

        import ray

        from renard_ray.sinks.ntriples import write_ntriples

        if args.dynamic:
            raise SystemExit(
                "--dynamic has no N-Triples representation (block "
                "structure stays in the parquet graph / dynamic GEXF)"
            )
        if not ray.is_initialized():
            ray.init(address="local", include_dashboard=False)
        ds = ray.data.read_parquet(f"{args.graph}/")
        extra = set(ds.schema().names) - {"subj", "pred", "obj", "weight"}
        if extra:
            print(
                "export nt: dropping non-RDF columns %s (they stay in "
                "the parquet graph)" % sorted(extra),
                file=sys.stderr,
            )
        manifest = write_ntriples(ds, args.out)
        print(
            json.dumps(
                {
                    "graph": args.graph,
                    "out": args.out,
                    "shards": len(manifest),
                    "lines": sum(r["n_lines"] for r in manifest),
                }
            )
        )
        return 0

    frames = [
        pq.read_table(f).to_pandas()
        for f in glob.glob(f"{args.graph}/**/*.parquet", recursive=True)
    ]
    triples = pd.concat(frames, ignore_index=True)
    from renard_ray.sinks.gexf import write_dynamic_gexf, write_gexf

    if args.dynamic:
        write_dynamic_gexf(triples, args.out)
    else:
        write_gexf(triples, args.out)
    print(json.dumps({"graph": args.graph, "out": args.out, "edges": len(triples)}))
    return 0


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="renard_ray")
    sub = ap.add_subparsers(dest="cmd", required=True)

    p = sub.add_parser("run", help="run the KG pipeline over a pages table")
    p.add_argument("--pages", required=True)
    p.add_argument("--out", required=True)
    p.add_argument("--preset", default="full", choices=["co_occurrence", "conversational", "relational", "full"])
    p.add_argument("--ckpt", default=None, help="checkpoint dir (enables resume)")
    p.add_argument(
        "--granular", action="store_true",
        help="per-STEP checkpoints through the granular stage chain "
        "(resume from any stage boundary, reference rerun_from analog)",
    )
    p.add_argument("--shards", type=int, default=16)
    p.add_argument("--buckets", type=int, default=64)
    p.add_argument("--num-cpus", type=int, default=None)
    p.set_defaults(fn=cmd_run)

    p = sub.add_parser("synth", help="synthesize a deterministic pages corpus")
    p.add_argument("--out", required=True)
    p.add_argument("--n-pages", type=int, default=1000)
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--rows-per-file", type=int, default=2000)
    p.set_defaults(fn=cmd_synth)

    p = sub.add_parser(
        "export", help="export an aggregated graph to GEXF or N-Triples"
    )
    p.add_argument(
        "--format", default="gexf", choices=["gexf", "nt"],
        help="gexf (single file) or nt (N-Triples shard dir)",
    )
    p.add_argument("--graph", required=True)
    p.add_argument("--out", required=True)
    p.add_argument("--dynamic", action="store_true")
    p.set_defaults(fn=cmd_export)

    args = ap.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
