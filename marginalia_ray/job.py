"""Index-build job entry point, usable standalone or via `ray job submit`:

    ray job submit -- python -m marginalia_ray.job \\
        --pages /data/pages --out /data/index --shards 128 \\
        --dedup --rank-domains

On a cluster, RAY_ADDRESS is set by the job runner and ray.init attaches to
it; standalone it starts a local session.  This module owns its Ray session
(guarded init, shutdown at exit) — the only places allowed to besides
bench.py and the test fixture.
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(description="marginalia_ray index build")
    p.add_argument("--pages", help="input pages parquet dir")
    p.add_argument(
        "--merge", nargs="+", metavar="BUILD_DIR",
        help="instead of building from pages: k-way-merge >=2 existing "
        "build dirs (doc-disjoint, same --shards layout) into --out",
    )
    p.add_argument("--out", required=True, help="output index root")
    p.add_argument("--build-id", default="build-0")
    p.add_argument("--shards", type=int, default=32)
    p.add_argument(
        "--buckets", default="auto",
        type=lambda v: v if v == "auto" else int(v),
        help="doc-range buckets per shard (int, or 'auto' [default] for the doc-frequency sketch)",
    )
    p.add_argument("--concurrency", type=int, default=None)
    p.add_argument("--journal-partitions", type=int, default=None)
    p.add_argument("--dedup", action="store_true", help="per-domain LSH dedup (D3)")
    p.add_argument("--rank-domains", action="store_true", help="PageRank domain ranking (G6)")
    p.add_argument("--term-freq", action="store_true", help="corpus term-frequency pass (G9)")
    p.add_argument("--no-resume", action="store_true", help="rebuild from scratch")
    p.add_argument("--num-cpus", type=int, default=None, help="local-mode CPU count")
    args = p.parse_args(argv)

    import ray

    owns_session = not ray.is_initialized()
    if owns_session:
        init_kwargs = {"include_dashboard": False, "logging_level": "ERROR"}
        if args.num_cpus:
            init_kwargs.update(address="local", num_cpus=args.num_cpus)
        ray.init(**init_kwargs)

    try:
        if args.merge:
            from marginalia_ray.index.merge import merge_builds

            manifest = merge_builds(
                args.merge, args.out, concurrency=args.concurrency
            )
            print(json.dumps({k: v for k, v in manifest.items() if k != "runs"}))
            return 0
        if not args.pages:
            p.error("either --pages or --merge is required")
        from marginalia_ray.pipelines.index_pipeline import run_index_pipeline

        manifest = run_index_pipeline(
            args.pages,
            args.out,
            build_id=args.build_id,
            n_shards=args.shards,
            n_buckets=args.buckets,
            concurrency=args.concurrency,
            dedup=args.dedup,
            rank_domains=args.rank_domains,
            with_term_freq=args.term_freq,
            journal_partitions=args.journal_partitions,
            resume=not args.no_resume,
        )
        print(json.dumps({k: v for k, v in manifest.items() if k != "runs"}))
        return 0
    finally:
        if owns_session:
            ray.shutdown()


if __name__ == "__main__":
    sys.exit(main())
