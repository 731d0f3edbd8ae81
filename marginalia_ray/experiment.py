"""Ad-hoc corpus-pass runner — the reference's Experiment tool
(/root/reference/code/tools/experiment-runner/src/main/java/nu/marginalia/tools/Experiment.java:
process(domain) per record + onFinish summary) re-expressed Ray-Data-first:
the experiment is a plain callable over Arrow batches, the runner handles
reading, streaming execution, metric merging and optional row output.

An experiment callable takes one pyarrow Table batch and returns either
  * a Mapping[str, int|float] of partial metrics — summed across batches
    into the final summary (the process/onFinish counter pattern), or
  * a pyarrow Table of result rows — streamed to `out_path` as parquet
    (never collected on the driver).

Usage (library):
    from marginalia_ray.experiment import run_experiment
    summary = run_experiment(pages_dir, my_fn, columns=["url", "text"])

Usage (CLI):
    python -m marginalia_ray.experiment --pages DIR --fn pkg.mod:fn \\
        [--columns url,text] [--out /tmp/results] [--num-cpus N]
"""

from __future__ import annotations

from collections.abc import Mapping
from typing import Any, Callable

import pyarrow as pa


def run_experiment(
    pages,
    fn: Callable[[pa.Table], Any],
    columns: list[str] | None = None,
    out_path: str | None = None,
    batch_size: int | None = None,
) -> dict:
    """Run `fn` over every batch of the corpus.  `pages` is a parquet
    path or an existing ray.data.Dataset.  Returns a summary dict with
    the merged metrics (metric-mode) or the written row count (row-mode).
    """
    import ray.data

    ds = pages if isinstance(pages, ray.data.Dataset) else ray.data.read_parquet(
        str(pages), columns=columns
    )

    kwargs: dict = {}
    if batch_size is not None:
        kwargs["batch_size"] = batch_size

    def _wrap(batch: pa.Table) -> pa.Table:
        res = fn(batch)
        if isinstance(res, Mapping):
            # one partial-metrics row per batch; merged below by sum
            return pa.table(
                {
                    "_metric": pa.array([str(k) for k in res], pa.string()),
                    "_value": pa.array([float(res[k]) for k in res], pa.float64()),
                }
            )
        if isinstance(res, pa.Table):
            return res
        raise TypeError(
            "experiment fn must return a Mapping of metrics or a pyarrow Table, "
            f"got {type(res).__name__}"
        )

    out = ds.map_batches(_wrap, batch_format="pyarrow", **kwargs)

    schema = out.schema()
    if schema.names == ["_metric", "_value"]:
        merged = out.groupby("_metric").sum("_value")
        metrics = {
            r["_metric"]: r["sum(_value)"]
            for r in merged.take_all()  # bounded: one row per metric name
        }
        return {"mode": "metrics", "metrics": metrics}
    if out_path is None:
        raise ValueError("experiment fn returns rows: pass out_path for the sink")
    out.write_parquet(out_path)
    return {"mode": "rows", "out_path": out_path}


def _resolve(spec: str) -> Callable:
    mod_name, _, attr = spec.partition(":")
    if not attr:
        raise SystemExit("--fn must be 'package.module:callable'")
    import importlib

    return getattr(importlib.import_module(mod_name), attr)


def main(argv: list[str] | None = None) -> None:
    import argparse
    import json

    import ray

    ap = argparse.ArgumentParser(description="ad-hoc corpus experiment runner")
    ap.add_argument("--pages", required=True)
    ap.add_argument("--fn", required=True, help="package.module:callable")
    ap.add_argument("--columns", default=None)
    ap.add_argument("--out", default=None)
    ap.add_argument("--num-cpus", type=int, default=None)
    args = ap.parse_args(argv)

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=args.num_cpus,
            include_dashboard=False,
            logging_level="ERROR",
        )
    try:
        cols = args.columns.split(",") if args.columns else None
        summary = run_experiment(args.pages, _resolve(args.fn), columns=cols,
                                 out_path=args.out)
        print(json.dumps(summary))
    finally:
        ray.shutdown()


if __name__ == "__main__":
    main()
