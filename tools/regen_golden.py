"""Regenerate the marginalia_search golden rank-parity tables.

Run after any change to the converter, tokenizer, tagger or scoring path:

    cd /root/repo && python tools/regen_golden.py

Runs the flagship query twice per scale and refuses to write if the two
runs differ (the pipeline must stay deterministic for the golden to be a
valid oracle).  Output: marginalia_ray/golden/marginalia_search.json,
keyed by sum(length(text)) of the corpus (both sf dirs hold 500 docs, so
row count cannot discriminate).
"""

import json
import sys
from pathlib import Path

import duckdb
import ray

REPO = Path(__file__).resolve().parent.parent
SF_DIRS = ("/root/testdata/sf0.001", "/root/testdata/sf0.01")


def main() -> None:
    sys.path.insert(0, str(REPO))
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=16, include_dashboard=False)
    import __ray_entry__ as entry_mod

    q = entry_mod.queries()["marginalia_search"]
    out = {
        "_note": (
            "Golden rank-parity tables for the marginalia_search flagship "
            "query, keyed by sum(length(text)) of the documents table "
            "(sf0.001 and sf0.01 both have 500 docs). Regenerate with "
            "tools/regen_golden.py after any converter/scoring change."
        )
    }
    for sf in SF_DIRS:
        a, b = q(sf), q(sf)
        if not a.equals(b):
            raise SystemExit(f"{sf}: two runs differ — pipeline is not deterministic")
        key = duckdb.sql(
            f"SELECT sum(length(text)) FROM read_parquet('{sf}/documents.parquet')"
        ).fetchone()[0]
        out[str(int(key))] = a.to_dict(orient="records")
        print(f"{sf}: {len(a)} rows, corpus key {key}")
    path = REPO / "marginalia_ray" / "golden" / "marginalia_search.json"
    path.write_text(json.dumps(out, indent=1))
    print(f"wrote {path}")
    ray.shutdown()


if __name__ == "__main__":
    main()
