"""Synthesize an sf1-equivalent table set for the scale rehearsal
(VERDICT r4 #3): 10 key-shifted copies of the read-only sf0.1 tables plus
a 50k-row documents table drawn from the deterministic 600k synthetic
pages corpus.  Output under /tmp/marginalia_ray_sf1 (never the repo or
testdata).  Deterministic — same bytes every run.

Usage:  python tools/make_sf1.py [--out /tmp/marginalia_ray_sf1]
"""

import argparse
import sys
from pathlib import Path

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"
COPIES = 10

# key columns to shift per copy so copies don't collide; offsets are the
# max key in sf0.1 rounded up to a power of ten (keeps key arithmetic in
# the fixtures — id % k patterns — stable within a copy)
SHIFT = {
    "lineitem": {"l_orderkey": 10_000_000, "l_partkey": 1_000_000, "l_suppkey": 100_000},
    "orders": {"o_orderkey": 10_000_000, "o_custkey": 1_000_000},
    "customer": {"c_custkey": 1_000_000},
    "supplier": {"s_suppkey": 100_000},
    "part": {"p_partkey": 1_000_000},
    "events": {"event_id": 10_000_000, "user_id": 1_000_000},
    "embeddings": {"vec_id": 1_000_000},
}
PASSTHROUGH = ["region", "nation"]


def replicate(table_name: str, out: Path) -> int:
    t = pq.read_table(f"{SRC}/{table_name}.parquet")
    dest = out / f"{table_name}.parquet"
    writer = pq.ParquetWriter(dest, t.schema)
    for c in range(COPIES):
        cols = {}
        for f in t.schema:
            col = t[f.name]
            off = SHIFT[table_name].get(f.name)
            if off:
                cols[f.name] = pc.add(col, pa.scalar(c * off, col.type))
            else:
                cols[f.name] = col
        writer.write_table(pa.table(cols, schema=t.schema))
    writer.close()
    return t.num_rows * COPIES


def documents_from_pages(out: Path, n_docs: int = 50_000) -> int:
    from marginalia_ray.sources.pages import pages_parquet

    pages_dir = pages_parquet(600_000)
    import pyarrow.dataset as pads

    ds = pads.dataset(pages_dir, format="parquet")
    t = ds.to_table(columns=["url", "text", "lang"])
    t = t.slice(0, n_docs)
    text = t["text"]
    host = pc.replace_substring_regex(
        t["url"], pattern=r"^https?://([^/]+)/.*$", replacement=r"\1"
    )
    doc = pa.table(
        {
            "doc_id": pa.array(np.arange(t.num_rows, dtype=np.int64)),
            "text": text.cast(pa.string()),
            "lang": t["lang"].cast(pa.string()),
            "source": host.cast(pa.string()),
            "n_chars": pc.cast(pc.utf8_length(text), pa.int64()),
        }
    )
    pq.write_table(doc, out / "documents.parquet")
    return doc.num_rows


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/tmp/marginalia_ray_sf1")
    ap.add_argument("--docs", type=int, default=50_000)
    args = ap.parse_args()
    out = Path(args.out)
    if (out / "_SUCCESS").exists():
        print(f"exists: {out}")
        return 0
    out.mkdir(parents=True, exist_ok=True)
    for t in PASSTHROUGH:
        pq.write_table(pq.read_table(f"{SRC}/{t}.parquet"), out / f"{t}.parquet")
        print(f"{t}: passthrough")
    for t in SHIFT:
        n = replicate(t, out)
        print(f"{t}: {n} rows")
    n = documents_from_pages(out, args.docs)
    print(f"documents: {n} rows")
    (out / "_SUCCESS").touch()
    return 0


if __name__ == "__main__":
    sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
    sys.exit(main())
