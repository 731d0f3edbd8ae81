"""Deterministic synthetic web-pages corpus (FIXTURES.md F1; BASELINE.json
input_hint shape: url, warc_ts, html, text, lang).

Every row is a pure function of (seed, row index): page k is reproducible in
isolation, so generation parallelizes as a Ray Data map over a range and the
oracle can re-derive any row.  Properties exercised:
  * ~sqrt(N) domains, Zipf-distributed pages per domain (per-domain group ops)
  * closed vocabulary with Zipfian term frequencies + an ultra-common head
    (hot-term salting) + per-document rare terms (rarest-first intersection)
  * noise branches (nav/footer/cookie-banner, link farms) that
    DomPruningFilter must strip
  * a few <meta name=robots content=noindex> rows, non-"en" lang rows, and
    near-duplicate bodies (LSH dedup)
  * `text` column = the byte-exact output of our extraction rules applied to
    `html` (generator and extractor share marginalia_ray.stages.extract)
"""

from __future__ import annotations

import random
from pathlib import Path

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from marginalia_ray.stages.extract import extract_document

SEED = 42
BASE_TS = 1_577_836_800_000_000  # 2020-01-01 in microseconds

_WORDS = None


def _vocab() -> list[str]:
    """Closed vocabulary, Zipf-ranked: index 0 is the most common."""
    global _WORDS
    if _WORDS is None:
        rng = random.Random(SEED ^ 0xBEEF)
        head = (
            "web search index page site data time year work world system file "
            "link user code text line list form part case fact hand place"
        ).split()
        syllables = ["ba", "co", "di", "fu", "ga", "hi", "jo", "ka", "lu", "me",
                     "no", "pi", "qua", "ro", "su", "ti", "vo", "wa", "xe", "zy"]
        body = []
        seen = set(head)
        while len(body) < 2000:
            w = "".join(rng.choice(syllables) for _ in range(rng.randint(2, 4)))
            if w not in seen:
                seen.add(w)
                body.append(w)
        _WORDS = head + body
    return _WORDS


def _zipf_word(rng: random.Random, vocab: list[str]) -> str:
    # inverse-CDF Zipf(s=1.1) over vocab ranks
    n = len(vocab)
    u = rng.random()
    idx = int(n ** u) - 1
    return vocab[max(0, min(n - 1, idx))]


def _sentence(rng: random.Random, vocab: list[str], n_words: int) -> str:
    words = [_zipf_word(rng, vocab) for _ in range(n_words)]
    words[0] = words[0].capitalize()
    return " ".join(words)


def make_page(idx: int, n_rows: int, seed: int = SEED) -> dict:
    """One synthetic page — pure function of (seed, idx, n_rows)."""
    rng = random.Random((seed << 32) ^ idx)
    vocab = _vocab()

    n_domains = max(4, int(n_rows**0.5))
    # Zipfian domain assignment: low domain ids get many pages
    domain_id = min(n_domains - 1, int(n_domains ** rng.random()) - 1)
    domain = f"d{domain_id}.example"
    path_words = [_zipf_word(rng, vocab) for _ in range(rng.randint(1, 3))]
    year = 1996 + (idx % 25)
    if rng.random() < 0.3:
        path = f"/{year}/" + "-".join(path_words)
    else:
        path = "/" + "/".join(path_words)
    url = f"https://{domain}{path}"

    lang = "zz" if idx % 97 == 13 else "en"
    noindex = idx % 101 == 17

    # near duplicates: every ~40th row duplicates the body of row idx-1
    near_dup_of = idx - 1 if (idx % 40 == 7 and idx > 0) else None
    body_rng = random.Random((seed << 32) ^ (near_dup_of if near_dup_of is not None else idx) ^ 0x5EED)

    title = _sentence(body_rng, vocab, body_rng.randint(3, 7))
    rare_term = f"rare{idx if near_dup_of is None else near_dup_of}term"

    paras = []
    for _ in range(body_rng.randint(2, 6)):
        sents = [
            _sentence(body_rng, vocab, body_rng.randint(6, 14)) + "."
            for _ in range(body_rng.randint(2, 5))
        ]
        paras.append(" ".join(sents))
    # per-document rare term mid-document (the 95% body-text truncation
    # chops trailing sentences, so the tail is not a safe place for it)
    paras[len(paras) // 2] = f"The term {rare_term} appears here. " + paras[len(paras) // 2]
    if near_dup_of is not None:
        # tiny mutation so it's a NEAR duplicate within the reference's
        # LSH dedup threshold (hamming <= 2, LshDocumentDeduplicator.java:38)
        paras[0] = paras[0] + " Addendum."

    nav_links = "".join(
        f'<a href="/{_zipf_word(rng, vocab)}">{_zipf_word(rng, vocab)}</a> ' for _ in range(8)
    )
    # cross-domain links, Zipfian toward low domain ids (drives the domain
    # link graph: PageRank G6, links: keywords M12)
    ext_links = "".join(
        f'<a href="https://d{min(n_domains - 1, int(n_domains ** rng.random()) - 1)}.example/'
        f'{_zipf_word(rng, vocab)}">{_zipf_word(rng, vocab)}</a> '
        for _ in range(3)
    )
    robots = '<meta name="robots" content="noindex">' if noindex else ""
    script = "<script src=\"/jquery.js\"></script>" if idx % 7 == 0 else ""
    meta_year = f'<meta property="article:published_time" content="{year}-01-15">'

    html = (
        "<!DOCTYPE html>\n"
        f"<html><head><title>{title}</title>{robots}{meta_year}{script}</head>\n"
        "<body>\n"
        f'<nav class="nav">{nav_links}</nav>\n'
        f"<h1>{title}</h1>\n"
        + "\n".join(f"<p>{p}</p>" for p in paras)
        + '\n<div class="cookie-banner">We use cookies. Accept or reject. '
        + nav_links
        + "</div>\n"
        f'<footer>{nav_links}{ext_links} Copyright {year} {domain}</footer>\n'
        "</body></html>"
    )

    text = extract_document(html, skip_summary=True).text

    return {
        "url": url,
        "warc_ts": BASE_TS + idx * 1_000_000,
        "html": html.encode("utf-8"),
        "text": text,
        "lang": lang,
    }


def make_pages_table(n_rows: int, start: int = 0, end: int | None = None, seed: int = SEED) -> pa.Table:
    end = n_rows if end is None else end
    rows = [make_page(i, n_rows, seed) for i in range(start, end)]
    return pa.table(
        {
            "url": pa.array([r["url"] for r in rows], pa.string()),
            "warc_ts": pa.array([r["warc_ts"] for r in rows], pa.timestamp("us")),
            "html": pa.array([r["html"] for r in rows], pa.binary()),
            "text": pa.array([r["text"] for r in rows], pa.string()),
            "lang": pa.array([r["lang"] for r in rows], pa.string()),
        }
    )


def pages_parquet(n_rows: int, cache_dir: str = "/tmp/marginalia_ray_pages", seed: int = SEED) -> str:
    """Generate (once) and cache the pages corpus as partitioned parquet.
    Returns the directory path.  Generation itself runs as a Ray Data map
    over row ranges when Ray is up, else inline."""
    out = Path(cache_dir) / f"n{n_rows}_s{seed}_v3"
    done = out / "_SUCCESS"
    if done.exists():
        return str(out)
    out.mkdir(parents=True, exist_ok=True)

    chunk = 2000
    ranges = [(s, min(s + chunk, n_rows)) for s in range(0, n_rows, chunk)]
    try:
        import ray
        import ray.data

        if ray.is_initialized() and len(ranges) > 1:
            ds = ray.data.from_items(
                [{"start": s, "end": e} for s, e in ranges]
            ).map_batches(
                lambda b: _gen_batch(b, n_rows, seed),
                batch_format="pyarrow",
                batch_size=1,
            )
            ds.write_parquet(str(out))
            done.touch()
            return str(out)
    except Exception:
        pass

    for i, (s, e) in enumerate(ranges):
        pq.write_table(make_pages_table(n_rows, s, e, seed), out / f"part-{i:05d}.parquet")
    done.touch()
    return str(out)


def _gen_batch(batch: pa.Table, n_rows: int, seed: int) -> pa.Table:
    tables = [
        make_pages_table(n_rows, int(s), int(e), seed)
        for s, e in zip(
            batch["start"].to_pylist(), batch["end"].to_pylist()
        )
    ]
    return pa.concat_tables(tables)
