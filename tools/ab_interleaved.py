"""Same-process interleaved converter A/B between two source trees.

The cross-process A/B protocol (BASELINE.md round-4 section) alternates
fresh interpreters, but this host's CPU phase swings +/-15% on a timescale
comparable to one child process — larger than most per-change effects.
This harness removes that confound by alternating the two code versions
INSIDE one process: purge every ``marginalia_ray*`` module from
``sys.modules``, switch ``sys.path`` to the other tree, re-import, run.
Phase drift then hits both sides of every round nearly equally, and the
median of per-round B/A ratios is the estimate.

A blake2b single-thread probe (MB-hashes/s) is recorded before each side
as the host-phase indicator (same probe as ``bench.py --scaling-child``).

Usage:
    python tools/ab_interleaved.py <treeA> <treeB> [rounds=8] [pages=500]

Caveat: global memo caches (word forms, term values) are PER VERSION
(module-level state is dropped with the module purge), and each side warms
on 100 pages then reports best-of-2 over the full corpus, so both sides
are measured steady-state.
"""
import hashlib
import sys
import time


def probe() -> float:
    t0 = time.process_time()
    n = 0
    data = b"x" * (1 << 20)
    while time.process_time() - t0 < 0.2:
        hashlib.blake2b(data).digest()
        n += 1
    return n / (time.process_time() - t0)


def load(tree: str, all_trees):
    for m in [k for k in sys.modules if k.startswith("marginalia_ray")]:
        del sys.modules[m]
    sys.path = [p for p in sys.path if p not in all_trees]
    sys.path.insert(0, tree)
    from marginalia_ray.sources.pages import make_pages_table
    from marginalia_ray.stages.tokenizer import TokenizerStage

    return make_pages_table, TokenizerStage


def run_once(tree: str, all_trees, pages: int, tbl_cache={}) -> float:
    mk, TokenizerStage = load(tree, all_trees)
    tbl = tbl_cache.setdefault(tree, mk(pages))
    stage = TokenizerStage()
    stage(tbl.slice(0, min(100, pages)))  # warm per-version memos
    best = 1e9
    for _ in range(2):
        t0 = time.process_time()
        stage(tbl)
        best = min(best, time.process_time() - t0)
    return pages / best


def main() -> None:
    tree_a, tree_b = sys.argv[1], sys.argv[2]
    rounds = int(sys.argv[3]) if len(sys.argv) > 3 else 8
    pages = int(sys.argv[4]) if len(sys.argv) > 4 else 500
    trees = (tree_a, tree_b)
    ratios = []
    for r in range(rounds):
        pa = probe()
        a = run_once(tree_a, trees, pages)
        pb = probe()
        b = run_once(tree_b, trees, pages)
        ratios.append(b / a)
        print(
            f"round {r}: A {a:.1f} docs/s/core (probe {pa:.0f})  "
            f"B {b:.1f} (probe {pb:.0f})  B/A {b / a:.3f}",
            flush=True,
        )
    ratios.sort()
    print("median B/A:", round(ratios[len(ratios) // 2], 4))


if __name__ == "__main__":
    main()
