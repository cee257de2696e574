"""Driver-to-driver bench comparison: r10 close sidecar (git) vs the
current bench_results.json. Prints totals, probe drift, and the
largest per-query movements, plus the specific queries this round
touched.

    python tools/bench_compare.py [gitrev]   # default 2eafc79
"""

import json
import subprocess
import sys

rev = sys.argv[1] if len(sys.argv) > 1 else "2eafc79"
old = json.loads(
    subprocess.run(
        ["git", "show", f"{rev}:bench_results.json"],
        capture_output=True,
        text=True,
        check=True,
    ).stdout
)
new = json.load(open("bench_results.json"))

oq, nq = old["queries"], new["queries"]
common = sorted(set(oq) & set(nq))
ot = sum(oq[n] for n in common)
nt = sum(nq[n] for n in common)
print(f"common queries: {len(common)}")
print(f"r10 total {ot:.1f}s -> now {nt:.1f}s  ({nt / ot:.3f}x)")
print(f"new-only queries: {sorted(set(nq) - set(oq))}")
print(f"probe r10: {old.get('probe')}")
print(f"probe now: {new.get('probe')}  (now = warm-min statistic, r11)")
print(f"classes: {sum(1 for v in new.get('classes', {}).values() if v == 'arrow')} arrow / {len(new.get('classes', {}))}")

TOUCHED = [
    "corpus_recipe_e2e",
    "sentence_span_dedup",
    "neardup_prefix_filter",
    "neardup_prefix_waved",
    "neardup_dual_measure",
    "dedup_clusters",
    "neardup_cross_ingest",
]
print("\ntouched queries (r10 median -> new median [band]):")
for n in TOUCHED:
    o = oq.get(n)
    b = new.get("bands", {}).get(n)
    print(f"  {n:28s} {o if o is not None else '—':>8} -> {nq.get(n):8.3f}  {b}")

print("\nlargest regressions (ratio, new>0.5s):")
movers = sorted(
    (n for n in common if nq[n] > 0.5 and oq[n] > 0.05),
    key=lambda n: nq[n] / oq[n],
    reverse=True,
)
for n in movers[:12]:
    print(f"  {n:32s} {oq[n]:8.3f} -> {nq[n]:8.3f}  {nq[n] / oq[n]:5.2f}x")
print("\nlargest improvements:")
for n in movers[-12:]:
    print(f"  {n:32s} {oq[n]:8.3f} -> {nq[n]:8.3f}  {nq[n] / oq[n]:5.2f}x")
