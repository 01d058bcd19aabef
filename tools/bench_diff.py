"""Diff two BENCH_DETAIL.json-shaped files (round-over-round): top
regressions and improvements, plus the uniform-shift load check.

Usage: python tools/bench_diff.py OLD.json NEW.json [top_n]
       python tools/bench_diff.py 'git:<rev>' NEW.json   (old file from git)

Why the load check: this host shares CPU with other tenants, and raw
round-over-round comparisons are reliably confounded by whichever
window was busier (the r8-tail vs r9-detail comparison showed uniform
~30% "regressions" that the interleaved pair disproved). If the median
ratio across common queries is far from 1.0 while the ratio SPREAD is
small, the diff is telling you about the host, not the code — rerun as
an interleaved pair (BASELINE.md protocol form #1) before believing
any single row.
"""

from __future__ import annotations

import json
import statistics
import subprocess
import sys


def _load(path: str) -> dict:
    if path.startswith("git:"):
        rev = path[4:]
        raw = subprocess.check_output(
            ["git", "show", f"{rev}:BENCH_DETAIL.json"], text=True
        )
        return json.loads(raw)
    with open(path) as f:
        return json.load(f)


def main() -> None:
    if len(sys.argv) < 3:
        print(__doc__)
        sys.exit(2)
    old, new = _load(sys.argv[1]), _load(sys.argv[2])
    top_n = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    qo = {k: v for k, v in old["queries"].items() if v and v > 0}
    qn = {k: v for k, v in new["queries"].items() if v and v > 0}
    common = sorted(set(qo) & set(qn))
    added = sorted(set(qn) - set(qo))
    removed = sorted(set(qo) - set(qn))
    ratios = {k: qn[k] / qo[k] for k in common}
    med = statistics.median(ratios.values())
    spread = (
        statistics.quantiles(ratios.values(), n=4)[2]
        - statistics.quantiles(ratios.values(), n=4)[0]
        if len(ratios) >= 4
        else 0.0
    )
    print(
        f"common={len(common)} added={len(added)} removed={len(removed)} "
        f"old_total={sum(qo[k] for k in common):.1f}s "
        f"new_total={sum(qn[k] for k in common):.1f}s "
        f"median_ratio={med:.2f} iqr={spread:.2f}"
    )
    # keep-one-live rotation: the append family's live query advances
    # each round, so diffs of q_stream_*_append rows compare DIFFERENT
    # implementations (live vs mux-served) unless the picks match
    # Window-stamp gate (r12 verdict What's-wrong #1): without stamps
    # on both files, or with distant loads, a per-query ratio claim is
    # the documented ±30% trap — refuse to present ratios as findings.
    wo, wn = old.get("window"), new.get("window")
    if not wo or not wn:
        print(
            "REFUSED: missing window stamp on "
            + ("both files" if not wo and not wn else
               ("OLD" if not wo else "NEW"))
            + " — totals above are NOT comparable; re-run bench.py "
            "(it stamps {timestamp, load_start/end, git_sha, "
            "live_append_pick}) or interleave the two versions."
        )
        sys.exit(1)
    lo = max(wo.get("load_start", 0), wo.get("load_end", 0))
    ln = max(wn.get("load_start", 0), wn.get("load_end", 0))
    print(
        f"windows: old={wo.get('timestamp')} load≤{lo} "
        f"sha={wo.get('git_sha')} | new={wn.get('timestamp')} "
        f"load≤{ln} sha={wn.get('git_sha')}"
    )
    if min(lo, ln) > 0 and max(lo, ln) / max(min(lo, ln), 0.1) > 1.5:
        print(
            "WARNING: window loads differ >1.5x — per-query ratios "
            "below reflect the host, not the code; interleave before "
            "believing any row."
        )
    po, pn = old.get("live_append_pick"), new.get("live_append_pick")
    if po or pn:
        note = (
            "" if po == pn else
            "  [picks differ: append-family rows are live-vs-mux, "
            "not like-for-like]"
        )
        print(f"live_append_pick: old={po} new={pn}{note}")
    if abs(med - 1.0) > 0.15 and spread < 0.5 * abs(med - 1.0) + 0.1:
        print(
            "WARNING: uniform shift (median far from 1.0, tight spread) "
            "— this is the ambient-load signature, not a code change. "
            "Interleave the two versions in ONE window before acting "
            "(BASELINE.md protocol form #1)."
        )
    worst = sorted(common, key=lambda k: qo[k] - qn[k])[:top_n]
    best = sorted(common, key=lambda k: qn[k] - qo[k])[:top_n]
    print("top regressions (new-old sec):")
    for k in worst:
        d = qn[k] - qo[k]
        if d <= 0:
            break
        print(f"  {k}: {qo[k]:.2f} -> {qn[k]:.2f} (+{d:.2f}s, x{ratios[k]:.2f})")
    print("top improvements (old-new sec):")
    for k in best:
        d = qo[k] - qn[k]
        if d <= 0:
            break
        print(f"  {k}: {qo[k]:.2f} -> {qn[k]:.2f} (-{d:.2f}s, x{ratios[k]:.2f})")
    if added:
        print("added:", ", ".join(added))
    if removed:
        print("removed:", ", ".join(removed))


if __name__ == "__main__":
    main()
