"""Artifact lint: every committed perf claim must resolve to a healthy row.

Round-3 VERDICT item 1: a claim whose artifact is missing (or whose
artifact row says converged=false/NaN with no adjacent explanation) is
worse than no claim.  This lint makes the criterion mechanical:

1. NORTHSTAR.json: no case may carry a NaN residual or converged=false
   unless the row itself explains it ("skipped", a "*_attempt_failed"
   sub-record with a successful fallback, or an explicit "note").
2. Case/entry names cited in docs/status.md and README.md must exist in
   the artifacts.
3. BENCH_SUITE.json: "skipped" entries are listed (visibility, not
   failure — some entries legitimately skip off-TPU).
4. bench.py's round artifact must have a non-null value (stale-but-real
   beats null).

Exit code 0 = clean, 1 = violations (printed).  Run after every
benchmark regeneration:  python benchmarks/lint_artifacts.py
"""

import json
import math
import pathlib
import re
import sys

ROOT = pathlib.Path(__file__).resolve().parent.parent

# Artifact row names that docs may cite; extend when adding cases.
CITED = {
    "NORTHSTAR.json": [
        "ssy_continuous_quadrature_pre", "ssy_discrete_tauchen",
        "gcy_discrete_tauchen", "gcy_discrete_rouwenhorst_f32",
        "gcy_continuous_quadpre_pair",
    ],
    "BENCH_SUITE.json": [
        "ssy_discrete_streamed_11.2M_f32_accurate_3x",
        "ssy_discrete_streamed_11.2M_f32_mixed_3x",
        "ssy_discrete_streamed_11.2M_f32_throughput",
        "gcy_continuous_pair_4.2M_f32",
        "gcy_continuous_mc_nodechain_147k_f32_5apps",
        "ssy_continuous_mc_nodechain_160k_f32_5apps",
        "gcy_discrete_tiled_newton_1.0M_f32",
    ],
}


# Reference-repo module names the docs cite for parity (file:line
# citations without the .py suffix) — not artifact rows.
_REF_NAMES = {"ssy_wc_ratio", "gcy_wc_ratio", "ssy_wc_ratio_continuous",
              "gcy_wc_ratio_continuous", "ssy_model", "gcy_model"}


def _bad(msg, bad):
    bad.append(msg)
    print(f"LINT: {msg}")


def lint(root=ROOT):
    bad = []

    ns_path = root / "NORTHSTAR.json"
    if not ns_path.exists():
        _bad("NORTHSTAR.json missing", bad)
        ns = {"cases": []}
    else:
        ns = json.loads(ns_path.read_text())
    names = set()
    for c in ns.get("cases", []):
        names.add(c.get("name"))
        if c.get("skipped"):
            continue
        resid = c.get("residual_f32", c.get("residual_f64", 0.0))
        explained = ("note" in c or any(k.endswith("_attempt_failed")
                                        for k in c))
        if (isinstance(resid, float) and math.isnan(resid)
                and not explained):
            _bad(f"NORTHSTAR {c['name']}: NaN residual with no "
                 "adjacent explanation", bad)
        if c.get("converged") is False and not explained:
            _bad(f"NORTHSTAR {c['name']}: converged=false with no "
                 "adjacent explanation", bad)
    for want in CITED["NORTHSTAR.json"]:
        if want not in names:
            _bad(f"NORTHSTAR lacks cited case {want!r}", bad)

    bs_path = root / "BENCH_SUITE.json"
    if not bs_path.exists():
        _bad("BENCH_SUITE.json missing", bad)
        entries = []
    else:
        entries = json.loads(bs_path.read_text()).get("entries", [])
    enames = {e.get("name") for e in entries}
    for e in entries:
        if "skipped" in e:
            print(f"note: BENCH_SUITE entry {e['name']} skipped: "
                  f"{e['skipped'][:80]}")
    for want in CITED["BENCH_SUITE.json"]:
        if want not in enames:
            _bad(f"BENCH_SUITE lacks cited entry {want!r}", bad)

    rounds = sorted(root.glob("BENCH_r[0-9]*.json"))
    if rounds:
        latest = rounds[-1]
        try:
            parsed = json.loads(latest.read_text()).get("parsed") or {}
        except ValueError:
            parsed = {}
        if parsed.get("value") is None:
            _bad(f"{latest.name}: null headline value (the stale-"
                 "fallback should have prevented this)", bad)
        elif parsed.get("stale"):
            print(f"note: {latest.name} is a stale last-good record "
                  f"({parsed.get('stale_reason', '')[:80]})")

    # docs citations: any artifact-row-looking identifier in the docs
    # must exist somewhere.
    known = names | enames
    pat = re.compile(r"`((?:ssy|gcy)_[A-Za-z0-9_.^]+)`")
    for doc in ("docs/status.md", "README.md", "docs/parity.md",
                "docs/scaling.md", "docs/precision.md", "docs/design.md",
                "docs/migration.md"):
        text = (root / doc).read_text()
        for m in set(pat.findall(text)):
            if m.endswith((".py", ".md", ".ipynb")) or m in _REF_NAMES:
                continue               # reference-file citation, not a row
            if m not in known and not m.endswith(("_factory", "_demo")):
                _bad(f"{doc} cites {m!r}, absent from artifacts", bad)

    print("clean" if not bad else f"{len(bad)} violation(s)")
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(lint())
