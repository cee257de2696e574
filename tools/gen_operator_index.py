"""Generate OPERATORS.md — one row per registered query: name, oracle
status, and the first sentence of its builder's docstring — and audit
COVERAGE.md's header tally against its actual table rows (the header
drifted in r6/r7; now the script is the source of truth and exits
non-zero on mismatch). Run from the repo root; commit the output so
reviewers can audit the full query surface without walking four
registry modules."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def first_sentence(doc: str | None) -> str:
    if not doc:
        return ""
    text = " ".join(doc.split())
    for stop in (". ", ".) "):
        i = text.find(stop)
        if i != -1:
            return text[: i + 1]
    return text[:180]


def coverage_tally() -> tuple[int, int]:
    """Count COVERAGE.md's per-section operator rows and check the
    header's claimed tallies. Returns (survey_s2_rows, pipeline_rows);
    raises SystemExit if the header drifts from the tables."""
    import re

    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    lines = open(os.path.join(here, "COVERAGE.md")).read().splitlines()
    sec, counts = None, {}
    for line in lines:
        if line.startswith("## "):
            sec = line[3:].strip()
        elif (
            line.startswith("|")
            and "---" not in line
            and "Operator" not in line.split("|")[1]
        ):
            counts[sec] = counts.get(sec, 0) + 1
    s2 = sum(v for k, v in counts.items() if k and k.startswith("§2"))
    pipe = sum(v for k, v in counts.items() if k and not k.startswith("§2"))
    header = "\n".join(lines[:10])
    m2 = re.search(r"(\d+) SURVEY §2 rows", header)
    mp = re.search(r"(\d+) LLM-pipeline rows", header)
    for got, claim, label in ((s2, m2, "SURVEY §2"), (pipe, mp, "LLM-pipeline")):
        if claim is None or int(claim.group(1)) != got:
            raise SystemExit(
                f"COVERAGE.md header drift: {label} tables hold {got} rows "
                f"but the header claims {claim.group(1) if claim else 'nothing'}"
            )
    return s2, pipe


def main() -> None:
    from mpes_spark.decision import _REGISTRY as DEC
    from mpes_spark.extras.registry import _REGISTRY as EXT
    from mpes_spark.registry import _REGISTRY as CORE

    rows = []
    for label, reg in (("core", CORE), ("extras", EXT), ("decision", DEC)):
        for q in reg:
            rows.append(
                (
                    q.name,
                    label,
                    "oracle" if q.sql is not None else "rows-only",
                    first_sentence(q.spark.__doc__),
                )
            )
    rows.sort()
    out = [
        "# OPERATORS — every registered query (generated)",
        "",
        f"{len(rows)} queries; regenerate with "
        "`python tools/gen_operator_index.py`.",
        "",
        "| query | module | check | what it is |",
        "|---|---|---|---|",
    ]
    for name, label, check, desc in rows:
        out.append(f"| `{name}` | {label} | {check} | {desc} |")
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(here, "OPERATORS.md"), "w") as fh:
        fh.write("\n".join(out) + "\n")
    s2, pipe = coverage_tally()
    print(
        f"wrote OPERATORS.md ({len(rows)} rows); COVERAGE.md tally ok "
        f"({s2} SURVEY §2 + {pipe} LLM-pipeline rows)"
    )


if __name__ == "__main__":
    main()
