"""Generate OPERATORS.md — one row per registered query: name, oracle
status, and the first sentence of its builder's docstring. Run from
the repo root; commit the output so reviewers can audit the full
query surface without walking four registry modules."""

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
    print(f"wrote OPERATORS.md ({len(rows)} rows)")


if __name__ == "__main__":
    main()
