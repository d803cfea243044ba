"""Generate REGISTRY.md: the auto-synced inventory of every registered
query key — module:line, oracle kind, and the docstring's first
sentence. COVERAGE.md narrates the SURVEY §2 mapping by hand; this
file is derived from the registry itself, so it cannot go stale.

Usage: python tools/registry_doc.py   (writes REGISTRY.md at repo root)
"""

from __future__ import annotations

import inspect
import re
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))

import streamingdemo_spark.plans  # noqa: E402,F401
import streamingdemo_spark.extensions  # noqa: E402,F401
import streamingdemo_spark.streaming.queries  # noqa: E402,F401
from streamingdemo_spark.registry import (  # noqa: E402
    ORACLE_BUILDERS,
    ORACLES,
    QUERIES,
)

# built oracles (data-derived constants) are hash-kind too
_ORACLE_KEYS = set(ORACLES) | set(ORACLE_BUILDERS)


def first_sentence(doc: str | None) -> str:
    if not doc:
        return ""
    text = " ".join(doc.split())
    for stop in (". ", ".\n"):
        if stop in text:
            return text[: text.index(stop) + 1]
    return text[:160]


def main() -> None:
    lines = [
        "# REGISTRY — every `queries()` key (auto-generated)",
        "",
        "Derived from the live registry by `tools/registry_doc.py`;",
        "regenerate after adding keys. Oracle kinds: `hash` = DuckDB",
        "value-hash oracle registered; `rows` = rows-only by SURVEY",
        "contract (approx / engine-specific / side-effecting).",
        "",
        f"Total keys: **{len(QUERIES)}** "
        f"({sum(1 for k in QUERIES if k in _ORACLE_KEYS)} hash, "
        f"{sum(1 for k in QUERIES if k not in _ORACLE_KEYS)} rows-only).",
        "",
        "| key | impl | oracle | summary |",
        "|---|---|---|---|",
    ]
    for key in sorted(QUERIES):
        fn = QUERIES[key]
        try:
            path = Path(inspect.getfile(fn)).relative_to(ROOT)
            line = inspect.getsourcelines(fn)[1]
            where = f"{path}:{line}"
        except (TypeError, OSError, ValueError):
            where = "?"
        kind = "hash" if key in _ORACLE_KEYS else "rows"
        summary = first_sentence(fn.__doc__).replace("|", "\\|")
        if kind == "rows":
            # rows-only keys must state WHY that is final: surface the
            # docstring's FINAL CONTRACT paragraph in the inventory so
            # the rows-only count is provably minimal, not a backlog.
            # Cut at the paragraph break in the RAW docstring — taking
            # everything to the end would inline unrelated trailing
            # paragraphs (e.g. a Reference-parity trailer).
            raw = fn.__doc__ or ""
            if "FINAL CONTRACT:" in raw:
                para = raw[raw.index("FINAL CONTRACT:"):]
                blank = re.search(r"\n[ \t]*\n", para)
                if blank:
                    para = para[: blank.start()]
                summary += (
                    " **" + " ".join(para.split()).replace("|", "\\|") + "**"
                )
        lines.append(f"| `{key}` | {where} | {kind} | {summary} |")
    (ROOT / "REGISTRY.md").write_text("\n".join(lines) + "\n")
    print(f"wrote REGISTRY.md: {len(QUERIES)} keys")


if __name__ == "__main__":
    main()
