"""Mechanical migration of the units->currency DOUBLE-reduction class
(r16) — the final-reduction sibling of r15's ROUND(x, n>=1) migration.

Context: after r15, every revenue aggregate sums EXACT integer units
(``CAST(ROUND(expr * 10^s, 0) AS BIGINT)``), but the reduction to cents
still ran through a double division: ``ROUND(CAST(S AS DOUBLE) / d, 0)
/ 100.0``. IEEE division collapses true quotients within 1 ulp of a
half-cent onto the .5 boundary once the sum exceeds ~2^52 * (100/d)
cents (adversarial witness: units 9999999999994999 at d=10000 — true
cents ...999.4999 — divides to exactly ...999.5 in double and rounds the
wrong way). Both engines agreed (same IEEE ops) so the driver gate could
never catch it, but the value was wrong versus true cents. The exact
form does the half-away-from-zero reduction in INTEGER space — add the
signed half, truncate toward zero via ``x - x % d``, divide the now-exact
multiple — and only then converts cents to double:

  DuckDB oracle strings (``//`` — HUGEINT-exact integer division):
    (CAST((S2 - S2 % d) // d AS DOUBLE) / 100.0)   where
    S2 = (S + CASE WHEN S < 0 THEN -d/2 ELSE d/2 END)
  Spark SQL bodies / SQL twins (``div`` — Spark's integral division):
    (CAST((S2 - S2 % d) div d AS DOUBLE) / 100.0)

Both dialect templates are differential-verified against a Python
integer reference including the adversarial boundary class
(tests/test_relational_cdc.py::test_units_reduction_exact_forms_agree).
The DataFrame twin is ``operators.relational.units_to_currency`` —
migrated in the same commit, decimal lanes.

Dialect detection: a site inside a ``spark.sql(`` call or the
``SQL_TWINS`` dict is Spark dialect; a site inside a ``REG.add(``
decorator argument is a DuckDB oracle string. Detection scans backward
from the match for the nearest marker token.

Usage: python tools/units_migrate.py [--dry-run] file.py [...]
"""

from __future__ import annotations

import re
import sys

HEAD = re.compile(r"ROUND\(CAST\(")
TAIL = re.compile(r"\s*/\s*(100|10000)\.0\s*,\s*0\s*\)\s*/\s*100\.0")
MARKERS = ("spark.sql(", "SQL_TWINS", "REG.add(")


def _match_paren(src: str, open_idx: int) -> int:
    depth, i = 0, open_idx
    while i < len(src):
        c = src[i]
        if c == "(":
            depth += 1
        elif c == ")":
            depth -= 1
            if depth == 0:
                return i + 1
        i += 1
    raise ValueError(f"unbalanced parens at {open_idx}")


def _dialect(src: str, pos: int) -> str:
    """Nearest preceding marker decides the dialect of the enclosing
    string literal. REG.add -> DuckDB oracle; spark.sql / SQL_TWINS ->
    Spark SQL."""
    best, kind = -1, None
    for marker in MARKERS:
        i = src.rfind(marker, 0, pos)
        if i > best:
            best, kind = i, marker
    if kind is None:
        raise ValueError("no dialect marker precedes reduction site")
    return "duck" if kind == "REG.add(" else "spark"


def rewrite(src: str) -> tuple[str, int, list[str]]:
    out, pos, n, notes = [], 0, 0, []
    while True:
        m = HEAD.search(src, pos)
        if m is None:
            out.append(src[pos:])
            break
        cast_open = m.end() - 1  # the '(' of CAST(
        try:
            cast_end = _match_paren(src, cast_open)
        except ValueError:
            out.append(src[pos : m.end()])
            pos = m.end()
            continue
        inner = src[cast_open + 1 : cast_end - 1]
        tm = TAIL.match(src, cast_end)
        if not inner.rstrip().endswith("AS DOUBLE") or tm is None:
            out.append(src[pos : m.end()])
            pos = m.end()
            continue
        s_expr = re.sub(r"\s+", " ", inner.rstrip()[: -len("AS DOUBLE")].strip())
        d = int(tm.group(1))
        h = d // 2
        op = "//" if _dialect(src, m.start()) == "duck" else "div"
        s2 = f"({s_expr} + CASE WHEN {s_expr} < 0 THEN -{h} ELSE {h} END)"
        repl = f"CAST(({s2} - {s2} % {d}) {op} {d} AS DOUBLE) / 100.0"
        out.append(src[pos : m.start()])
        out.append(repl)
        notes.append(f"{op} d={d}: {s_expr[:60]}")
        n += 1
        pos = tm.end()
    return "".join(out), n, notes


def main() -> None:
    argv = sys.argv[1:]
    dry = "--dry-run" in argv
    files = [a for a in argv if a != "--dry-run"]
    total = 0
    for path in files:
        with open(path) as f:
            src = f.read()
        new, n, notes = rewrite(src)
        total += n
        print(f"{path}: {n} rewrite(s)")
        for note in notes:
            print(f"  - {note}")
        if n and not dry:
            compile(new, path, "exec")
            with open(path, "w") as f:
                f.write(new)
    print(f"total: {total}")


if __name__ == "__main__":
    main()
