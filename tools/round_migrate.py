"""Mechanical migration of the ROUND(x, n>=1) representation-boundary class.

Context (BASELINE.md round-15 work-list, contract.py determinism rules):
``ROUND(x, n)`` at n >= 1 is not engine-identical at representation
boundaries — Spark rounds the shortest decimal repr (BigDecimal.valueOf)
while DuckDB rounds the binary double. The safe form
``ROUND(x * 10^n, 0) / 10^n`` agrees on every double in both engines
(at 0 decimals both round halves away from zero on the binary value).

This script rewrites, in package source files:
  * ``F.round(<expr>, <n>)``   ->  ``(F.round((<expr>) * 10**n, 0) / 10**n.0)``
  * ``ROUND(<expr>, <n>)``     ->  ``(ROUND((<expr>) * 10**n, 0) / 10**n.0)``
    (uppercase only — SQL convention in this repo; lowercase ``round(`` is
    the Python builtin / pandas method and must not be touched)

Only literal non-negative integer second arguments with n >= 1 are
rewritten; symbolic args, n == 0, and already-safe forms are left alone
(the replacement's inner ROUND has n == 0, so the rewrite is a fixed point).

Both the Spark expression and the DuckDB oracle string migrate together,
so a migrated key can never break the driver's value-hash gate — the two
forms move in lockstep; only the boundary class is removed.

Usage: python tools/round_migrate.py [--dry-run] file.py [file.py ...]
"""

from __future__ import annotations

import re
import sys

CALL_RE = re.compile(r"(?<![\w.])(F\.round|ROUND)\s*\(")
# For pure-SQL text (oracle strings) the Python-builtin ambiguity is gone,
# so lowercase round( is also the engine function and must be flagged
# (q_scalar_math's oracle hid 3 sites from the uppercase-only scan).
SQL_CALL_RE = re.compile(r"(?<![\w.])(round)\s*\(", re.IGNORECASE)


def _match_paren(src: str, open_idx: int) -> int:
    """Index just past the ')' matching the '(' at open_idx (string-aware is
    unnecessary here: args in this codebase never contain unbalanced parens
    inside string literals — verified by the post-rewrite compile check)."""
    depth = 0
    i = open_idx
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


def _split_top(arg_src: str) -> list[str]:
    parts, depth, start = [], 0, 0
    for i, c in enumerate(arg_src):
        if c in "([{":
            depth += 1
        elif c in ")]}":
            depth -= 1
        elif c == "," and depth == 0:
            parts.append(arg_src[start:i])
            start = i + 1
    parts.append(arg_src[start:])
    # tolerate a multi-line call's trailing comma: F.round(x,\n 2,\n)
    if len(parts) > 1 and not parts[-1].strip():
        parts.pop()
    return parts


def find_unsafe(src: str, sql_only: bool = False) -> list[str]:
    """Scan-only twin of ``migrate``: every ``F.round(x, n>=1)`` /
    ``ROUND(x, n>=1)`` occurrence, as a short snippet. Used by
    ``tests/test_entry_contract.py::test_no_unsafe_round_anywhere`` so the
    representation-boundary class cannot be reintroduced — same detector,
    no drift (the r13 bad_cols lesson). ``sql_only=True`` (for oracle
    strings) also matches lowercase ``round(`` — in pure SQL there is no
    Python-builtin ambiguity."""
    pattern = SQL_CALL_RE if sql_only else CALL_RE
    hits, pos = [], 0
    while True:
        m = pattern.search(src, pos)
        if m is None:
            return hits
        open_idx = src.index("(", m.end() - 1)
        try:
            end = _match_paren(src, open_idx)
        except ValueError:
            pos = m.end()
            continue
        args = _split_top(src[open_idx + 1 : end - 1])
        if len(args) == 2 and re.fullmatch(r"\s*(\d+)\s*", args[1]) and int(args[1]) >= 1:
            hits.append(src[m.start() : min(end, m.start() + 80)].replace("\n", " "))
        # Descend into the argument span (not past the whole call) so a
        # round call nested inside another round call's arguments is
        # scanned too — e.g. the unsafe inner call in
        # ``F.round((F.round(x, 2) + y) * 10000, 0)`` (r15 ADVICE gap).
        pos = open_idx + 1


def find_unsafe_sql_strings(py_src: str) -> list[str]:
    """Scan SQL text embedded in Python string literals (spark.sql bodies,
    oracle fragments) with the ``sql_only`` detector — in pure SQL,
    lowercase ``round(`` is the engine function, the exact gap that hid
    q_scalar_math's oracle sites from the uppercase-only source scan.
    Only strings that look like SQL (contain SELECT and FROM) are scanned,
    so prose/docstrings discussing the Python builtin aren't flagged.
    f-strings are scanned via their constant fragments joined with a
    placeholder (an interpolation hole can't itself be a literal scale)."""
    import ast

    hits: list[str] = []
    try:
        tree = ast.parse(py_src)
    except SyntaxError:
        return hits
    texts: list[str] = []
    fstring_fragments: set[int] = set()
    for node in ast.walk(tree):
        if isinstance(node, ast.JoinedStr):
            frags = [
                v
                for v in node.values
                if isinstance(v, ast.Constant) and isinstance(v.value, str)
            ]
            fstring_fragments.update(id(v) for v in frags)
            texts.append(" _ ".join(v.value for v in frags))
    for node in ast.walk(tree):
        if (
            isinstance(node, ast.Constant)
            and isinstance(node.value, str)
            and id(node) not in fstring_fragments
        ):
            texts.append(node.value)
    for s in texts:
        if re.search(r"\bSELECT\b", s, re.I) and re.search(r"\bFROM\b", s, re.I):
            hits += find_unsafe(s, sql_only=True)
    return hits


def migrate(src: str) -> tuple[str, int]:
    out, pos, n_rewrites = [], 0, 0
    while True:
        m = CALL_RE.search(src, pos)
        if m is None:
            out.append(src[pos:])
            break
        open_idx = src.index("(", m.end() - 1)
        try:
            end = _match_paren(src, open_idx)
        except ValueError:
            out.append(src[pos : m.end()])
            pos = m.end()
            continue
        inner = src[open_idx + 1 : end - 1]
        args = _split_top(inner)
        fn = m.group(1)
        if len(args) == 2 and re.fullmatch(r"\s*(\d+)\s*", args[1]) and int(args[1]) >= 1:
            n = int(args[1])
            scale = 10**n
            expr = args[0].strip()
            # Rescan the column expression itself before embedding it: an
            # unsafe call nested inside this call's first argument must
            # migrate too, or it would hide inside the rewritten span.
            expr, k = migrate(expr)
            n_rewrites += k
            if fn == "F.round":
                # A quoted-string first arg is a column NAME in the PySpark
                # API; Python string repetition (("sv") * 100) compiles but
                # is wrong at runtime — emit F.col so the output is
                # directly correct, no manual post-pass (r15 ADVICE gap).
                if re.fullmatch(r"(['\"])[A-Za-z_][A-Za-z0-9_]*\1", expr):
                    expr = f"F.col({expr})"
                repl = f"(F.round(({expr}) * {scale}, 0) / {scale}.0)"
            else:
                repl = f"(ROUND(({expr}) * {scale}, 0) / {scale}.0)"
            out.append(src[pos : m.start()])
            out.append(repl)
            n_rewrites += 1
            pos = end
        else:
            # Descend into the argument list instead of skipping the whole
            # call span, so rewritable calls nested inside a safe call's
            # arguments are still found.
            out.append(src[pos : open_idx + 1])
            pos = open_idx + 1
    return "".join(out), n_rewrites


def main() -> None:
    argv = sys.argv[1:]
    dry = "--dry-run" in argv
    files = [a for a in argv if a != "--dry-run"]
    total = 0
    for path in files:
        with open(path) as f:
            src = f.read()
        new, n = migrate(src)
        total += n
        print(f"{path}: {n} rewrite(s)")
        if n and not dry:
            compile(new, path, "exec")  # refuse to write syntactically-broken output
            with open(path, "w") as f:
                f.write(new)
    print(f"total: {total}")


if __name__ == "__main__":
    main()
