"""Full-surface oracle sweep at any scale factor, in bounded chunks.

Codifies the r14 sf0.1 differential (which caught two real
representation-boundary bugs on its first run — q_tpch_q11_shape,
q_quality_score) into one command, so the triple-sf close gate is
construction, not heroics (r14 VERDICT directive 5):

    python tools/sweep_sf.py /root/testdata/sf0.1
    python tools/sweep_sf.py /root/testdata/sf0.1 --chunk-size 20 --from-chunk 3

Each chunk runs ``tools/verify_oracle.py`` in a fresh subprocess (fresh
SparkSession + DuckDB connection: bounds memory growth across the
dedup-family oracles, which dominate at sf0.1, and keeps every command
restartable). PASS/FAIL/ROWS-ONLY lines are parsed and aggregated; the
tally and per-key failures are written to ``SWEEP_<sf>.json`` at the
repo root (gitignored working artifact — the committed evidence is the
BASELINE.md cadence note).

Exit code 1 iff any key failed, so it composes with close-gate scripts.
"""

from __future__ import annotations

import json
import os
import re
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> int:
    args = [a for a in sys.argv[1:]]
    sf_dir = "/root/testdata/sf0.1"
    chunk_size, from_chunk = 20, 0
    chunk_timeout: int | None = None  # seconds; None = wait forever
    exclude: set[str] = set()
    only: set[str] = set()
    rest = []
    it = iter(args)
    for a in it:
        if a == "--chunk-size":
            chunk_size = int(next(it))
        elif a == "--from-chunk":
            from_chunk = int(next(it))
        elif a == "--exclude":
            exclude = set(next(it).split(","))
        elif a == "--only":
            only = set(next(it).split(","))
        elif a == "--chunk-timeout":
            chunk_timeout = int(next(it))
        else:
            rest.append(a)
    if rest:
        sf_dir = rest[0]

    sys.path.insert(0, REPO)
    import __spark_entry__ as e

    keys = list(e.queries())
    unknown = (exclude | only) - set(keys)
    if unknown:
        print(f"unknown keys in --exclude/--only: {sorted(unknown)}")
        return 2
    if only:
        keys = [k for k in keys if k in only]
    if exclude:
        dropped = [k for k in keys if k in exclude]
        keys = [k for k in keys if k not in exclude]
        print(f"excluded {len(dropped)} key(s): {','.join(dropped)}")
    chunks = [keys[i : i + chunk_size] for i in range(0, len(keys), chunk_size)]
    line_re = re.compile(r"^(PASS|FAIL|ROWS-ONLY) (\S+?):?\s")

    tally: dict[str, str] = {}
    fail_detail: dict[str, list[str]] = {}
    t0 = time.time()
    for ci, chunk in enumerate(chunks):
        if ci < from_chunk:
            continue
        cmd = [sys.executable, os.path.join(REPO, "tools", "verify_oracle.py"), sf_dir, *chunk]
        t_chunk = time.time()
        try:
            proc = subprocess.run(
                cmd, capture_output=True, text=True, cwd=REPO, timeout=chunk_timeout
            )
            stdout = proc.stdout
        except subprocess.TimeoutExpired as exc:
            # a hung/quadratic key: keep whatever keys already reported
            # (they printed before the hog), NORECORD the rest
            stdout = (exc.stdout or b"").decode() if isinstance(exc.stdout, bytes) else (exc.stdout or "")
            print(f"chunk {ci + 1}: TIMEOUT after {chunk_timeout}s", flush=True)
        current = None
        for line in stdout.splitlines():
            m = line_re.match(line)
            if m:
                status, key = m.group(1), m.group(2)
                tally[key] = status
                current = key if status == "FAIL" else None
            elif current and line.startswith("   "):
                fail_detail.setdefault(current, []).append(line.strip())
        missing = [k for k in chunk if k not in tally]
        for k in missing:  # crashed mid-chunk: record loudly, keep going
            tally[k] = "NORECORD"
        print(
            f"chunk {ci + 1}/{len(chunks)}: "
            f"{sum(1 for k in chunk if tally.get(k) == 'PASS')} pass, "
            f"{sum(1 for k in chunk if tally.get(k) == 'FAIL')} fail, "
            f"{sum(1 for k in chunk if tally.get(k) == 'ROWS-ONLY')} rows-only"
            + (f", NORECORD: {missing}" if missing else "")
            + f" ({time.time() - t_chunk:.0f}s, cum {time.time() - t0:.0f}s)",
            flush=True,
        )
        for k in chunk:
            if tally.get(k) == "FAIL":
                print(f"  FAIL {k}: {'; '.join(fail_detail.get(k, ['(see chunk log)']))[:300]}")

    counts = {s: sum(1 for v in tally.values() if v == s) for s in
              ("PASS", "FAIL", "ROWS-ONLY", "NORECORD")}
    out = {
        "sf_dir": sf_dir,
        "counts": counts,
        "fails": {k: fail_detail.get(k, []) for k, v in tally.items() if v == "FAIL"},
        "norecord": [k for k, v in tally.items() if v == "NORECORD"],
        "wall_s": round(time.time() - t0, 1),
    }
    name = f"SWEEP_{os.path.basename(os.path.normpath(sf_dir))}.json"
    with open(os.path.join(REPO, name), "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)
    print(f"\n== {counts} in {out['wall_s']}s -> {name} ==")
    return 1 if counts["FAIL"] or counts["NORECORD"] else 0


if __name__ == "__main__":
    raise SystemExit(main())
