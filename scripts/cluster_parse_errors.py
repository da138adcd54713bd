"""Cluster census ParseError cases by first-parse-failure signature.

Pure-parser pass: for each case the census marked ERR ParseError, parse
every statement and record the first ParseError's normalized message.
Output: signature -> count + sample cases (the round-5 parser worklist).
"""
import os
import re
import sys
from collections import Counter, defaultdict

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))

REF_DIR = "/root/reference/tests/queries/0_stateless"


def norm(msg: str) -> str:
    m = re.sub(r"'[^']*'", "'_'", msg)
    m = re.sub(r"\d+", "N", m)
    return m[:110]


def main():
    from test_reference_compat import split_statements
    from clickhouse_tpu.sql.parser import parse
    which = sys.argv[1] if len(sys.argv) > 1 else "ParseError"
    cases = []
    with open(os.path.join(REPO, "scratch", "triage_results.txt")) as f:
        for ln in f:
            p = ln.split()
            if len(p) >= 3 and p[0] == "ERR" and p[2] == which:
                cases.append(p[1])
    sig_count = Counter()
    sig_cases = defaultdict(list)
    parse_ok = 0
    for name in cases:
        path = os.path.join(REF_DIR, name + ".sql")
        try:
            with open(path, encoding="utf-8",
                      errors="surrogateescape") as f:
                sql_text = f.read().replace("{CLICKHOUSE_DATABASE}",
                                            "default")
            stmts = split_statements(sql_text)
        except Exception as e:  # noqa: BLE001
            sig = "SPLIT: " + norm(str(e) or type(e).__name__)
            sig_count[sig] += 1
            sig_cases[sig].append(name)
            continue
        hit = None
        for stmt_text, toks, expects_error, lo, hi in stmts:
            if expects_error:
                continue
            try:
                parse(stmt_text)
            except Exception as e:  # noqa: BLE001
                hit = (norm(str(e) or type(e).__name__), stmt_text)
                break
        if hit is None:
            parse_ok += 1         # ParseError came from somewhere deeper
            continue
        sig_count[hit[0]] += 1
        sig_cases[hit[0]].append(name)
    print(f"{len(cases)} cases; {parse_ok} now parse clean "
          f"(error arose later)\n")
    for sig, n in sig_count.most_common(60):
        print(f"{n:5d}  {sig}")
        print(f"       e.g. {', '.join(sig_cases[sig][:4])}")


if __name__ == "__main__":
    main()
