"""Drill into ParseError clusters: print actual messages + statements."""
import os
import re
import sys
from collections import Counter, defaultdict

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))
REF_DIR = "/root/reference/tests/queries/0_stateless"


def main():
    from test_reference_compat import split_statements
    from clickhouse_tpu.sql.parser import parse
    pat = sys.argv[1]            # regex over the raw error message
    limit = int(sys.argv[2]) if len(sys.argv) > 2 else 40
    cases = []
    with open(os.path.join(REPO, "scratch", "triage_results.txt")) as f:
        for ln in f:
            p = ln.split()
            if len(p) >= 3 and p[0] == "ERR" and p[2] == "ParseError":
                cases.append(p[1])
    msgs = Counter()
    samples = {}
    for name in cases:
        path = os.path.join(REF_DIR, name + ".sql")
        try:
            with open(path, encoding="utf-8",
                      errors="surrogateescape") as f:
                txt = f.read().replace("{CLICKHOUSE_DATABASE}", "default")
            stmts = split_statements(txt)
        except Exception as e:  # noqa: BLE001
            m = "SPLIT: " + (str(e) or type(e).__name__)
            if re.search(pat, m):
                key = re.sub(r"at position \d+", "", m)[:90]
                msgs[key] += 1
                samples.setdefault(key, (name, txt[:200]))
            continue
        for stmt_text, toks, expects_error, lo, hi in stmts:
            if expects_error:
                continue
            try:
                parse(stmt_text)
            except Exception as e:  # noqa: BLE001
                m = str(e) or type(e).__name__
                if re.search(pat, m):
                    key = re.sub(r" at \d+", "", m)[:90]
                    msgs[key] += 1
                    samples.setdefault(
                        key, (name, stmt_text.replace("\n", " ")[:220]))
                break
    for k, n in msgs.most_common(limit):
        nm, st = samples[k]
        print(f"{n:4d}  {k}\n      [{nm}] {st}")


if __name__ == "__main__":
    main()
