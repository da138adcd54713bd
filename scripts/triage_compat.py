"""Auto-triage reference stateless tests: run candidates through the compat
harness, print PASS/FAIL with the first mismatch or error.

Usage: python scripts/triage_compat.py [pattern-or-name ...]
"""
import os
import sys
import traceback

import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__))), "tests"))

from test_reference_compat import REF_DIR, run_case, CASES  # noqa: E402


def main():
    args = sys.argv[1:]
    names = []
    for a in args:
        if os.path.exists(os.path.join(REF_DIR, a + ".sql")):
            names.append(a)
        else:
            for f in sorted(os.listdir(REF_DIR)):
                if f.endswith(".sql") and a.lower() in f.lower():
                    name = f[:-4]
                    if os.path.exists(os.path.join(REF_DIR,
                                                   name + ".reference")):
                        names.append(name)
    seen = set(CASES)
    passed, failed = [], []
    for name in names:
        if name in seen:
            continue
        seen.add(name)
        try:
            run_case(name)
            passed.append(name)
            print(f"PASS {name}")
        except AssertionError as e:
            failed.append((name, "mismatch"))
            msg = str(e).split("\n")
            print(f"DIFF {name}: {' | '.join(msg[1:3])[:160]}")
        except Exception as e:
            failed.append((name, type(e).__name__))
            print(f"ERR  {name}: {type(e).__name__}: {str(e)[:140]}")
    print(f"\n{len(passed)} new passes / {len(names)} tried")
    if passed:
        print("\n".join(f'    "{n}",' for n in passed))


if __name__ == "__main__":
    main()
