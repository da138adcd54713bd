"""Bulk auto-triage of ALL reference stateless tests not yet in CASES.

Worker mode (--worker file): reads names from file, runs each under a
SIGALRM timeout + address-space cap, appends "PASS/DIFF/ERR name" lines to
stdout (flushed per case so a killed worker loses nothing).

Driver mode (default): shards untried names into N worker subprocesses with
an outer wall-clock timeout each, collects results into
scratch/triage_results.txt.
"""
import os
import resource
import signal
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))

REF_DIR = "/root/reference/tests/queries/0_stateless"
OUT = os.path.join(REPO, "scratch", "triage_results.txt")
PER_CASE_S = 25
MEM_BYTES = 24 << 30


class CaseTimeout(Exception):
    pass


def _alarm(sig, frm):
    raise CaseTimeout()


def worker(listfile):
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
    resource.setrlimit(resource.RLIMIT_AS, (MEM_BYTES, MEM_BYTES))
    signal.signal(signal.SIGALRM, _alarm)
    from test_reference_compat import run_case
    with open(listfile) as f:
        names = [ln.strip() for ln in f if ln.strip()]
    for name in names:
        try:
            signal.alarm(PER_CASE_S)
            run_case(name)
            print(f"PASS {name}", flush=True)
        except AssertionError:
            print(f"DIFF {name}", flush=True)
        except CaseTimeout:
            print(f"TIME {name}", flush=True)
        except BaseException as e:  # noqa: BLE001 — MemoryError etc. too
            print(f"ERR  {name} {type(e).__name__}", flush=True)
        finally:
            signal.alarm(0)


def driver(n_workers=4, budget_s=2400):
    from test_reference_compat import CASES
    done = set(CASES)
    if os.path.exists(OUT):
        with open(OUT) as f:
            for ln in f:
                parts = ln.split()
                if len(parts) >= 2:
                    done.add(parts[1])
    names = []
    for f in sorted(os.listdir(REF_DIR)):
        if not f.endswith(".sql"):
            continue
        name = f[:-4]
        if name in done:
            continue
        if not os.path.exists(os.path.join(REF_DIR, name + ".reference")):
            continue
        names.append(name)
    print(f"{len(names)} candidates to try", flush=True)
    shards = [names[i::n_workers] for i in range(n_workers)]
    procs = []
    outf = open(OUT, "a")
    for i, shard in enumerate(shards):
        lf = os.path.join(REPO, "scratch", f"triage_shard_{i}.txt")
        with open(lf, "w") as f:
            f.write("\n".join(shard))
        p = subprocess.Popen(
            ["timeout", str(budget_s), sys.executable, __file__,
             "--worker", lf],
            stdout=outf, stderr=subprocess.DEVNULL, cwd=REPO)
        procs.append(p)
    for p in procs:
        p.wait()
    outf.close()
    # summary
    from collections import Counter
    c = Counter()
    with open(OUT) as f:
        for ln in f:
            c[ln.split()[0]] += 1
    print(dict(c), flush=True)


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "--worker":
        worker(sys.argv[2])
    else:
        driver()
