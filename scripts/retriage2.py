"""Targeted re-triage: run the cases in scratch/target_cases.txt with
current code, writing fresh statuses to scratch/retriage2_results.txt."""
import os
import resource
import signal
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))

LIST = os.path.join(REPO, "scratch", "target_cases.txt")
OUT = os.path.join(REPO, "scratch", "retriage2_results.txt")
PER_CASE_S = 20
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
        except BaseException as e:  # noqa: BLE001
            msg = str(e).replace("\n", " ")[:160]
            print(f"ERR  {name} {type(e).__name__}\t{msg}", flush=True)
        finally:
            signal.alarm(0)


def driver(n_workers=3, budget_s=2100):
    with open(LIST) as f:
        names = [ln.strip() for ln in f if ln.strip()]
    print(f"{len(names)} cases", flush=True)
    shards = [names[i::n_workers] for i in range(n_workers)]
    procs = []
    outf = open(OUT, "a")
    for i, shard in enumerate(shards):
        lf = os.path.join(REPO, "scratch", f"retriage2_shard_{i}.txt")
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
