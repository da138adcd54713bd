"""Re-run previously-ERR'd reference cases capturing the exception MESSAGE.

Emits "TYPE<TAB>name<TAB>first line of message" so missing functions /
parse constructs can be aggregated by name instead of just by type.

Usage:  python scripts/triage_msgs.py <names-file> [out-file]
"""
import os
import resource
import signal
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))

PER_CASE_S = 10
MEM_BYTES = 16 << 30


class CaseTimeout(Exception):
    pass


def _alarm(sig, frm):
    raise CaseTimeout()


def main(listfile, outfile):
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
    resource.setrlimit(resource.RLIMIT_AS, (MEM_BYTES, MEM_BYTES))
    signal.signal(signal.SIGALRM, _alarm)
    from test_reference_compat import run_case
    with open(listfile) as f:
        names = [ln.strip() for ln in f if ln.strip()]
    out = open(outfile, "a")
    for name in names:
        try:
            signal.alarm(PER_CASE_S)
            run_case(name)
            print(f"PASS\t{name}\t", file=out, flush=True)
        except CaseTimeout:
            print(f"TIME\t{name}\t", file=out, flush=True)
        except AssertionError:
            print(f"DIFF\t{name}\t", file=out, flush=True)
        except BaseException as e:  # noqa: BLE001
            msg = str(e).split("\n")[0][:160]
            print(f"{type(e).__name__}\t{name}\t{msg}", file=out, flush=True)
        finally:
            signal.alarm(0)
    out.close()


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2] if len(sys.argv) > 2 else
         os.path.join(REPO, "scratch", "triage_msgs.txt"))
