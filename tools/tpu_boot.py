"""Register the axon TPU backend with a FINITE claim timeout.

The environment's sitecustomize registers axon with claim_timeout_s unset
(= wait forever): when the pool's previous session has not been released
yet (common right after another TPU process exits), the claim parks the
process on a futex indefinitely — the "claim deadlock" of CLAUDE.md. This
bootstrap replicates sitecustomize's registration but passes a finite
claim_timeout_s.

CAVEAT (measured, round 3): claim_timeout_s is NOT honored by this
machine's axon relay — a contended claim still parks past the timeout, so
this bootstrap does not deliver the raise-quickly behavior it was written
for. Kept as the registration template (and in case a future relay honors
it); the working discipline is tools/tpu_worker.py's claim-once job spool,
with tools/tpu_run.sh's single long deadline as the backstop.

Usage (instead of a plain `python -m pkg.cli.foo cfg.yaml`):

    env -u PALLAS_AXON_POOL_IPS python tools/tpu_boot.py -m pkg.cli.foo cfg.yaml

The -u matters: it stops sitecustomize from doing its own infinite-wait
registration first (only one registration per process wins).
"""
import os
import runpy
import sys
import uuid

os.environ["AXON_POOL_SVC_OVERRIDE"] = "127.0.0.1"
os.environ["AXON_LOOPBACK_RELAY"] = "1"
os.environ.setdefault("TPU_WORKER_HOSTNAMES", "localhost")
os.environ.setdefault("JAX_PLATFORMS", "axon")
gen = os.environ.get("PALLAS_AXON_TPU_GEN", "v5e")

from axon.register import register  # noqa: E402

register(
    None,
    f"{gen}:1x1x1",
    so_path="/opt/axon/libaxon_pjrt.so",
    session_id=str(uuid.uuid4()),
    remote_compile=os.environ.get("PALLAS_AXON_REMOTE_COMPILE", "1") == "1",
    claim_timeout_s=int(os.environ.get("TPU_CLAIM_TIMEOUT_S", "60")),
)

if __name__ == "__main__":
    argv = sys.argv[1:]
    if argv and argv[0] == "-m":
        mod, args = argv[1], argv[2:]
        sys.argv = [mod] + args
        runpy.run_module(mod, run_name="__main__", alter_sys=True)
    elif argv:
        sys.argv = argv
        runpy.run_path(argv[0], run_name="__main__")
    else:
        print("usage: tpu_boot.py (-m module | script.py) [args...]", file=sys.stderr)
        sys.exit(2)
