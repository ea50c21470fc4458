"""torchrun analog: launch N local processes of any CLI with the
multi-process env wiring (core/mesh.maybe_init_distributed).

    python tools/launch_dist.py -n 2 -- python -m \
        opensearch_sparse_model_tuning_sample_tpu.cli.train_ir config.yaml

Reference: `torchrun --nproc_per_node=N train_ir.py ...`
(/root/reference/README.md:64-68). Each child gets OSSMT_COORDINATOR /
OSSMT_NUM_PROCESSES / OSSMT_PROCESS_ID; rank 0's output streams through,
other ranks' output lands in {--log-dir}/rank{i}.log. Exits non-zero if any
child fails (and terminates the rest).
"""

from __future__ import annotations

import argparse
import os
import signal
import socket
import subprocess
import sys
import time


def free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("-n", "--nproc", type=int, required=True)
    ap.add_argument("--log-dir", default=None)
    ap.add_argument("cmd", nargs=argparse.REMAINDER,
                    help="-- command to launch per process")
    args = ap.parse_args(argv)
    cmd = args.cmd[1:] if args.cmd and args.cmd[0] == "--" else args.cmd
    if not cmd:
        ap.error("no command given (use: launch_dist.py -n 2 -- python ...)")

    coord = f"127.0.0.1:{free_port()}"
    log_dir = args.log_dir or "."
    os.makedirs(log_dir, exist_ok=True)

    procs = []
    logs = []
    for r in range(args.nproc):
        env = dict(os.environ)
        env.update(
            OSSMT_COORDINATOR=coord,
            OSSMT_NUM_PROCESSES=str(args.nproc),
            OSSMT_PROCESS_ID=str(r),
        )
        if r == 0:
            procs.append(subprocess.Popen(cmd, env=env))
        else:
            f = open(os.path.join(log_dir, f"rank{r}.log"), "w")
            logs.append(f)
            procs.append(subprocess.Popen(cmd, env=env, stdout=f, stderr=f))

    # Poll ALL children: the first non-zero exit tears the rest down
    # immediately (a crashed rank otherwise leaves the survivors parked in
    # collectives/barriers and the launcher blocked on a sequential wait).
    rc = 0
    try:
        live = set(range(args.nproc))
        while live and rc == 0:
            for r in sorted(live):
                code = procs[r].poll()
                if code is not None:
                    live.discard(r)
                    if code != 0:
                        rc = code
                        print(
                            f"[launch_dist] rank {r} exited {code}; "
                            "terminating remaining ranks",
                            file=sys.stderr,
                        )
                        break
            else:
                time.sleep(0.2)
    except KeyboardInterrupt:
        rc = 130
    finally:
        for p in procs:
            if p.poll() is None:
                p.send_signal(signal.SIGTERM)
        deadline = time.monotonic() + 10.0
        for p in procs:
            if p.poll() is None:
                try:
                    p.wait(timeout=max(0.1, deadline - time.monotonic()))
                except subprocess.TimeoutExpired:
                    p.kill()
                    p.wait()
        for f in logs:
            f.close()
    return rc


if __name__ == "__main__":
    sys.exit(main())
