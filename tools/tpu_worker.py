"""Persistent TPU job worker: claim the axon session ONCE, then execute
queued python scripts sequentially in-process.

Why: the axon pool claim can deadlock for minutes whenever a TPU process
launches after a previous one exits (the pool releases sessions lazily;
see tools/tpu_run.sh). Keeping ONE process claimed for the whole work
session removes the churn: every job runs under the worker's claim.

Protocol (filesystem spool, no deps):
  - submit:  write <name>.py into $TPU_JOB_DIR (default /tmp/tpu_jobs)
  - running: worker renames it to <name>.py.running, streams its stdout and
             stderr to <name>.log
  - done:    renames to <name>.py.done (or .failed with traceback at the
             end of the log)
  - stop:    touch $TPU_JOB_DIR/STOP
Jobs execute inside the worker via runpy.run_path in fresh __main__ globals;
they share the jax runtime (compilation cache persists across jobs — a
feature: repeat shapes skip compile).
"""
import contextlib
import io
import os
import runpy
import sys
import time
import traceback

JOB_DIR = os.environ.get("TPU_JOB_DIR", "/tmp/tpu_jobs")
os.makedirs(JOB_DIR, exist_ok=True)

# single-worker lock: two workers polling one spool race the job renames
# (measured round 5: a stale worker from a previous session grabbed a job,
# was killed, and left an orphaned .running nobody owned) — and two TPU
# claims from one box violate the one-process rule anyway. The lock is a
# pidfile: stale locks (dead pid) are broken automatically.
_lock = os.path.join(JOB_DIR, "WORKER.pid")
if os.path.exists(_lock):
    try:
        _pid = int(open(_lock).read().strip())
        os.kill(_pid, 0)  # raises if dead
        raise SystemExit(
            f"another tpu_worker (pid {_pid}) owns {JOB_DIR}; "
            "stop it first (touch STOP) or kill that pid"
        )
    except (ValueError, ProcessLookupError, PermissionError):
        pass  # stale/garbled lock: take over
with open(_lock, "w") as _f:
    _f.write(str(os.getpid()))

# a stale STOP from the previous worker would make this one pay the full
# (minutes-long) TPU claim below and then immediately exit — clear it BEFORE
# claiming: launching the worker is an explicit "run jobs" intent
try:
    os.remove(os.path.join(JOB_DIR, "STOP"))
except FileNotFoundError:
    pass

# claim at boot so the submitter can verify the worker is live
import jax  # noqa: E402
import numpy as np  # noqa: E402

t0 = time.time()
x = np.asarray(jax.numpy.arange(8) * 2)
print(f"CLAIMED devices={jax.devices()} probe={x[:3].tolist()} "
      f"in {time.time()-t0:.1f}s", flush=True)


class _Tee(io.TextIOBase):
    def __init__(self, *sinks):
        self.sinks = sinks

    def write(self, s):
        for k in self.sinks:
            k.write(s)
            k.flush()
        return len(s)

    def flush(self):
        for k in self.sinks:
            k.flush()


while True:
    if os.path.exists(os.path.join(JOB_DIR, "STOP")):
        print("STOP requested", flush=True)
        break
    jobs = sorted(f for f in os.listdir(JOB_DIR) if f.endswith(".py"))
    if not jobs:
        time.sleep(2)
        continue
    name = jobs[0]
    src = os.path.join(JOB_DIR, name)
    # require a size-stable file: the submit protocol is a plain `cp`, and
    # picking the job up mid-copy would execute truncated source
    try:
        size0 = os.path.getsize(src)
        time.sleep(0.3)
        if os.path.getsize(src) != size0 or size0 == 0:
            continue  # still being written; re-scan
    except OSError:
        continue
    running = src + ".running"
    os.rename(src, running)
    logpath = os.path.join(JOB_DIR, name[:-3] + ".log")
    print(f"RUN {name} -> {logpath}", flush=True)
    # drop cached repo modules so each job sees the CURRENT working tree:
    # jobs share this interpreter (that is the point — one TPU claim, one
    # compile cache), but without this purge a job submitted after a code
    # edit runs against the module snapshot of the FIRST job's import
    # (measured round 5: a job crashed on an IndexConfig field added to
    # engine.py twenty minutes earlier). jax/numpy stay cached.
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    for mod in list(sys.modules):
        f = getattr(sys.modules[mod], "__file__", None)
        if f and f.startswith(repo_root):
            del sys.modules[mod]
    ok = True
    import logging
    saved_handlers = list(logging.root.handlers)
    with open(logpath, "w") as lf:
        tee_out = _Tee(sys.__stdout__, lf)
        with contextlib.redirect_stdout(tee_out), contextlib.redirect_stderr(tee_out):
            # route logging handlers created by jobs to the job log too
            try:
                runpy.run_path(running, run_name="__main__")
            except SystemExit as e:
                if e.code not in (0, None):
                    ok = False
                    lf.write(f"\nSystemExit: {e.code}\n")
            except BaseException:
                ok = False
                lf.write("\n" + traceback.format_exc())
    # drop logging handlers the job installed: they hold the job's (now
    # closed) spool stream and would raise on the next job's log records
    for h in list(logging.root.handlers):
        if h not in saved_handlers:
            logging.root.removeHandler(h)
            try:
                h.close()
            except Exception:
                pass
    try:
        os.rename(running, src + (".done" if ok else ".failed"))
    except OSError as e:  # someone moved the .running file mid-run: the
        print(f"note: could not retire {running}: {e}", flush=True)
    print(f"{'DONE' if ok else 'FAILED'} {name}", flush=True)
