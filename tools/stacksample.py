"""Sample JVM stacks of a running bench and bucket executor-thread frames.

Usage: python tools/stacksample.py <bench-cmd...>
Runs the bench command, samples `jstack` on its JVM child every ~1.5 s, and
prints (a) thread-state histogram for Executor task threads, (b) top leaf
frames of RUNNABLE executor threads — the cheap local-mode profiler used for
the PLANS.md scaling audits (no py-spy/async-profiler in the sandbox).
"""

from __future__ import annotations

import collections
import re
import subprocess
import sys
import time


def find_jvm(pid: int) -> int | None:
    out = subprocess.run(
        ["ps", "--ppid", str(pid), "-o", "pid=,comm="],
        capture_output=True, text=True,
    ).stdout
    for line in out.splitlines():
        p, comm = line.split(None, 1)
        if "java" in comm:
            return int(p)
        # python -> java can be nested one more level
        sub = find_jvm(int(p))
        if sub:
            return sub
    return None


def main() -> None:
    cmd = sys.argv[1:]
    proc = subprocess.Popen(cmd, stdout=subprocess.PIPE, stderr=subprocess.DEVNULL,
                            text=True)
    jvm = None
    states: collections.Counter[str] = collections.Counter()
    leafs: collections.Counter[str] = collections.Counter()
    waits: collections.Counter[str] = collections.Counter()
    timeline: list[tuple[float, int, int]] = []
    samples = 0
    t_start = time.perf_counter()
    while proc.poll() is None:
        if jvm is None:
            jvm = find_jvm(proc.pid)
            if jvm is None:
                time.sleep(0.5)
                continue
        try:
            dump = subprocess.run(
                ["jstack", str(jvm)], capture_output=True, text=True, timeout=20
            ).stdout
        except Exception:
            time.sleep(1.5)
            continue
        samples += 1
        run_n = wait_n = 0
        for block in dump.split("\n\n"):
            m = re.search(r'^"(Executor task launch worker[^"]*)"', block)
            if not m:
                continue
            sm = re.search(r"java.lang.Thread.State: (\S+)", block)
            state = sm.group(1) if sm else "?"
            states[state] += 1
            fm = re.search(r"\n\s+at ([^\n(]+)", block)
            frames = re.findall(r"\n\s+at ([^\n(]+)", block)
            if state == "RUNNABLE":
                run_n += 1
                if fm:
                    leafs[fm.group(1).strip()] += 1
            elif state.startswith(("TIMED_WAITING", "WAITING", "BLOCKED")):
                wait_n += 1
                # first non-jdk frame tells us WHAT is being waited on
                sig = next(
                    (f.strip() for f in frames
                     if not f.startswith(("java.", "jdk.", "sun."))),
                    frames[0].strip() if frames else "?",
                )
                waits[sig] += 1
        timeline.append((round(time.perf_counter() - t_start, 1), run_n, wait_n))
        time.sleep(1.5)
    out, _ = proc.communicate()
    print(out)
    print(f"# samples={samples}")
    print("# executor thread states:")
    for s, n in states.most_common():
        print(f"#   {s}: {n}")
    print("# top RUNNABLE leaf frames:")
    for f, n in leafs.most_common(20):
        print(f"#   {n:6d}  {f}")
    print("# top WAIT sites (first non-jdk frame):")
    for f, n in waits.most_common(20):
        print(f"#   {n:6d}  {f}")
    print("# timeline (t_sec, runnable, waiting):")
    print("#  " + " ".join(f"{t}:{r}/{w}" for t, r, w in timeline))


if __name__ == "__main__":
    main()
