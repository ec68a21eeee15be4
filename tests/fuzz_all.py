#!/usr/bin/env python
"""Nightly-grade soak entry point: run every differential fuzz harness
against the reference oracle for a total time budget and write a JSON
summary.

    python tests/fuzz_all.py --duration 600 [--out fuzz_summary.json]

Sections (the budget is split evenly across the ones that run):
  gray      -- random-geometry grayscale fuzz, host backends
               (tests/fuzz_oracle.py)
  color     -- random-geometry YUV fuzz, uint8+uint16, host + lane decoders
               (tests/fuzz_color_oracle.py)
  jax       -- fixed-geometry fuzz of the XLA pipeline (fused encoder +
               lane-batched decoder) on the CPU backend (tests/fuzz_jax.py)
  sharded   -- random-content fuzz of the sharded (multi-device) encoder
               on a virtual 8-device CPU mesh vs the host reference path
               (tests/fuzz_sharded.py)
  jax-chip  -- same harness on the attached accelerator with the pallas
               decoder; only when ICER_RUN_ONCHIP=1 (compiles are paid
               once per geometry but still cost minutes on a remote chip)

Exit status is nonzero if any section reports failures (or crashes).
Last full soak: see tests/data/fuzz_soak_last.json.
"""

import argparse
import json
import os
import re
import subprocess
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)


def run_section(name, cmd, env_extra, timeout):
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    env.update(env_extra)
    t0 = time.time()
    try:
        p = subprocess.run(cmd, cwd=REPO, env=env, capture_output=True,
                           text=True, timeout=timeout)
        out = p.stdout.strip().splitlines()
        tail = out[-1] if out else ""
        m = re.search(r"(\d+) trials, (\d+) failures", tail)
        rec = {
            "rc": p.returncode,
            "trials": int(m.group(1)) if m else None,
            "failures": int(m.group(2)) if m else None,
            "wall_s": round(time.time() - t0, 1),
        }
        if p.returncode != 0 or (m and int(m.group(2))):
            rec["stdout_tail"] = "\n".join(out[-20:])
            rec["stderr_tail"] = p.stderr[-2000:]
    except subprocess.TimeoutExpired:
        rec = {"rc": "timeout", "trials": None, "failures": None,
               "wall_s": round(time.time() - t0, 1)}
    print(f"  {name}: {rec}", flush=True)
    return rec


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--duration", type=int, default=600,
                    help="total soak budget in seconds (default 600)")
    ap.add_argument("--out", default=None,
                    help="JSON summary path (default: stdout only)")
    ap.add_argument("--seed", type=int, default=None)
    args = ap.parse_args()

    onchip = os.environ.get("ICER_RUN_ONCHIP") == "1"
    # (name, cmd, env, weight): the jax lane gets a double slice -- its
    # per-trial cost is higher than the host lanes' and the soak target
    # is >= 1000 jax trials (compiles are excluded from its clock)
    sections = [
        ("gray", [sys.executable, "tests/fuzz_oracle.py"], {}, 1),
        # color carries double weight: its per-trial cost is 3 channels +
        # two decoders and the soak target is >= 5000 color trials
        ("color", [sys.executable, "tests/fuzz_color_oracle.py"], {}, 2),
        # the sharded encoder is a default-tier production path: fuzz it
        # on a virtual CPU mesh vs the host reference path
        ("sharded", [sys.executable, "tests/fuzz_sharded.py"],
         {"JAX_PLATFORMS": "cpu"}, 1),
        # JAX_PLATFORMS=cpu keeps the CPU section independent of the
        # accelerator backend entirely (axon init hangs when the TPU
        # tunnel is down, even for CPU-device work)
        ("jax", [sys.executable, "tests/fuzz_jax.py"],
         {"ICER_FUZZ_PLATFORM": "cpu", "JAX_PLATFORMS": "cpu"}, 2),
    ]
    if onchip:
        sections.append(
            ("jax-chip", [sys.executable, "tests/fuzz_jax.py"],
             {"ICER_FUZZ_DECODE_BACKEND": "pallas",
              "ICER_FUZZ_PLATFORM": "device"}, 1))
    wsum = sum(s[3] for s in sections)
    per = max(30, args.duration // wsum)

    summary = {"started": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
               "duration_budget_s": args.duration, "sections": {}}
    print(f"fuzz_all: {len(sections)} sections x {per}s", flush=True)
    for name, cmd, env, weight in sections:
        full = cmd + [str(per * weight)]
        if args.seed is not None:
            full.append(str(args.seed))
        # generous timeout: compile time (jax sections) is outside the
        # harness's own duration accounting
        summary["sections"][name] = run_section(
            name, full, env,
            timeout=per * weight + (1200 if name in
                    ("jax", "jax-chip", "sharded") else 120))

    total_trials = sum(s["trials"] or 0 for s in summary["sections"].values())
    total_fail = sum(s["failures"] or 0 for s in summary["sections"].values())
    crashed = [n for n, s in summary["sections"].items()
               if s["rc"] not in (0,) or s["trials"] is None]
    summary["total_trials"] = total_trials
    summary["total_failures"] = total_fail
    summary["ok"] = not total_fail and not crashed
    print(json.dumps(summary))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(summary, f, indent=1)
    return 0 if summary["ok"] else 1


if __name__ == "__main__":
    sys.exit(main())
