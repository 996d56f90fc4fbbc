"""Scaling-efficiency record: run scaling_worker at N and 4N cores
(plus 32 for transparency), repeats with min-take (the sandbox shares a
host — ambient noise only ever slows a run), assert output equality,
write BENCH/BASELINE.md.

Usage: python BENCH/run_scaling.py [n_pages] [repeats]
"""

from __future__ import annotations

import json
import shutil
import subprocess
import sys
import tempfile
from pathlib import Path

HERE = Path(__file__).resolve().parent
REPO = HERE.parent


def run_once(cores: int, n_pages: int, attempts: int = 2) -> dict:
    import os

    env = dict(os.environ)
    # dedicated workers get a roomy heap: the 9.6M-page cached universe
    # plus 8-16 concurrent build tasks overflow the 8g default
    env.setdefault("SPARK_GRAFT_DRIVER_MEM", "28g")
    last_err = ""
    for _ in range(attempts):
        state = tempfile.mkdtemp(prefix=f"scal{cores}_")
        try:
            out = subprocess.run(
                [sys.executable, str(HERE / "scaling_worker.py"), str(cores), state, str(n_pages)],
                capture_output=True, text=True, cwd=str(REPO), timeout=3600,
                env=env,
            )
            for line in out.stdout.replace("\r", "\n").splitlines():
                if line.startswith("{"):
                    return json.loads(line)
            last_err = out.stderr[-2000:]
        finally:
            shutil.rmtree(state, ignore_errors=True)
    raise RuntimeError(f"no JSON from worker ({cores} cores): {last_err}")


def main() -> None:
    n_pages = int(sys.argv[1]) if len(sys.argv) > 1 else 2_400_000
    repeats = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    results: dict[int, list[dict]] = {}
    for cores in (2, 8, 32):
        for i in range(repeats):
            r = run_once(cores, n_pages)
            results.setdefault(cores, []).append(r)
            print(f"cores={cores} run{i}: round_sec={r['round_sec']} "
                  f"urls/s={r['urls_per_sec']}", flush=True)

    best = {c: min(rs, key=lambda r: r["round_sec"]) for c, rs in results.items()}
    fps = {c: (r["fp_frontier"], r["fp_seen"]) for c, r in best.items()}
    identical = len(set(map(str, fps.values()))) == 1
    t2, t8, t32 = (best[c]["round_sec"] for c in (2, 8, 32))
    u2, u8, u32 = (best[c]["urls_per_sec"] for c in (2, 8, 32))
    eff_2_8 = round((u8 / u2) / 4, 3)
    eff_8_32 = round((u32 / u8) / 4, 3)

    doc = f"""# BENCH/BASELINE — crawl-round throughput & scaling efficiency

Measured with `BENCH/scaling_worker.py` (one full crawl round —
rank/budget → fetch join → extract/normalize/FNV → F1-F4 → dedup →
seen anti-join → all state writes + atomic commit) on a deterministic
{n_pages:,}-page universe with a {best[2]['frontier_size']:,}-URL frontier and a
pre-populated seen set.  {repeats} runs per level, min taken (the sandbox
shares a host; noise only slows runs).  The reference publishes no
numbers (BASELINE.md), so these are the record to beat.

## Two-parallelism-level protocol (sandbox stand-in for N vs 4N executors)

This VM advertises 32 vCPUs but is memory-bandwidth-bound: a pure numpy
kernel scales only ~1.7x from 8→32 Spark workers while ALU-bound
multiprocessing scales ~17x at 32 procs (see calibration note below).
The honest N→4N pair on this hardware is therefore **local[2] → local[8]**,
reported first; local[32] is included for transparency.

| cores | round wall (s) | URLs scheduled+deduped/s | URLs/s/core |
|---|---|---|---|
| 2  | {t2} | {u2:,.0f} | {u2/2:,.0f} |
| 8  | {t8} | {u8:,.0f} | {u8/8:,.0f} |
| 32 | {t32} | {u32:,.0f} | {u32/32:,.0f} |

- **scaling efficiency 2 → 8 cores (N → 4N): {eff_2_8}** (target ≥ 0.8)
- scaling efficiency 8 → 32 cores: {eff_8_32} (bandwidth-bound; see note)
- outputs **bit-identical across all levels**: {identical}
  (order-insensitive xxhash64 fingerprints of the frontier and seen
  deltas: {best[2]['fp_frontier']})
- round outputs: scheduled={best[2]['scheduled']:,} fetched={best[2]['fetched']:,}
  discovered(deduped)={best[2]['discovered']:,}

## Calibration (why 32 "cores" is not 4x of 8 here)

- raw python multiprocessing (cache-resident ALU loop): 1→8→32 procs =
  0.81s/0.98s/1.50s per unit → ~6.6x and ~17x effective parallelism
- numpy memory-streaming pandas UDF (20M rows): 2/8/32 cores =
  40.6s/13.2s/7.9s → 3.1x then 1.7x — memory bandwidth saturates near
  8 concurrent streams on this guest

On a real multi-executor cluster each executor brings its own memory
bus, so the 2→8 in-guest figure is the meaningful N→4N proxy.

## Raw runs

```json
{json.dumps({str(c): rs for c, rs in results.items()}, indent=1)}
```
"""
    (HERE / "BASELINE.md").write_text(doc)
    print(doc.split("## Raw runs")[0])
    print("WROTE", HERE / "BASELINE.md", "identical:", identical,
          "eff_2_8:", eff_2_8)


if __name__ == "__main__":
    main()
