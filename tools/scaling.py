"""Scaling-efficiency evidence (north_rule): run the SAME index build at
two parallelism levels — local[N] and local[4N] — and report throughput
at both plus efficiency = T(4N) / (4 * T(N)).

A real cluster is unavailable in this sandbox, so core count stands in
for executor count (the BASELINE.md methodology note). Each level runs
in its own subprocess because a local master is fixed per JVM.

Usage: python tools/scaling.py [N] [replicas] [sf_dir]
Writes/updates BENCH/BASELINE.md and prints one JSON line.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def window_probe() -> dict:
    """~3s host-state probe run immediately around each observation: the
    box's effective memory bandwidth and single-core compute wander by
    >10x minute-to-minute (throttling), so each build observation carries
    its own window quality instead of relying on one pre/post ceiling for
    the whole protocol. memcpy MB/s is the sensitive signal (bandwidth
    throttling hits the shuffle/sort/encode stages first)."""
    import numpy as np

    a = np.empty(3_000_000, dtype=np.float64)
    a[:] = 1.0
    a.copy()  # untimed warm-up: first copy pays allocator/page-fault cost
    t0 = time.time()
    for _ in range(4):
        a.copy()
    memcpy = 4 * a.nbytes / (time.time() - t0) / 1e6
    t0 = time.time()
    s, i = 0, 0
    while time.time() - t0 < 1.0:
        for _ in range(100_000):
            s += 1
        i += 1
    return {"memcpy_mbps": round(memcpy), "busy_loops_per_s": i}


def run_level(cores: int, replicas: int, sf_dir: str) -> dict:
    base = os.environ.get("SCALING_WORK_DIR", "/dev/shm/bm25_scaling")
    # zipf-vocab corpus by default for scaling evidence: the base
    # synthetic corpus has ~131 distinct terms, which understates the
    # sort/encode work and never engages the adaptive tail salt
    zipf = os.environ.get("BENCH_ZIPF_TOKENS", "8")
    env = dict(
        os.environ,
        SPARK_GRAFT_CPUS=str(cores),
        SPARK_GRAFT_SF_DIR=sf_dir,
        BENCH_REPLICAS=str(replicas),
        BENCH_BUILD_ONLY="1",
        BENCH_ZIPF_TOKENS=zipf,
        # replicas MUST be in the dir key: bench.py caches the synthesized
        # corpus under BENCH_INDEX_DIR + "_transcripts", so a key without
        # replicas silently reuses the previous run's corpus at a
        # different nominal replicas (round-4 diagnosis: three "different
        # size" runs all measured the same 500k-turn corpus)
        BENCH_INDEX_DIR=f"{base}/index_c{cores}_z{zipf}_r{replicas}",
        SPARK_GRAFT_LOCAL_DIR=f"{base}/local_c{cores}",
        # EQUAL fixed heap for both legs (round-5 diagnosis): a real 4N
        # cluster has 4x as many JVMs of the SAME size, not one 4x-bigger
        # JVM — and a giant single heap is actively pathological: at 32
        # cores the previous 4g/core rule allocated 128g and the
        # doc_meta stage ran 37.6s vs 9.5s at 24g (GC/ergonomics
        # artifact, measured 2026-08-21), silently destroying the hi
        # leg. 16g is the measured sweet spot for this job at every
        # level (8g spills at 8 cores: 83.8s vs 74.2s at 16g; 32g buys
        # nothing over 16g); override with SCALING_HEAP if the job
        # changes shape.
        SPARK_DRIVER_MEM=os.environ.get("SCALING_HEAP", "16g"),
    )
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        env=env, capture_output=True, text=True, cwd=REPO,
    )
    import shutil

    shutil.rmtree(env["SPARK_GRAFT_LOCAL_DIR"], ignore_errors=True)
    lines = [l for l in out.stdout.splitlines() if l.startswith("{")]
    if not lines:
        sys.stderr.write(out.stderr[-4000:])
        raise RuntimeError(f"bench.py at cores={cores} produced no JSON")
    result = json.loads(lines[-1])
    # per-stage seconds from the build manifest: shows WHERE any
    # non-scaling time lives instead of one opaque total
    mf = os.path.join(env["BENCH_INDEX_DIR"], "_manifest.json")
    try:
        with open(mf) as f:
            stages = json.load(f)["stages"]
        result["stages"] = {k: v["seconds"] for k, v in stages.items()}
    except Exception:
        result["stages"] = {}
    return result


def _burn(_: int) -> int:
    import time as _t

    t_end = _t.time() + 4
    c = 0
    while _t.time() < t_end:
        s = 0
        for i in range(100_000):
            s += i
        c += 1
    return c


def hw_parallel_ratio(n: int) -> float:
    """Measured hardware scaling ceiling from n to 4n busy processes.

    A single box cannot hold per-core conditions constant the way a real
    4x cluster does: SMT sharing and turbo-frequency scaling mean 4n
    local workers deliver LESS than 4x the aggregate compute of n
    workers even for embarrassingly parallel code. This calibrates that
    ceiling so the job's efficiency can be reported against what the
    hardware can actually express."""
    import multiprocessing as mp

    out = {}
    for k in (n, 4 * n):
        with mp.Pool(k) as p:
            out[k] = sum(p.map(_burn, range(k)))
    return out[4 * n] / out[n]


def _stream(_: int) -> int:
    """~4s of STREAM-triad-like work: bandwidth-bound, not ALU-bound."""
    import time as _t

    import numpy as np

    a = np.zeros(8_000_000)  # 64 MB per array, 3 arrays > LLC
    b = np.ones(8_000_000)
    c = np.full(8_000_000, 2.0)
    t_end = _t.time() + 4
    it = 0
    while _t.time() < t_end:
        np.add(b, c, out=a)
        a *= 1.000001
        it += 1
    return it


def hw_bandwidth_ratio(n: int) -> float:
    """Aggregate memory-bandwidth scaling ceiling from n to 4n streaming
    processes. Shuffle/sort/encode stages are bandwidth-bound, and DRAM
    bandwidth is a BOX-level resource: n workers can already saturate it,
    so 4n deliver far less than 4x — unlike a real 4x cluster, where every
    executor brings its own memory channels (both ceilings are exactly 4x
    there). A job whose measured scaling tracks this ceiling is limited by
    the box, not by its plan."""
    import multiprocessing as mp

    out = {}
    for k in (n, 4 * n):
        with mp.Pool(k) as p:
            out[k] = sum(p.map(_stream, range(k)))
    return out[4 * n] / out[n]


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    replicas = int(sys.argv[2]) if len(sys.argv) > 2 else 100
    sf_dir = sys.argv[3] if len(sys.argv) > 3 else "/root/testdata/sf0.1"

    repeats = int(os.environ.get("SCALING_REPEATS", "3"))

    hw_ratio_pre = hw_parallel_ratio(n)
    bw_ratio_pre = hw_bandwidth_ratio(n)
    # the shared host's effective capacity drifts minute-to-minute
    # (±50% per stage documented in BENCH/BASELINE.md), so each level
    # runs `repeats` times INTERLEAVED (lo, hi, lo, hi, ...) and the
    # minimum — the least-perturbed observation of the same
    # deterministic job — is what enters the efficiency ratio
    lo_runs, hi_runs = [], []
    for _ in range(repeats):
        for level, acc in ((n, lo_runs), (4 * n, hi_runs)):
            pre = window_probe()
            r = run_level(level, replicas, sf_dir)
            r["window_pre"] = pre
            r["window_post"] = window_probe()
            acc.append(r)
    # ceilings re-measured AFTER the runs: if the box drifted during the
    # window, the two measurements disagree and the window is suspect
    hw_ratio_post = hw_parallel_ratio(n)
    bw_ratio_post = hw_bandwidth_ratio(n)
    hw_ratio = max(hw_ratio_pre, hw_ratio_post)
    # the BINDING single-box ceiling for a shuffle/sort/encode job is the
    # smaller of the compute and bandwidth ceilings (both are 4x on a
    # real 4x cluster, where every executor brings its own cores AND
    # memory channels)
    bw_ratio = min(max(bw_ratio_pre, bw_ratio_post), 4.0)
    binding = min(hw_ratio, bw_ratio)
    lo = min(lo_runs, key=lambda r: r["value"])
    hi = min(hi_runs, key=lambda r: r["value"])
    t_lo = lo["turns"] / lo["value"]
    t_hi = hi["turns"] / hi["value"]
    eff = t_hi / (4.0 * t_lo)
    eff_hw = t_hi / (hw_ratio * t_lo)

    # clean-window reading: an observation's window quality is the worse
    # of its pre/post memcpy probes; observations below CLEAN_FRAC of the
    # protocol's best window are host-throttled and excluded. The clean
    # ratio is only reported when BOTH levels retain at least one clean
    # observation.
    CLEAN_FRAC = 0.6
    def wq(r):
        return min(
            r["window_pre"]["memcpy_mbps"], r["window_post"]["memcpy_mbps"]
        )
    best_w = max(wq(r) for r in lo_runs + hi_runs)
    lo_clean = [r for r in lo_runs if wq(r) >= CLEAN_FRAC * best_w]
    hi_clean = [r for r in hi_runs if wq(r) >= CLEAN_FRAC * best_w]
    eff_clean = None
    if lo_clean and hi_clean:
        lc = min(r["value"] for r in lo_clean)
        hc = min(r["value"] for r in hi_clean)
        eff_clean = round(lc / (4.0 * hc), 3)
    # stage-wise minima across repeats: the least-perturbed observation
    # of EACH deterministic stage, and its individual scaling efficiency
    stage_names = sorted(
        set().union(*(r.get("stages", {}) for r in lo_runs + hi_runs))
    )
    stage_min = {}
    for s in stage_names:
        slo = min((r["stages"][s] for r in lo_runs if s in r.get("stages", {})), default=None)
        shi = min((r["stages"][s] for r in hi_runs if s in r.get("stages", {})), default=None)
        if slo and shi:
            stage_min[s] = {
                "lo_s": slo, "hi_s": shi,
                "eff": round(slo / (4.0 * shi), 3),
                "eff_vs_hw": round(slo / (hw_ratio * shi), 3),
            }
    result = {
        "metric": "index_build_scaling_efficiency_Nx4N",
        "value": round(eff, 3),
        "unit": "ratio",
        "n_cores": n,
        "turns": lo["turns"],
        "sf_dir": sf_dir,
        "throughput_lo_tps": round(t_lo, 1),
        "throughput_hi_tps": round(t_hi, 1),
        "build_s_lo": lo["value"],
        "build_s_hi": hi["value"],
        "hw_parallel_ratio": round(hw_ratio, 2),
        "hw_parallel_ratio_pre": round(hw_ratio_pre, 2),
        "hw_parallel_ratio_post": round(hw_ratio_post, 2),
        "hw_bandwidth_ratio": round(bw_ratio, 2),
        "hw_bandwidth_ratio_pre": round(bw_ratio_pre, 2),
        "hw_bandwidth_ratio_post": round(bw_ratio_post, 2),
        "efficiency_vs_hw_ceiling": round(eff_hw, 3),
        "efficiency_vs_binding_ceiling": round(t_hi / (binding * t_lo), 3),
        "repeats": repeats,
        "build_s_lo_all": [r["value"] for r in lo_runs],
        "build_s_hi_all": [r["value"] for r in hi_runs],
        "window_lo": [
            {"s": r["value"], "pre": r["window_pre"], "post": r["window_post"]}
            for r in lo_runs
        ],
        "window_hi": [
            {"s": r["value"], "pre": r["window_pre"], "post": r["window_post"]}
            for r in hi_runs
        ],
        "efficiency_clean_window": eff_clean,
        "clean_counts": [len(lo_clean), len(hi_clean)],
        "stages_min": stage_min,
    }
    print(json.dumps(result))

    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    md = os.path.join(REPO, "BENCH", "BASELINE.md")
    stamp = time.strftime("%Y-%m-%d %H:%M UTC", time.gmtime())
    with open(md, "a") as f:
        f.write(
            f"""
## Scaling run {stamp}

Same input ({lo['turns']} turns synthesized from {sf_dir},
replicas={replicas}), same job (full index build: doc_meta -> postings
-> compressed blocks -> terms -> metrics), two parallelism levels.
local[N] cores stand in for N executors (no real cluster in sandbox);
both legs run the SAME fixed JVM heap (a real 4N cluster has 4x as many
same-size JVMs, and an oversized single heap measurably corrupts the hi
leg — see the round-5 heap note); tmpfs shuffle dirs model per-executor
local storage.

Hardware ceilings measured in the SAME window (pre/post the job runs —
a large pre/post gap flags a drifting window):
- compute (integer busy-loop): {4 * n} busy processes deliver
  {hw_ratio:.2f}x the aggregate of {n} (pre {hw_ratio_pre:.2f} /
  post {hw_ratio_post:.2f}) — SMT + turbo-frequency scaling.
- memory bandwidth (STREAM-triad numpy): {bw_ratio:.2f}x
  (pre {bw_ratio_pre:.2f} / post {bw_ratio_post:.2f}, capped at 4) —
  DRAM is a BOX-level resource shared by all local workers.
The binding ceiling for a shuffle/sort/encode job is
min(compute, bandwidth) = {binding:.2f}x. On a real 4x cluster BOTH are
exactly 4x (every executor brings its own cores and memory channels),
so this normalization models what the same job would express there.

Each level ran {repeats}x interleaved; the minimum (least host-noise
perturbation of the same deterministic job) enters the ratio. All
observations: N = {[r['value'] for r in lo_runs]} s,
4N = {[r['value'] for r in hi_runs]} s.

| level | cores | build s (min of {repeats}) | turns/sec |
| --- | --- | --- | --- |
| N | {n} | {lo['value']} | {t_lo:.1f} |
| 4N | {4 * n} | {hi['value']} | {t_hi:.1f} |

- raw efficiency T(4N)/(4*T(N)) = **{eff:.3f}**
- efficiency vs the compute ceiling = **{eff_hw:.3f}**
- efficiency vs the binding (min compute/bandwidth) ceiling =
  **{t_hi / (binding * t_lo):.3f}**
- clean-window efficiency (observations whose own pre/post memcpy
  probes reach >= 60% of the protocol's best window; excluded
  observations were host-throttled): **{eff_clean}**
  with {len(lo_clean)}/{repeats} lo and {len(hi_clean)}/{repeats} hi
  observations clean
  (north_rule target >= 0.8 — on a real 4x cluster the raw and
  ceiling-normalized numbers coincide)

Per-observation window quality (memcpy MB/s pre -> post | build s):
lo: {'; '.join(f"{r['window_pre']['memcpy_mbps']}->{r['window_post']['memcpy_mbps']} | {r['value']}" for r in lo_runs)}
hi: {'; '.join(f"{r['window_pre']['memcpy_mbps']}->{r['window_post']['memcpy_mbps']} | {r['value']}" for r in hi_runs)}

Per-stage minima across the {repeats} repeats (each stage's
least-perturbed observation at each level) and per-stage efficiency:

| stage | N s (min) | 4N s (min) | raw eff | vs hw ceiling |
| --- | --- | --- | --- | --- |
"""
            + "".join(
                f"| {s} | {v['lo_s']} | {v['hi_s']} | {v['eff']} | {v['eff_vs_hw']} |\n"
                for s, v in stage_min.items()
            )
        )


if __name__ == "__main__":
    main()
