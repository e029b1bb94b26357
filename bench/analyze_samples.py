#!/usr/bin/env python3
"""Attribute latency-tail outliers in a graft Bench samples JSONL.

For each sample: wall_s vs (proc_cpu_ms, gc_ms) decides the story —
  * gc_ms ~ wall        -> GC pause (heap/collector issue)
  * proc_cpu_ms << wall*1e3 and gc_ms small -> the JVM was starved
    (co-tenant host load / steal), not an engine defect
  * proc_cpu_ms ~ wall*cores*1e3 -> genuinely compute-bound sample
Usage: analyze_samples.py <samples.jsonl> [threshold_x_median]
"""
import json, sys, statistics

path = sys.argv[1]
thresh = float(sys.argv[2]) if len(sys.argv) > 2 else 5.0
rows = [json.loads(l) for l in open(path) if l.strip()]
samples = [r for r in rows if r.get("path") in ("index", "serve", "wand")]
by_path = {}
for r in samples:
    by_path.setdefault(r["path"], []).append(r)
for p, rs in sorted(by_path.items()):
    ws = sorted(r["wall_s"] for r in rs)
    med = statistics.median(ws)
    p99 = ws[min(len(ws) - 1, max(0, -(-99 * len(ws) // 100) - 1))]
    gc_tot = sum(r.get("gc_ms", 0) for r in rs)
    print(f"[{p}] n={len(ws)} p50={med:.3f}s p99={p99:.3f}s max={ws[-1]:.3f}s "
          f"mean={sum(ws)/len(ws):.3f}s gc_total={gc_tot}ms")
    out = [r for r in rs if r["wall_s"] > thresh * med]
    for r in sorted(out, key=lambda r: -r["wall_s"]):
        wall_ms = r["wall_s"] * 1e3
        gc, cpu = r.get("gc_ms", 0), r.get("proc_cpu_ms", 0)
        task, jt = r.get("task_cpu_ms"), r.get("java_cpu_ms")
        if gc > 0.5 * wall_ms:
            verdict = "GC-PAUSE"
        elif cpu < 0.5 * wall_ms:
            verdict = (f"CPU-STARVED (JVM got {cpu/wall_ms:.2f} cores; "
                       f"load1={r.get('load1')} — external host contention)")
        elif task is not None and task > 0.7 * cpu:
            verdict = "TASK-AMPLIFIED (the query itself did more work — engine-side)"
        elif jt is not None and cpu - jt > 0.5 * cpu:
            verdict = "NATIVE-BURN (GC concurrent mark / JIT — not java threads)"
        else:
            verdict = "DRIVER/OTHER-JAVA-THREADS"
        extra = "" if task is None else f" task={task}ms java={jt}ms"
        print(f"  OUTLIER {r['query']} rep={r['rep']} wall={r['wall_s']:.2f}s "
              f"gc={gc}ms cpu={cpu}ms{extra} heap={r.get('heap_mb')}MB "
              f"load1={r.get('load1')} t+{r.get('t_off_s')}s -> {verdict}")
    if not out:
        print(f"  no outliers above {thresh}x median")
