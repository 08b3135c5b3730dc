#!/usr/bin/env python
"""Benchmark harness.

Default mode: times the headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS], plus the full KG
pipeline (turns/sec) at two parallelism levels (local[N] and local[4N],
via subprocesses so each gets a fresh JVM) for the north rule's scaling-
efficiency evidence. Prints progressively more complete JSON lines — one
after the headline queries, one after each completed scaling unit, and a
final complete one — so that whether the consumer parses the first or the
last JSON line, and even if the process is killed mid-protocol (round 4's
full protocol overran the driver's window and left rc=124 / no JSON at
all), a parseable result exists. The final line:

  {"metric": "...", "value": <total sec>, "unit": "sec",
   "queries": {...per-query sec...}, "sf": <sf>,
   "kg_skew": {...}, "kg_scaling": {"efficiency": ..., ...}}

The full phase runs under a wall-clock budget (--budget, default 2500 s ≈
42 min; env $SPARK_GRAFT_BENCH_BUDGET): scaling units run in priority
order (2 protected strong pairs → weak runs → CPU ceiling), each gated
on its own estimated cost against the remaining budget, with skips
recorded in kg_scaling.degraded; `--thorough` restores the round-4 full
protocol with no budget.

Subprocess mode (internal): `bench.py --phase kg --cores N` runs only the
KG pipeline and prints {"seconds": ..., "turns": ...}.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

HEADLINE = [
    "q1_pricing_summary",
    "q3_top_revenue_orders",
    "j1_broadcast_lookup",
    "j4_nearest_event",
    "j5_pair_selfjoin",
    "a1_majority_vote",
    "a2_softmax_argmax",
    "a3_interval_merge",
    "w1_ordered_reassembly",
    "sessionize",
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "ann_topk_cosine",
    "ann_lsh_bucket",
    "ann_ivf_probe",
    "text_stats",
    "text_fingerprint",
]


def _quiet_spark(*args, **kwargs):
    """get_spark with bench log hygiene: log level ERROR and console
    progress bars off. The round-4 driver tail was a flood of benign
    WindowExec warnings and stage-progress lines that buried the (in that
    round, absent) JSON evidence — bench output should be the JSON lines
    and little else."""
    from bionext_spark.session import get_spark

    extra = dict(kwargs.pop("extra_conf", None) or {})
    extra.setdefault("spark.ui.showConsoleProgress", "false")
    spark = get_spark(*args, extra_conf=extra, **kwargs)
    spark.sparkContext.setLogLevel("ERROR")
    return spark


def _materialize(df) -> int:
    try:
        df.write.format("noop").mode("overwrite").save()
        return -1
    except Exception:
        return df.count()


def _warmup_dir() -> str:
    """Small-sf twin of SF_DIR for the untimed warm-up pass."""
    cand = os.environ.get("SPARK_GRAFT_WARMUP_DIR") or SF_DIR.replace("sf0.1", "sf0.01")
    return cand if os.path.isdir(cand) else SF_DIR


def _kernel_probe(spark, rows: int, partitions: int) -> float:
    """One zero-shuffle Arrow-kernel wave (regex tokenization over
    synthesized strings — the same work *kind* as the engine's kernel
    stages, none of its code) in THIS session's JVM; returns seconds.
    Used as the per-run contemporaneous box-speed probe: a VM episode
    that slows the pipeline run also slows its probe, so per-pair
    probe-normalized ratios stay stable under cross-run box drift."""
    import re

    import pandas as pd
    from pyspark.sql import functions as F

    def gen(batches):
        pat = re.compile(r"\w+|[^\w\s]")
        for pdf in batches:
            texts = (
                "row " + pdf["id"].astype(str)
                + " the quick brown biomedical fox discussed tp53 with aspirin in hela cells"
            )
            n = sum(len(pat.findall(t)) for t in texts)
            yield pd.DataFrame({"n": [n]})

    t0 = time.time()
    spark.range(rows, numPartitions=partitions).mapInPandas(gen, "n long").agg(
        F.sum("n")
    ).collect()
    return time.time() - t0


# Probe-leg note (measured, kept for the record): a JVM leg shaped like
# `range → hash project → full-data repartition → codegen agg` scales
# 0.51 from 4→16 slots on this box (worse than the 0.63-0.65 Python-
# kernel wave), but sized to the PIPELINE's honest shuffle intensity
# (~2 GB per ~1,100 JVM core-s) a JVM leg is compute-dominated and
# scales ~0.8+ — blending it in would RAISE the measured ceiling and
# flatter the normalized ratio only if the shuffle were overweighted.
# The kernel-only probe stays: it is the shape of the pipeline's hot
# stages (Arrow-batched Python kernels) and the conservative choice.


def _task_work(log_dir: str, windows: list[tuple[float, float]], cores: int) -> dict:
    """Task-level work accounting from this run's own Spark event log.

    For each timed rep window: the sum of task durations (core-seconds of
    actual task execution) and the mean task-slot utilization. These feed
    the pair's WORK-normalized efficiency: on this shared box the same
    logical work costs more core-seconds per task as active threads grow
    (frequency/memory-bandwidth are fixed while slots scale), which a real
    4N-executor cluster — whose per-executor silicon is constant — never
    pays.

    Accounting rules (each closes a round-4 ADVICE item):
    - only successful, non-speculative task attempts count — a side with
      retries or speculative duplicates would otherwise get inflated
      core-seconds, inflating that pair's normalized efficiency;
    - a task straddling a window boundary contributes its OVERLAP seconds
      (clipped), not all-or-nothing with fudge margins — probe-wave tasks
      launched after a rep ends get zero overlap and are excluded exactly;
    - alongside gross duration, a NET duration subtracts the task's own
      'JVM GC Time' and shuffle-write time (pro-rata for clipped tasks):
      GC pauses and write stalls at higher parallelism are partly the
      ENGINE's doing (heap pressure, shuffle volume), so leaving them in
      the inflation would launder engine-caused slowdown into the box
      charge. The net-based inflation is the conservative one the
      work-normalized headline uses; the gross value stays on record
      (raw_eff × gross inflation ≡ the utilization ratio u_4N/u_N)."""
    from bionext_spark.sparklog import iter_task_end

    spans: list[tuple[float, float, float]] = []  # (start, finish, overhead)
    for ev in iter_task_end(log_dir):
        reason = (ev.get("Task End Reason") or {}).get("Reason")
        ti = ev.get("Task Info") or {}
        if reason != "Success" or ti.get("Speculative"):
            continue
        s, f = ti.get("Launch Time"), ti.get("Finish Time")
        if not (s and f and f > s):
            continue
        tm = ev.get("Task Metrics") or {}
        gc_sec = (tm.get("JVM GC Time") or 0) / 1e3
        sw_sec = ((tm.get("Shuffle Write Metrics") or {}).get("Shuffle Write Time") or 0) / 1e9
        spans.append((s / 1e3, f / 1e3, gc_sec + sw_sec))
    task_sec, task_sec_net, util = [], [], []
    for (t0, t1) in windows:
        w = w_net = 0.0
        for s, f, ovh in spans:
            ov = min(f, t1) - max(s, t0)
            if ov <= 0:
                continue
            w += ov
            w_net += ov - ovh * (ov / (f - s))
        task_sec.append(round(w, 1))
        task_sec_net.append(round(w_net, 1))
        util.append(round(w / (cores * max(t1 - t0, 1e-9)), 4))
    return {"task_sec": task_sec, "task_sec_net": task_sec_net, "util": util}


def run_kg(cores: int, replicate: int = 1, warmup: bool = True, probe_rows: int = 0,
           reps: int = 1, max_reps: int = 0, rep_tol: float = 0.04,
           deadline_ts: float = 0.0) -> dict:
    """One KG pipeline run in this process's fresh JVM.

    ``warmup`` first runs the SAME pipeline untimed on the small-sf twin
    input: python workers spawn, whole-stage codegen compiles, Arrow/JVM
    JIT warm, and the session-memoized linker side data builds. The timed
    run then measures STEADY-STATE throughput — the regime a 10^12-turn
    job lives in (hours of runtime; per-session constants amortize to
    zero) and the quantity the north rule's scaling efficiency is about.
    Cold numbers (warmup=False) remain available via --cold and are
    reported alongside in BENCH/BASELINE.md.

    ``probe_rows`` > 0 brackets each timed section with kernel-probe
    waves (see _kernel_probe) and reports their mean as probe_seconds —
    the run's own contemporaneous box-speed measurement.

    ``reps`` > 1 times the identical pipeline section that many times in
    THIS warm JVM and reports the fastest (every rep recorded). VM noise
    is one-sided — a contending neighbor only ever ADDS time — so the
    within-JVM min estimates the box's uncontended steady-state rate; the
    r3→r4 single-shot sections were the residual variance source (a VM
    episode inside one 73–226 s section moved that pair's ratio ±0.15
    while its bracketing probes stayed fast). The rep count is ADAPTIVE:
    after ``reps`` base reps, while the two fastest disagree by more than
    ``rep_tol`` (4%) up to ``max_reps`` total run — a convergence
    criterion applied identically to both sides of every ratio, so it
    tightens the estimate without biasing the ratio. probe_seconds is
    likewise the MIN over all probe waves in this JVM (waves bracket
    every rep; episodes only inflate a wave), the same uncontended-rate
    estimator applied to the box-speed side of the normalization; every
    rep and wave is recorded."""
    import tempfile

    from bionext_spark.flagship import run_kg_pipeline

    # Heap scales with core count (override with $SPARK_DRIVER_MEM): the
    # north rule's cluster brings 4N executors with FIXED per-executor
    # memory, i.e. 4× aggregate heap at 4N — a fixed local heap instead
    # starves the 4N (and especially the weak 4N × 4×-data) runs into GC
    # storms the real cluster would never see (GCLocker retry warnings
    # and a >2×-inflated probe were measured on the weak point at 8g).
    mem = os.environ.get("SPARK_DRIVER_MEM") or f"{max(8, (cores * 3) // 2)}g"
    # event log: task-level work accounting for the run's own
    # normalization (see the task_core_seconds fields below)
    log_dir = tempfile.mkdtemp(prefix="bench-kg-events-")
    spark = _quiet_spark(
        f"bench-kg-{cores}", cores=cores, shuffle_partitions=max(cores, 8),
        extra_conf={
            "spark.driver.memory": mem,
            "spark.eventLog.enabled": "true",
            "spark.eventLog.compress": "false",
            "spark.eventLog.dir": f"file://{log_dir}",
        },
    )
    out: dict = {}
    waves: list[float] = []
    rep_secs: list[float] = []
    rep_windows: list[tuple[float, float]] = []
    # try/finally: an exception mid-rep must not leak the SparkSession or
    # the event-log tempdir (ADVICE r4) — and the reps already timed still
    # get reported by the caller's stdout-line parse if we re-raise after
    # cleanup (we don't: a failed run IS a failed run; cleanup only).
    try:
        turns = spark.read.parquet(f"{SF_DIR}/events.parquet").count() * replicate
        if warmup:
            _materialize(run_kg_pipeline(spark, _warmup_dir(), 1))
        if probe_rows:
            # tiny warm wave first so worker spawn / regex compile / codegen
            # never land in a probe (the pipeline warmup does not exercise
            # the probe functions)
            _kernel_probe(spark, max(probe_rows // 100, 1), cores)
            waves.append(_kernel_probe(spark, probe_rows, cores * 4))

        def one_rep() -> None:
            t0 = time.time()
            triples = run_kg_pipeline(spark, SF_DIR, replicate)
            _materialize(triples)
            t1 = time.time()
            rep_secs.append(t1 - t0)
            rep_windows.append((t0, t1))
            if probe_rows:
                waves.append(_kernel_probe(spark, probe_rows, cores * 4))

        def past_deadline() -> bool:
            # a rep that would land past the caller's wall-clock deadline is
            # skipped — the round-4 full protocol overran the driver's bench
            # window and recorded NOTHING; a shorter min-of-reps estimate
            # beats a timeout on both sides of the ratio equally.
            if not deadline_ts or not rep_secs:
                return False
            return time.time() + min(rep_secs) > deadline_ts

        one_rep()
        for _ in range(max(1, reps) - 1):
            if past_deadline():
                break
            one_rep()
        # adaptive convergence: while the two fastest reps disagree by more
        # than rep_tol, add reps up to max_reps (same rule on both sides of
        # every ratio — tightens the min estimate, does not bias the ratio).
        # --reps 1 --max-reps K seeds the required second rep instead of
        # silently doing single-shot timing (ADVICE r4: the old guard
        # `max_reps > len >= 2` never fired at reps=1).
        if max_reps >= 2 and len(rep_secs) == 1 and not past_deadline():
            one_rep()
        while max_reps > len(rep_secs) >= 2:
            a, b = sorted(rep_secs)[:2]
            if (b - a) / a <= rep_tol or past_deadline():
                break
            one_rep()
        best = min(range(len(rep_secs)), key=lambda i: rep_secs[i])
        out.update({"seconds": rep_secs[best], "turns": turns})
        if len(rep_secs) > 1:
            out["seconds_reps"] = [round(x, 1) for x in rep_secs]
        try:
            work = _task_work(log_dir, rep_windows, cores)
            out["task_core_seconds"] = work["task_sec"][best]
            out["task_core_seconds_reps"] = work["task_sec"]
            out["task_core_seconds_net"] = work["task_sec_net"][best]
            out["task_core_seconds_net_reps"] = work["task_sec_net"]
            out["utilization"] = work["util"][best]
            out["utilization_reps"] = work["util"]
        except Exception as e:  # timing stands alone, but never silently:
            # a parsing regression here would shrink the work-normalized
            # gate evidence without a trace (ADVICE r4)
            print(f"WARN bench: task-work accounting failed: {e!r}", file=sys.stderr)
        if probe_rows:
            out["probe_pre"] = waves[best]
            out["probe_post"] = waves[best + 1]
            # min over ALL waves in this JVM: the uncontended-box-rate
            # estimator, same shape as the pipeline min above
            out["probe_seconds"] = min(waves)
            out["probe_rows"] = probe_rows
            out["probe_waves"] = [round(x, 2) for x in waves]
    finally:
        import shutil

        try:
            spark.stop()
        finally:
            shutil.rmtree(log_dir, ignore_errors=True)
    return out


def run_queries(n_runs: int = 3) -> tuple[dict[str, float], dict[str, list[float]], float]:
    """Headline suite, best-of-``n_runs`` per query with every run recorded
    (VERDICT r3: single-shot timings on a ±30% shared VM made per-query
    regressions unattributable — spreads make them so). Runs interleave
    whole passes (pass 1 all queries, pass 2 all queries, ...) so one slow
    VM episode cannot depress a single query's every sample."""
    from bionext_spark.corpus_queries import CORPUS
    from bionext_spark.entry_queries import RELATIONAL

    registry = {**RELATIONAL, **CORPUS}
    spark = _quiet_spark("bench-queries", cores=CPUS, shuffle_partitions=max(CPUS, 8))
    # untimed warmup: JVM JIT, codegen, Arrow, parquet footers + OS page
    # cache for the big tables — otherwise the first query (q1) absorbs
    # ~3s of session warmup that belongs to no query
    for name in ("lineitem", "orders", "events", "documents"):
        spark.read.parquet(f"{SF_DIR}/{name}.parquet").count()
    runs: dict[str, list[float]] = {name: [] for name in HEADLINE}
    for _ in range(n_runs):
        for name in HEADLINE:
            fn, _ = registry[name]
            t0 = time.time()
            _materialize(fn(spark, SF_DIR))
            runs[name].append(round(time.time() - t0, 3))
    spark.stop()
    times = {name: min(rs) for name, rs in runs.items()}
    return times, runs, sum(times.values())


def run_ceiling(cores: int, rows: int = 40_000_000_000) -> dict:
    """Zero-shuffle pure-codegen Spark aggregation at ``cores`` — the
    same-framework upper bound for N→4N scaling on this VM. No shuffle, no
    python workers, one wave of equal tasks: anything below 1.0 here is
    the machine (all-core frequency scaling / memory bandwidth / shared
    JVM), not the engine. Measured 0.816 on this box — matching the
    round-1 python busy-loop (0.81)."""
    from pyspark.sql import functions as F

    spark = _quiet_spark(f"bench-ceiling-{cores}", cores=cores)
    spark.range(100_000_000).select(F.avg(F.xxhash64("id"))).collect()  # warmup
    t0 = time.time()
    spark.range(rows, numPartitions=cores * 8).select(F.avg(F.xxhash64("id"))).collect()
    dt = time.time() - t0
    spark.stop()
    return {"seconds": dt, "rows": rows}


def run_kernel_ceiling(cores: int, rows: int = 48_000_000) -> dict:
    """Arrow-kernel analog of run_ceiling: a zero-shuffle mapInPandas job
    (regex tokenization over synthesized strings — the same work *kind* as
    the engine's kernel stages, with none of its code) in one wave of
    equal tasks. The pure-JVM ceiling leaves every Python worker idle, so
    it understates what this box charges a kernel-heavy pipeline for going
    N→4N: each added task slot activates a JVM task thread AND a Python
    worker on fixed shared silicon. Anything below 1.0 here is the
    machine, not the engine."""
    spark = _quiet_spark(f"bench-kernel-ceiling-{cores}", cores=cores)
    _kernel_probe(spark, 100_000, cores)  # warmup: workers spawn, regex compiles
    dt = _kernel_probe(spark, rows, cores * 4)
    spark.stop()
    return {"seconds": dt, "rows": rows}


def measure_cpu_ceiling(n: int, n_runs: int = 3, phase: str = "ceiling") -> dict:
    """N→4N ceiling = thr(4N)/(4×thr(N)) of a zero-shuffle Spark job
    (``phase`` = 'ceiling' for the pure-JVM aggregation, 'kernel-ceiling'
    for the Arrow/Python-kernel analog), each core count in a fresh
    subprocess JVM (same protocol as the KG scaling runs). Returns the
    ratio plus all per-run seconds so the spread is on record."""
    times, all_runs = {}, {}
    for cores in (n, 4 * n):
        runs = []
        for _ in range(n_runs):
            proc = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--phase", phase,
                 "--cores", str(cores)],
                capture_output=True, text=True,
                cwd=os.path.dirname(os.path.abspath(__file__)),
            )
            line = [l for l in proc.stdout.strip().splitlines() if l.startswith("{")][-1]
            runs.append(json.loads(line)["seconds"])
        times[cores] = min(runs)
        all_runs[cores] = [round(x, 1) for x in runs]
    return {
        "ceiling": round(times[n] / (4.0 * times[4 * n]), 3),
        "runs_n": all_runs[n],
        "runs_4n": all_runs[4 * n],
    }


def run_skew(cores: int = CPUS, skew_turns: int = 2_000_000, n_normal: int = 2000) -> dict:
    """North-rule skew evidence: one pathological conversation (skew_turns
    turns) among normal ones; the salted two-phase assembly
    (assemble_conversations(segment_size=...)) must bound the
    single-reducer tail on the skewed conversation, with identical output.

    Evidence is BOTH wall time and, from the session's event log, the MAX
    task duration per variant — the single-reducer tail is a task-level
    phenomenon, so max-task-time shows the mechanism directly even when a
    fast box hides it in wall terms (round-2's 200k-turn case finished in
    0.89s either way and proved nothing)."""
    import tempfile as _tf
    import time as _t

    from pyspark.sql import functions as F

    from bionext_spark.operators.assemble import assemble_conversations

    log_dir = _tf.mkdtemp(prefix="skew-events-")
    spark = _quiet_spark(
        f"bench-skew-{cores}", cores=cores, shuffle_partitions=max(cores, 8),
        extra_conf={
            "spark.eventLog.enabled": "true",
            "spark.eventLog.compress": "false",
            "spark.eventLog.dir": f"file://{log_dir}",
        },
    )
    filler = "the quick brown biomedical fox discussed tp53 with aspirin "
    big = spark.range(skew_turns).select(
        F.lit("conv_big").alias("conv_id"),
        F.col("id").cast("int").alias("turn_idx"),
        F.concat(F.lit(filler), F.col("id").cast("string")).alias("text"),
    )
    normal = spark.range(n_normal * 20).select(
        F.concat(F.lit("c"), (F.col("id") / 20).cast("long")).alias("conv_id"),
        (F.col("id") % 20).cast("int").alias("turn_idx"),
        F.concat(F.lit(filler), F.col("id").cast("string")).alias("text"),
    )
    t = big.unionByName(normal).localCheckpoint()
    out = {"skew_turns": skew_turns, "n_normal_convs": n_normal, "cores": cores}
    sums = {}
    windows = {}
    for label, seg in (("unsalted", 0), ("salted", 128)):
        t0 = _t.time()
        df = assemble_conversations(t, segment_size=seg)
        row = df.agg(
            F.sum(F.crc32(F.col("doc_text"))).alias("crc"), F.sum("n_turns").alias("nt")
        ).collect()[0]
        out[f"seconds_{label}"] = round(_t.time() - t0, 2)
        windows[label] = (t0 * 1e3, _t.time() * 1e3)
        sums[label] = (row["crc"], row["nt"])
    out["outputs_identical"] = sums["unsalted"] == sums["salted"]
    spark.stop()
    # attribute each task to its variant by launch-time window; the tail
    # IS the max task
    try:
        from bionext_spark.sparklog import iter_task_end

        maxes = {k: 0.0 for k in windows}
        for ev in iter_task_end(log_dir):
            ti = ev.get("Task Info", {})
            launch = ti.get("Launch Time", 0)
            dur = (ti.get("Finish Time", 0) - launch) / 1e3
            for k, (lo, hi) in windows.items():
                if lo <= launch <= hi:
                    maxes[k] = max(maxes[k], dur)
        for k, v in maxes.items():
            out[f"max_task_seconds_{k}"] = round(v, 2)
    except Exception:  # pragma: no cover - evidence is best-effort
        pass
    return out


def _median(xs: list[float]) -> float:
    s = sorted(xs)
    m = len(s) // 2
    return s[m] if len(s) % 2 else (s[m - 1] + s[m]) / 2.0


def scaling_evidence(
    n: int,
    replicate: int,
    n_runs: int = 2,
    cold: bool = False,
    weak_n: int = 1,
    probe_rows: int = 8_000_000,
    reps: int = 2,
    max_reps: int = 2,
    ceiling_runs: int = 2,
    budget_left=None,
    emit=None,
) -> dict:
    """North-rule scaling evidence: the SAME job on the SAME input at N and
    4N cores, in fresh subprocess JVMs (each warmed on the small-sf twin
    before its timed section — see run_kg). The 4N point is sized so JVM
    task threads plus Arrow Python kernel workers together stay within
    half the machine (executors on a real cluster each get their own
    CPUs): every task slot activates one JVM thread AND one Python
    worker, so 4N=8 means 16 active threads on the 32-CPU box. The old
    4N=16 point activated all 32 and measured box saturation, not the
    engine (raw 0.492 / normalized 0.612 at 4/16 vs 0.72 / 0.99 at 2/8,
    same code). The replicated input makes steady-state compute dominate
    what remains of the fixed per-plan cost. Runs are PAIRED (see below);
    ALL per-run seconds are recorded.

    BUDGET (the round-4 lesson): the full round-4 protocol overran the
    driver's bench window and the driver recorded NOTHING (BENCH_r04
    rc=124, parsed null) — worse evidence than any degraded run. So this
    function (a) emits a summary via ``emit`` after EVERY completed unit
    (pair / weak run / ceiling), letting the caller print progressively
    more complete JSON lines, and (b) consults ``budget_left()`` before
    starting each unit, using the measured wall of the previous same-shape
    unit as the cost estimate; units that don't fit are skipped and named
    in ``degraded``. Units run in priority order — strong pairs (the
    first 2 are protected and always run), then weak runs, then the CPU
    ceiling — each gated on its own cost, so a cheap late unit (ceiling)
    can still fit after an expensive one (weak) was skipped.
    Subprocesses also get an absolute ``--deadline-ts`` so a slow box
    can't stretch a unit past the window via extra reps."""

    def one(cores: int, rep: int, p_rows: int, deadline: float) -> dict:
        cmd = [
            sys.executable, os.path.abspath(__file__), "--phase", "kg",
            "--cores", str(cores), "--replicate", str(rep),
            "--probe-rows", str(p_rows), "--reps", str(reps),
            "--max-reps", str(max_reps),
        ]
        if cold:
            cmd.append("--cold")
        if deadline:
            cmd += ["--deadline-ts", str(deadline)]
        proc = subprocess.run(
            cmd, capture_output=True, text=True,
            cwd=os.path.dirname(os.path.abspath(__file__)),
        )
        lines = [l for l in proc.stdout.strip().splitlines() if l.startswith("{")]
        if not lines:
            raise RuntimeError(
                f"kg subprocess (cores={cores}) produced no JSON; "
                f"stderr tail: {proc.stderr[-500:]}"
            )
        return json.loads(lines[-1])

    def deadline() -> float:
        return time.time() + budget_left() - 20 if budget_left else 0.0

    def fits(est: float) -> bool:
        return budget_left is None or budget_left() > est * 1.15 + 30

    # PAIRED protocol (VERDICT r3: sequential best-of-3 per point did not
    # tame cross-session VM drift — a slow episode hitting only one side
    # swings the best-vs-best ratio ±0.1). Each round runs N then 4N
    # back-to-back so both sides share the same box state; efficiency is
    # computed PER PAIR and the median/worst of the pair ratios is
    # reported — the headline number is the median pair, the gate evidence
    # is the worst pair.
    out: dict = {
        "replicate": replicate,
        "runs_per_point": n_runs,
        "protocol": "cold-paired" if cold else "warm-paired",
        "cores_n": n,
        "cores_4n": 4 * n,
        "degraded": [],
    }
    runs_n: list[dict] = []
    runs_4n: list[dict] = []
    weak_runs: list[dict] = []

    def _work(r: dict):
        # net = gross minus the task's own GC + shuffle-write stalls
        # (ADVICE r4: leaving engine-caused overheads in the inflation
        # launders engine slowdown into the box charge). Headline uses
        # net; gross stays on record with the u_4N/u_N identity.
        return r.get("task_core_seconds_net") or r.get("task_core_seconds")

    def summarize() -> None:
        pair_eff, pair_ceil, pair_eff_norm = [], [], []
        pair_infl, pair_eff_work = [], []
        pair_infl_g, pair_eff_work_g = [], []
        for rn, r4 in zip(runs_n, runs_4n):
            e = round(rn["seconds"] / (4.0 * r4["seconds"]), 3)
            pair_eff.append(e)
            if rn.get("probe_seconds") and r4.get("probe_seconds"):
                # the pair's OWN box bound, measured inside the same two
                # JVMs that produced the pair's pipeline times: a VM
                # episode that slows one side's run slows its probe too,
                # so the normalized ratio isolates the ENGINE's scaling
                # from box drift.
                c = round(rn["probe_seconds"] / (4.0 * r4["probe_seconds"]), 3)
                pair_ceil.append(c)
                pair_eff_norm.append(round(e / c, 3))
            if _work(rn) and _work(r4):
                i_net = round(_work(r4) / _work(rn), 3)
                pair_infl.append(i_net)
                pair_eff_work.append(round(e * i_net, 3))
            if rn.get("task_core_seconds") and r4.get("task_core_seconds"):
                i_g = round(r4["task_core_seconds"] / rn["task_core_seconds"], 3)
                pair_infl_g.append(i_g)
                pair_eff_work_g.append(round(e * i_g, 3))
        if not pair_eff:
            return
        best_n = min(runs_n, key=lambda x: x["seconds"])
        best_4n = min(runs_4n, key=lambda x: x["seconds"])
        out["seconds_n"] = round(_median([r["seconds"] for r in runs_n]), 3)
        out["seconds_n_runs"] = [round(x["seconds"], 1) for x in runs_n]
        out["seconds_4n"] = round(_median([r["seconds"] for r in runs_4n]), 3)
        out["seconds_4n_runs"] = [round(x["seconds"], 1) for x in runs_4n]
        if any("seconds_reps" in r for r in runs_n):
            out["reps_per_run"] = max(len(r.get("seconds_reps", [1])) for r in runs_n)
            out["seconds_n_all_reps"] = [r.get("seconds_reps") for r in runs_n]
            out["seconds_4n_all_reps"] = [r.get("seconds_reps") for r in runs_4n]
        out["turns"] = best_n["turns"]
        out["turns_per_sec_n"] = round(best_n["turns"] / best_n["seconds"], 1)
        out["turns_per_sec_4n"] = round(best_4n["turns"] / best_4n["seconds"], 1)
        out["pair_efficiencies"] = pair_eff
        out["efficiency"] = round(_median(pair_eff), 3)
        out["efficiency_worst_pair"] = min(pair_eff)
        out["efficiency_best_pair"] = max(pair_eff)
        if pair_eff_norm:
            out["probe_rows"] = runs_n[0].get("probe_rows")
            out["probe_seconds_n_runs"] = [
                round(r.get("probe_seconds", 0), 2) for r in runs_n
            ]
            out["probe_seconds_4n_runs"] = [
                round(r.get("probe_seconds", 0), 2) for r in runs_4n
            ]
            out["pair_probe_ceilings"] = pair_ceil
            out["pair_efficiencies_probe_normalized"] = pair_eff_norm
            out["efficiency_probe_normalized"] = round(_median(pair_eff_norm), 3)
            out["efficiency_probe_normalized_worst_pair"] = min(pair_eff_norm)
            # the Arrow-kernel ceiling is measured per-pair inside the
            # runs themselves; expose the median as kernel_ceiling for
            # round-over-round continuity.
            out["kernel_ceiling"] = round(_median(pair_ceil), 3)
            out["efficiency_normalized_kernel"] = out["efficiency_probe_normalized"]
            out["efficiency_normalized_kernel_worst_pair"] = out[
                "efficiency_probe_normalized_worst_pair"
            ]
        if pair_eff_work:
            out["task_core_seconds_n_runs"] = [r.get("task_core_seconds") for r in runs_n]
            out["task_core_seconds_4n_runs"] = [r.get("task_core_seconds") for r in runs_4n]
            out["task_core_seconds_net_n_runs"] = [
                r.get("task_core_seconds_net") for r in runs_n
            ]
            out["task_core_seconds_net_4n_runs"] = [
                r.get("task_core_seconds_net") for r in runs_4n
            ]
            out["utilization_n_runs"] = [r.get("utilization") for r in runs_n]
            out["utilization_4n_runs"] = [r.get("utilization") for r in runs_4n]
            out["pair_cpu_inflations"] = pair_infl
            out["pair_efficiencies_work_normalized"] = pair_eff_work
            out["efficiency_work_normalized"] = round(_median(pair_eff_work), 3)
            out["efficiency_work_normalized_worst_pair"] = min(pair_eff_work)
        if pair_eff_work_g:
            out["pair_cpu_inflations_gross"] = pair_infl_g
            out["pair_efficiencies_work_normalized_gross"] = pair_eff_work_g
            out["efficiency_work_normalized_gross"] = round(_median(pair_eff_work_g), 3)
            out["efficiency_work_normalized_gross_worst_pair"] = min(pair_eff_work_g)
        # weak runs: weak run i pairs with the N run of pair i counted
        # from the END (the weak run executes right after the last pair,
        # so the most recent N run shares the closest box state).
        weak_eff, weak_ceil, weak_eff_norm = [], [], []
        weak_infl, weak_eff_work = [], []
        for i, w in enumerate(weak_runs):
            rn = runs_n[-(1 + i)] if i < len(runs_n) else runs_n[0]
            e = round(rn["seconds"] / w["seconds"], 3)
            weak_eff.append(e)
            if rn.get("probe_seconds") and w.get("probe_seconds"):
                wc = round(rn["probe_seconds"] / w["probe_seconds"], 3)
                weak_ceil.append(wc)
                weak_eff_norm.append(round(e / wc, 3))
            if _work(rn) and _work(w):
                wi = round(_work(w) / (4.0 * _work(rn)), 3)
                weak_infl.append(wi)
                weak_eff_work.append(round(e * wi, 3))
        if weak_eff:
            out["weak_seconds_4n_4x"] = round(
                _median([w["seconds"] for w in weak_runs]), 3
            )
            out["weak_seconds_4n_4x_runs"] = [round(x["seconds"], 1) for x in weak_runs]
            if any("seconds_reps" in w for w in weak_runs):
                out["weak_seconds_all_reps"] = [w.get("seconds_reps") for w in weak_runs]
            out["weak_turns_4x"] = weak_runs[0]["turns"]
            out["weak_pair_efficiencies"] = weak_eff
            out["weak_efficiency"] = round(_median(weak_eff), 3)
            out["weak_efficiency_worst_pair"] = min(weak_eff)
            if weak_eff_norm:
                out["probe_seconds_weak_runs"] = [
                    round(w.get("probe_seconds", 0), 2) for w in weak_runs
                ]
                out["weak_pair_probe_ceilings"] = weak_ceil
                out["weak_pair_efficiencies_probe_normalized"] = weak_eff_norm
                out["weak_efficiency_probe_normalized"] = round(
                    _median(weak_eff_norm), 3
                )
                out["weak_efficiency_probe_normalized_worst_pair"] = min(weak_eff_norm)
            if weak_eff_work:
                out["weak_task_core_seconds_runs"] = [
                    w.get("task_core_seconds") for w in weak_runs
                ]
                out["weak_pair_cpu_inflations"] = weak_infl
                out["weak_pair_efficiencies_work_normalized"] = weak_eff_work
                out["weak_efficiency_work_normalized"] = round(
                    _median(weak_eff_work), 3
                )
                out["weak_efficiency_work_normalized_worst_pair"] = min(weak_eff_work)

    walls: dict[str, float] = {}  # measured wall of the last unit per kind

    def timed(kind: str, fn):
        t0 = time.time()
        r = fn()
        walls[kind] = time.time() - t0
        return r

    # --- strong pairs (protected core: the first 2 always run) ---
    for i in range(n_runs):
        est = walls.get("n", 0) + walls.get("4n", 0)
        if i >= 2 and not fits(est):
            out["degraded"].append(
                f"pair{i + 1}: skipped (est {est:.0f}s > budget)"
            )
            break
        runs_n.append(timed("n", lambda: one(n, replicate, probe_rows, deadline())))
        runs_4n.append(timed("4n", lambda: one(4 * n, replicate, probe_rows, deadline())))
        summarize()
        if emit:
            emit(out)
    # --- weak runs: 4N cores on 4× the data vs N cores on 1× (ideal =
    # equal wall). The weak probe runs 4× the rows at 4N cores, so the
    # probe ratio is the weak-regime box bound. Both sides of the weak
    # ratio are min-of-reps — a single-shot weak side against a
    # min-of-reps N side would bias the ratio down. ---
    for i in range(weak_n):
        est = walls.get("weak", walls.get("n", 300) * 1.4)
        if not fits(est):
            out["degraded"].append(f"weak{i + 1}: skipped (est {est:.0f}s > budget)")
            break
        weak_runs.append(
            timed("weak", lambda: one(4 * n, 4 * replicate, 4 * probe_rows, deadline()))
        )
        summarize()
        if emit:
            emit(out)
    # --- same-run CPU ceiling (legacy pure-JVM normalization; lowest
    # evidence value, dropped first): zero-shuffle codegen aggregation at
    # N vs 4N in fresh JVMs. The representative Arrow-kernel bound is
    # already measured per-pair inside the runs (pair_probe_ceilings). ---
    est = walls.get("ceiling", 60.0 * 2 * ceiling_runs)
    if fits(est):
        try:
            c = timed("ceiling", lambda: measure_cpu_ceiling(n, ceiling_runs))
            out["cpu_ceiling"] = c["ceiling"]
            out["cpu_ceiling_runs_n"] = c["runs_n"]
            out["cpu_ceiling_runs_4n"] = c["runs_4n"]
            if "efficiency" in out:
                out["efficiency_normalized"] = round(
                    out["efficiency"] / c["ceiling"], 3
                )
                out["efficiency_normalized_worst_pair"] = round(
                    out["efficiency_worst_pair"] / c["ceiling"], 3
                )
        except Exception as e:
            print(f"WARN bench: cpu ceiling failed: {e!r}", file=sys.stderr)
    else:
        out["degraded"].append(f"cpu_ceiling: skipped (est {est:.0f}s > budget)")
    if not out["degraded"]:
        del out["degraded"]
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--phase", default="full",
        choices=["full", "kg", "queries", "skew", "ceiling", "kernel-ceiling"],
    )
    ap.add_argument("--cores", type=int, default=CPUS)
    # N=2 / 4N=8 is the largest pair that honors the protocol's
    # no-oversubscription invariant on this 32-CPU box: every task slot
    # activates a JVM task thread AND an Arrow Python worker, so the old
    # 4/16 points saturated all 32 CPUs on the 4N side (16+16) and
    # measured the box, not the engine — raw 0.492 / probe-normalized
    # 0.612 at 4/16 vs 0.72 / 0.99 at 2/8 on the same code (BENCH/
    # BASELINE.md records both). At 2/8 the 4N side uses 8+8 = 16
    # threads = half the machine, which is what "executors get their own
    # CPUs" means locally.
    ap.add_argument("--scaling-n", type=int, default=2)
    ap.add_argument("--replicate", type=int, default=1)
    # 12 makes steady-state compute dominate the per-run serial constant
    # measured by scripts/profile_jobs.py (~250s N-side wall vs ~15-20s
    # constant; a real 4N-executor cluster amortizes it across machines).
    ap.add_argument("--scaling-replicate", type=int, default=12)
    ap.add_argument("--skip-scaling", action="store_true")
    ap.add_argument("--cold", action="store_true", help="skip the warm-up pass in --phase kg")
    ap.add_argument("--runs", type=int, default=2, help="strong pairs (spread is recorded)")
    ap.add_argument("--weak-runs", type=int, default=1, help="weak-scaling runs")
    ap.add_argument("--probe-rows", type=int, default=0,
                    help="bracket the timed kg section with kernel probes of this many rows")
    ap.add_argument("--reps", type=int, default=1,
                    help="timed pipeline repetitions inside one warm JVM (min reported)")
    ap.add_argument("--max-reps", type=int, default=0,
                    help="adaptive cap: add reps while the two fastest disagree >4%%")
    ap.add_argument("--deadline-ts", type=float, default=0.0,
                    help="absolute unix time; --phase kg stops adding reps past it")
    # The wall-clock budget exists because of round 4: the full protocol
    # (3 pairs × adaptive reps + 2 weak + ceilings, 80-90+ min) overran
    # the driver's bench window and the driver recorded NOTHING (rc=124,
    # parsed null). Round 3's complete run finished at ~62 min, so the
    # default budget targets ~42 min of scheduled work; with the 1.15×
    # pre-unit safety margin and per-subprocess deadlines, worst-case
    # wall stays well under the proven window even on a slow box.
    # (2250 → 2500 late in round 5: at 2250 the weak unit missed its
    # admission margin by ~70 s on the reference box — the driver run
    # then carried no weak-scaling row. 2500 admits it while keeping
    # worst-case wall ≈ 42 min « the 62-min proven window; on a slower
    # box the same gate simply skips weak again, recorded in 'degraded'.)
    ap.add_argument("--budget", type=float,
                    default=float(os.environ.get("SPARK_GRAFT_BENCH_BUDGET", "2500")),
                    help="wall-clock budget (s) for the full phase; scaling units "
                         "that don't fit are skipped and recorded in 'degraded'")
    ap.add_argument("--thorough", action="store_true",
                    help="full round-4 protocol: 3 pairs, 2 weak runs, adaptive "
                         "reps to 3, 12M-row probes, 3-run ceilings, no budget")
    args = ap.parse_args()

    if args.phase == "kg":
        print(json.dumps(run_kg(args.cores, args.replicate, warmup=not args.cold,
                                probe_rows=args.probe_rows, reps=args.reps,
                                max_reps=args.max_reps,
                                deadline_ts=args.deadline_ts)))
        return
    if args.phase == "skew":
        print(json.dumps(run_skew(args.cores)))
        return
    if args.phase == "ceiling":
        print(json.dumps(run_ceiling(args.cores)))
        return
    if args.phase == "kernel-ceiling":
        print(json.dumps(run_kernel_ceiling(args.cores)))
        return

    t_start = time.time()
    budget_left = None
    if not args.thorough and args.budget > 0:
        def budget_left() -> float:  # noqa: F811
            return args.budget - (time.time() - t_start)

    sf = SF_DIR.rstrip("/").split("sf")[-1]
    times, query_runs, total = run_queries()
    result = {
        "metric": "headline_queries_total",
        "value": round(total, 3),
        "unit": "sec",
        "queries": times,
        "queries_runs": query_runs,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "cpus": CPUS,
    }

    def emit() -> None:
        # progressive emission: every line is a complete, standalone JSON
        # of everything measured so far, most complete last — whether the
        # driver parses the first or the last JSON line, and even if it
        # kills the process mid-protocol, a parseable result exists.
        print(json.dumps(result), flush=True)

    emit()  # headline evidence lands before any scaling work starts
    if args.phase == "full" and not args.skip_scaling:
        try:
            result["kg_skew"] = run_skew(CPUS)
            emit()
        except Exception as e:
            result["kg_skew_error"] = str(e)[:200]
        try:
            if args.thorough:
                result["kg_scaling"] = scaling_evidence(
                    args.scaling_n, args.scaling_replicate, n_runs=3,
                    cold=args.cold, weak_n=2, probe_rows=12_000_000,
                    reps=2, max_reps=3, ceiling_runs=3,
                )
            else:
                def emit_scaling(s: dict) -> None:
                    result["kg_scaling"] = s
                    emit()

                result["kg_scaling"] = scaling_evidence(
                    args.scaling_n, args.scaling_replicate, n_runs=args.runs,
                    cold=args.cold, weak_n=args.weak_runs,
                    budget_left=budget_left, emit=emit_scaling,
                )
        except Exception as e:  # scaling evidence is best-effort in bench
            result["kg_scaling_error"] = str(e)[:200]
        try:
            _write_bench_baseline(result)
        except Exception as e:
            print(f"WARN bench: BENCH/BASELINE.md write failed: {e!r}", file=sys.stderr)
    result["bench_wall_seconds"] = round(time.time() - t_start, 1)
    emit()


def _write_bench_baseline(result: dict) -> None:
    """Persist the measured numbers per BASELINE.md's scaling protocol."""
    s = result.get("kg_scaling", {})
    qruns = result.get("queries_runs", {})
    lines = [
        "# BENCH / BASELINE — measured engine numbers",
        "",
        f"Headline queries (sf={result['sf']}, local[{result['cpus']}]): "
        f"{result['value']}s total — best-of-N per query, every run recorded "
        "(interleaved whole passes, so one slow VM episode cannot depress a "
        "single query's every sample).",
        "",
        "| query | sec (best) | all runs |",
        "| --- | --- | --- |",
    ]
    lines += [
        f"| {k} | {v} | {qruns.get(k, [])} |" for k, v in result["queries"].items()
    ]
    if s:
        lines += [
            "",
            "## KG pipeline scaling (north-rule N vs 4N evidence)",
            "",
        ]
        if s.get("degraded"):
            lines += [
                f"NOTE — budget degradation engaged: {s['degraded']}. The "
                "bench runs under a wall-clock budget (round-4 lesson: the "
                "full protocol overran the driver's window and recorded "
                "nothing); each unit is gated on its own cost in priority "
                "order (strong pairs → weak → ceiling), so an expensive unit "
                "can be skipped while a cheaper later one still fits. "
                "`bench.py --thorough` runs the full protocol.",
                "",
            ]
        lines += [
            "Same job, same input (events-derived transcripts, "
            f"replicate={s.get('replicate')}, {s.get('turns')} turns); "
            f"protocol = {s.get('protocol', 'warm-paired')} (each subprocess JVM runs the identical "
            "pipeline untimed on the sf0.01 twin first — steady state is the "
            "regime a 10^12-turn job lives in). Runs are PAIRED: each round "
            "times N then 4N back-to-back in fresh JVMs so both sides share "
            "the same box state, and efficiency is computed per pair — the "
            "headline is the MEDIAN pair ratio, the gate evidence the WORST "
            "pair (r3's best-of-3-per-point protocol let cross-session VM "
            "drift swing the best-vs-best ratio ±0.1). Each side's seconds "
            f"is the MIN of {s.get('reps_per_run', 1)}+ timed repetitions of the identical "
            "pipeline section inside that side's one warm JVM (every rep "
            "recorded below; a rep is ADDED, up to 3, while the two fastest "
            "disagree >4% — the same convergence rule on both sides of "
            "every ratio): VM noise is one-sided — a contending neighbor "
            "only ever ADDS time — so the within-JVM min estimates the "
            "uncontended steady-state rate; single-shot sections were the "
            "residual variance source (an episode inside one 73–226 s "
            "section moved that pair's ratio ±0.15 while its bracketing "
            "probes stayed fast). probe_seconds is the min over that JVM's "
            "probe waves (waves bracket every rep), the same estimator "
            "applied to the box-speed side of the normalization.",
            "Scaling points sized so JVM task threads + Arrow Python kernel",
            "workers stay within half the machine at 4N (each task slot",
            "activates one of each, so 4N=8 → 16 active threads on 32 CPUs —",
            "executors on a real cluster each get their own CPUs). The prior",
            "4/16 points saturated all 32 CPUs on the 4N side and measured",
            "box saturation, not the engine: same code measured raw 0.492 /",
            "probe-normalized 0.612 at 4/16 vs the numbers below at 2/8.",
            "replicate makes steady-state compute dominate the remaining",
            "per-run serial constant (scripts/profile_jobs.py names each",
            "contributor), which a real 4N-executor cluster amortizes across",
            "machines.",
            "",
            f"| cores | seconds (median of {s.get('runs_per_point', 3)} runs, each min-of-reps; per-run mins, then every rep) | turns/sec (best) |",
            "| --- | --- | --- |",
            f"| {s.get('cores_n')} (N) | {s.get('seconds_n')} {s.get('seconds_n_runs')} reps={s.get('seconds_n_all_reps', 'n/a')} | {s.get('turns_per_sec_n')} |",
            f"| {s.get('cores_4n')} (4N) | {s.get('seconds_4n')} {s.get('seconds_4n_runs')} reps={s.get('seconds_4n_all_reps', 'n/a')} | {s.get('turns_per_sec_4n')} |",
            "",
            f"**Strong-scaling efficiency = {s.get('efficiency')}** (median "
            f"paired ratio T_N/(4·T_4N); pairs = {s.get('pair_efficiencies')}, "
            f"worst {s.get('efficiency_worst_pair')}, best "
            f"{s.get('efficiency_best_pair')}; target ≥ 0.8).",
            "",
            f"**Probe-normalized strong efficiency = "
            f"{s.get('efficiency_probe_normalized', 'n/a')} (median), "
            f"{s.get('efficiency_probe_normalized_worst_pair', 'n/a')} (worst pair)** — "
            "each pair's ratio divided by ITS OWN box bound, measured inside the "
            "same two JVMs that produced the pair: every timed section is "
            "bracketed by two zero-shuffle Arrow-kernel probe waves "
            f"({s.get('probe_rows', 'n/a')} rows of regex tokenization over "
            "synthesized strings — the same work KIND as the engine's kernel "
            "stages, none of its code; bench.py:_kernel_probe), and the pair's "
            "ceiling is probe_N/(4·probe_4N) "
            f"(per-pair ceilings {s.get('pair_probe_ceilings', [])}, probe seconds "
            f"N-side {s.get('probe_seconds_n_runs', [])}, 4N-side "
            f"{s.get('probe_seconds_4n_runs', [])}). A VM episode that slows one "
            "side's pipeline run slows its probes identically, so this number "
            "isolates the ENGINE's scaling from box drift — it is what the same "
            "job does on hardware that actually scales with the executor count.",
            "",
            f"**Work-normalized strong efficiency = "
            f"{s.get('efficiency_work_normalized', 'n/a')} (median), "
            f"{s.get('efficiency_work_normalized_worst_pair', 'n/a')} (worst pair)** — "
            "measured inside the pipeline ITSELF, not a proxy: each run's "
            "Spark event log records the task core-seconds its timed section "
            "actually executed (successful non-speculative attempts only, "
            "clipped to the timed window), and both sides of a pair run "
            "IDENTICAL logical work — yet on this box the 4N side pays more "
            "core-seconds per task (all-core frequency + shared memory "
            "bandwidth on fixed silicon; "
            f"per-pair inflation {s.get('pair_cpu_inflations', [])}, net task "
            f"core-seconds N {s.get('task_core_seconds_net_n_runs', [])} vs 4N "
            f"{s.get('task_core_seconds_net_4n_runs', [])}). The inflation is "
            "computed NET of each task's own JVM GC time and shuffle-write "
            "stalls, so engine-caused overheads at higher parallelism (heap "
            "pressure, shuffle volume) are NOT credited to the box "
            f"(gross-inflation variant {s.get('efficiency_work_normalized_gross', 'n/a')} "
            f"median / {s.get('efficiency_work_normalized_gross_worst_pair', 'n/a')} worst, "
            f"gross inflations {s.get('pair_cpu_inflations_gross', [])}, gross task "
            f"core-seconds N {s.get('task_core_seconds_n_runs', [])} vs 4N "
            f"{s.get('task_core_seconds_4n_runs', [])}; raw × gross inflation "
            "algebraically equals the task-slot utilization ratio u_4N/u_N, "
            f"utilizations N {s.get('utilization_n_runs', [])}, 4N "
            f"{s.get('utilization_4n_runs', [])}). This estimates the "
            "efficiency the same plan achieves on hardware whose per-task "
            "cost is flat across cluster sizes — what 4N real executors "
            "(own cores, memory bus, disks) provide — but it cannot fully "
            "separate residual engine-caused contention (Python-worker "
            "scheduling, bandwidth-induced slow paths) from the box charge "
            "on one shared machine, so the RAW and PROBE-normalized numbers "
            "above remain co-equal gate evidence rather than being replaced "
            "by this one.",
            "",
        ]
        if s.get("weak_efficiency") is not None:
            lines += [
                f"**Weak-scaling efficiency = {s.get('weak_efficiency', 'n/a')}** "
                f"(N cores on {s.get('turns')} turns vs 4N cores on "
                f"{s.get('weak_turns_4x', 'n/a')} turns, wall {s.get('seconds_n')}s vs "
                f"{s.get('weak_seconds_4n_4x', 'n/a')}s, paired ratios "
                f"{s.get('weak_pair_efficiencies', [])}; ideal = 1.0) — the regime the "
                "10^12-turn goal implies: executor count grows WITH the data. "
                f"Probe-normalized weak efficiency = "
                f"**{s.get('weak_efficiency_probe_normalized', 'n/a')}** (worst pair "
                f"{s.get('weak_efficiency_probe_normalized_worst_pair', 'n/a')}; weak "
                "probes run 4× the rows at 4N cores so the probe ratio is the "
                "weak-regime box bound; per-pair weak ceilings "
                f"{s.get('weak_pair_probe_ceilings', [])}). Work-normalized weak "
                f"efficiency = **{s.get('weak_efficiency_work_normalized', 'n/a')}** "
                f"(worst pair {s.get('weak_efficiency_work_normalized_worst_pair', 'n/a')}; "
                "weak inflation = weak task core-seconds / 4× the N side's — the "
                "4× data is exactly 4× the logical work, task-linearity measured "
                f"at 0.2%; per-pair {s.get('weak_pair_cpu_inflations', [])}, weak task "
                f"core-seconds {s.get('weak_task_core_seconds_runs', [])}).",
                "",
            ]
        else:
            lines += [
                "Weak-scaling runs (4N cores on 4× data vs N on 1×) did not fit "
                "this invocation's wall-clock budget and were skipped (see the "
                "degradation note above; `bench.py --thorough` includes them). "
                "Historical record, round-4 full protocol on this engine: raw "
                "weak median 0.825, probe-normalized 0.844 (worst pair 0.745), "
                "work-normalized 0.966 (worst pair 0.955), task work linear in "
                "data to 0.2%.",
                "",
            ]
        lines += [
            "Round-3 ask #2 (weak regression 0.600→0.579, hypothesis: kernel",
            "batch size / cache locality): A/B'd cfg.kernel_batch_size at the",
            "weak point (16 cores, replicate 96; scripts/profile_weak.py).",
            "Measured seconds — 256: 434.5, 512: 409.7, 1024: 425.8, 4096:",
            "454.5 → batch size is NOISE at this scale (±5%); hypothesis",
            "falsified. The REAL weak-regime term was found by job-timeline",
            "decomposition instead: generate_pairs' groupBy output is one tiny",
            "row per conversation, so AQE coalesced the reduce side to ONE",
            "task — and the O(m²) pair-generation HOFs, the explode and the",
            "pair-part expansion all ran serially in it (measured 39 core-s at",
            "replicate 24, growing LINEARLY with data: ~4× that in the weak",
            "run). Fixed with an explicit repartition between the agg and the",
            "explode (exempt from AQE coalescing; the extra exchange moves",
            "only the tiny per-conversation rows) plus a single-explode",
            "pair-part expansion replacing the two-branch union that evaluated",
            "the pairs subtree twice (operators/pairs.py).",
            "",
            "Round-over-round: round-2 recorded 5,697 tps @N / 10,725 tps @4N",
            "cold at replicate 8 with strong efficiency 0.471; the round-3",
            "engine (session-memoized JVM-pinned linker side data, warm",
            "protocol, replicate 24) roughly doubles 4N throughput and lifts",
            "the raw ratio by attacking the serial constant directly.",
            "Losing config A/Bs, recorded so they are not retried: kernel",
            "parallelism 2-3× cores or shuffle partitions 2× cores slowed the",
            "16-core run 50→69s; AQE off slowed it 50→82s; driver heap 32g",
            "(vs 8g) slowed it 130→347s (tmpfs spill of serialized blocks",
            "beats heap-resident deserialized rows for GC).",
            "",
            f"Same-run same-framework ceiling of this VM at the same core counts: "
            f"**{s.get('cpu_ceiling', 'n/a')}** "
            f"(N-side runs {s.get('cpu_ceiling_runs_n', [])}, 4N-side "
            f"{s.get('cpu_ceiling_runs_4n', [])}) — a ZERO-shuffle, pure-codegen Spark "
            "aggregation (spark.range → xxhash64 → avg; no python workers, one wave of "
            "equal tasks) measured N vs 4N in fresh JVMs. Anything below 1.0 there is "
            "the box (all-core frequency scaling / memory bandwidth / one shared JVM), "
            "not the engine. Normalized efficiency = "
            f"**{s.get('efficiency_normalized', 'n/a')}** (worst pair "
            f"{s.get('efficiency_normalized_worst_pair', 'n/a')}) — the cluster-relevant number, since "
            "4N real executors scale CPUs/memory-bandwidth/disks with the executor count "
            "while this VM holds them fixed.",
            "",
            f"Arrow-kernel ceiling at the same core counts: "
            f"**{s.get('kernel_ceiling', 'n/a')}** (median of the per-pair probe "
            "ceilings above; previously measured in separate subprocesses — "
            "r3 read 0.728 — now contemporaneous with the runs it normalizes). "
            "The kernel shape is the REPRESENTATIVE bound for this pipeline: its "
            "hot stages are Arrow-batched Python kernels, and each added task "
            "slot activates a JVM task thread AND a Python worker on fixed "
            "shared silicon — the pure-JVM ceiling leaves every Python worker "
            "idle and so understates what the box charges for N→4N. "
            f"Kernel-normalized efficiency = **{s.get('efficiency_normalized_kernel', 'n/a')}** "
            f"(worst pair {s.get('efficiency_normalized_kernel_worst_pair', 'n/a')}).",
            "",
            "Configs: spark.sql.shuffle.partitions = max(cores, 8); AQE on",
            "(skew-join + partition coalescing); shuffle dirs on tmpfs (a real",
            "cluster adds local SSDs with every executor — one shared disk",
            "understates scaling); per-conversation pair cap 10k",
            "(PipelineConfig.max_pairs_per_conversation).",
            "",
            "Environment caveats (single shared VM, not a cluster): the",
            "zero-shuffle Spark ceiling above shows this box scales even",
            "perfectly-parallel JVM compute sublinearly, with large run-to-run",
            "variance on identical configs (see the recorded per-run spreads).",
            "Job-timeline decomposition (scripts/profile_jobs.py): the heavy",
            "stages run at 15-16×/16 utilization; the gap to ideal is the",
            "remaining ~20s serial constant plus the VM ceiling. In the weak",
            "regime the classifier tail additionally burns ~25% more CPU per",
            "row at 12× data (cache locality — partition-count A/B showed no",
            "spill effect); per-executor data is constant in that regime on a",
            "real cluster, so neither term applies there. The efficiency above",
            "is therefore a lower bound on what the same job does on 4N real",
            "executors, where CPUs, memory bandwidth and shuffle disks all",
            "scale with the executor count.",
        ]
    k = result.get("kg_skew", {})
    if k:
        lines += [
            "",
            "## Skew evidence (salted two-phase assembly)",
            "",
            f"One {k.get('skew_turns')}-turn conversation among "
            f"{k.get('n_normal_convs')} normal ones (local[{k.get('cores')}]):",
            "",
            "| variant | wall s | max task s (event log) |",
            "| --- | --- | --- |",
            f"| unsalted | {k.get('seconds_unsalted')} | {k.get('max_task_seconds_unsalted', 'n/a')} |",
            f"| salted | {k.get('seconds_salted')} | {k.get('max_task_seconds_salted', 'n/a')} |",
            "",
            f"Outputs identical = {k.get('outputs_identical')}. The "
            "single-reducer tail IS the max task; the salted two-phase form "
            "(phase 1 groups on (conv_id, turn_idx div segment) and pre-joins "
            "segments, phase 2 merges segment strings) bounds it by the "
            "segment size; engaged in the pipeline via "
            "PipelineConfig.skew_turns_threshold / salt_buckets.",
        ]
    os.makedirs(os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH"), exist_ok=True)
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH", "BASELINE.md")
    with open(path, "w") as f:
        f.write("\n".join(lines) + "\n")


if __name__ == "__main__":
    main()
