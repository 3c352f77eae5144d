#!/usr/bin/env python3
"""Round-over-round bench comparison, auto-normalized by the
code-frozen calibration probe (graft.Bench runs the same pinned
shuffle-agg first and last in every batch and reports it as
"calibration": {"pre": s, "post": s} — since r16 with mid-run probes
in "mid" and a "calibration_drift" alarm; since r17 an IO-shaped
probe "calibration_io" joins it. The alarm fires iff: the CPU pre
probe leaves its pinned clean band; the IO pre probe leaves ITS
pinned band; or EVERY later probe of either family (mids + post,
only when mids exist) sits above that family's band ceiling —
sustained slowness a single end-of-run debris spike can't explain.
There is deliberately NO pre/post-spread rule: a spread check would
flag 12 clean historical runs).

For each shared query: raw ratio = new/old, normalized ratio =
raw / (cal_new / cal_old). The calibration factor is the geometric
mean of pre and post (the probe brackets the batch, so their mean
tracks the batch-average box speed). When either side lacks a
calibration block (pre-round-11 JSONs), only raw ratios print.

Each side may be a comma-separated list of bench JSONs (e.g. the
4-run cold boards); per-query and calibration values are medians
across the runs.

Usage:
  round_compare.py OLD.json[,OLD2...] NEW.json[,NEW2...]
  round_compare.py NEW.json[,NEW2...]
      OLD defaults to the ROUND-17 DEFINITIVE COLD BOARD
      (bench_r17_cold{1..4}.json — on final r17 code, the first board
      with the fixed probe order AND both probes in-band; BASELINE.md
      declares it the like-for-like base from round 18 on). r15b/r16b
      stay on disk as history; r16b's calibration carries the shifted
      pre-fix baseline — raw comparisons only.
  round_compare.py --driver DRIVER.json [BOARD.json,...]
      Driver-vs-board outlier audit: per-entry driver/board ratios
      against the seeded board (default: the r15b cold board), sorted
      worst-first, EXIT 1 if any entry exceeds 2x — so a
      driver-context inflation like r12/r13's containment_neardup is
      instrument-caught, not judge-caught. DRIVER.json may be a
      canonical bench_full.json or a driver BENCH_rN.json artifact
      (whose 2000-char "tail" holds only part of the map — the
      parseable suffix is recovered, the audit runs on it, and the
      recovered/registry coverage is printed with an explicit SKIPPED
      count when partial).
      An artifact carrying calibration_drift=true is REFUSED (exit 2):
      the r15 driver run measured its own box 2.3x off mid-run and
      still became the artifact of record. --allow-drift overrides by
      normalizing every ratio through the calibration factor instead.
"""
import sys, json, os, re, glob, statistics

DEFAULT_BOARD = ",".join(
    os.path.join(os.path.dirname(__file__) or ".", "..",
                 f"bench_r17_cold{i}.json") for i in range(1, 5))

# Clean-box reference values for the two probe families — the medians
# of the pinned bands' clean histories (CPU 1.42-2.25s, IO 0.47-0.62s;
# BASELINE.md calibration tables). The hot-run classifier divides each
# probe sample by its family's reference to get a "box factor at time
# t"; overridable on other hardware alongside the bands themselves.
CPU_CLEAN = float(os.environ.get("SPARK_GRAFT_CAL_CPU_CLEAN", "1.8"))
IO_CLEAN = float(os.environ.get("SPARK_GRAFT_CAL_IO_CLEAN", "0.55"))

# Pinned IO-probe clean band (pre), mirroring Bench.scala's
# SPARK_GRAFT_CAL_IO_BAND default. Applied HERE as well so an artifact
# produced by a pre-r17 binary (whose baked calibration_drift flag
# predates the IO rule — BENCH_r16.json carried pre 1.10s with
# drift:false) is still refused by the audit.
IO_BAND = tuple(float(x) for x in os.environ.get(
    "SPARK_GRAFT_CAL_IO_BAND", "0.30,0.95").split(","))


def parse_run(path):
    """One run -> dict with queries, calibration|None, drift flag|None,
    nqueries|None. Accepts the canonical Bench line, the compact
    summary line (slowest-only), or a driver BENCH_rN.json whose
    truncated tail is regex-recovered."""
    d = json.load(open(path))
    meta = {"drift": None, "nqueries": None, "partial": False,
            "io_pre": None, "t0": None, "seed": None,
            "cal": None, "cal_io": None}
    # Full probe series (canonical artifacts only) — the hot-run
    # classifier's input. Tail artifacts lose the mids with the head.
    if isinstance(d.get("calibration"), dict):
        meta["cal"] = d["calibration"]
    if isinstance(d.get("calibration_io"), dict):
        meta["cal_io"] = d["calibration_io"]
    # r18+: per-query start offsets ([name, offset] pairs) and the
    # order seed — the phase classifier's inputs.
    if isinstance(d.get("t0"), list):
        meta["t0"] = {n: t for n, t in d["t0"]}
    if "seed" in d:
        meta["seed"] = d["seed"]
    if d.get("calibration_io"):
        io = d["calibration_io"]
        meta["io_pre"] = io.get("pre")
        print(f"  {path}: calibration_io pre {io.get('pre', 0):.2f}s "
              f"post {io.get('post', 0):.2f}s (IO-shaped probe, r16+; "
              f"pinned pre band [{IO_BAND[0]:.2f},{IO_BAND[1]:.2f}])")
    if "queries" in d:
        meta.update(drift=d.get("calibration_drift"),
                    nqueries=len(d["queries"]))
        return d["queries"], d.get("calibration"), meta
    if "slowest" in d:  # compact summary line: partial by design
        meta.update(drift=d.get("calibration_drift"),
                    nqueries=d.get("nqueries"), partial=True)
        return d["slowest"], d.get("calibration"), meta
    if "parsed" in d and d["parsed"]:
        p = d["parsed"]
        meta.update(drift=p.get("calibration_drift"),
                    nqueries=p.get("nqueries"),
                    partial="queries" not in p)
        return p.get("queries", p.get("slowest", {})), p.get("calibration"), meta
    if "tail" in d:
        # Require a `,` or `}` after the number: a pair sitting exactly
        # on the 2000-char cut boundary can be digit-truncated
        # (`"q1":3.7` from 3.75) and would otherwise parse as a
        # valid-looking float, silently skewing that entry's ratio.
        qs = {m.group(1): float(m.group(2)) for m in re.finditer(
            r'"([A-Za-z0-9_]+)":([0-9]+\.[0-9]+)(?=[,}])', d["tail"])}
        qs.pop("pre", None); qs.pop("post", None)
        for k in ("value", "sf"): qs.pop(k, None)
        m = re.search(r'"calibration_drift":(true|false)', d["tail"])
        if m:
            meta["drift"] = m.group(1) == "true"
        m = re.search(r'"calibration_io":\{"pre":([0-9.]+)', d["tail"])
        if m:
            meta["io_pre"] = float(m.group(1))
        m = re.search(r'"nqueries":(\d+)', d["tail"])
        if m:
            meta["nqueries"] = int(m.group(1))
        m = re.search(r'"seed":(\d+|null)', d["tail"])
        if m and m.group(1) != "null":
            meta["seed"] = int(m.group(1))
        # t0 pairs that survived in the tail (the canonical line emits
        # them as ["name",offset] arrays, regex-distinct from the
        # `"name":dur` query pairs so the duration recovery above can
        # never conflate the two).
        t0 = {m.group(1): float(m.group(2)) for m in re.finditer(
            r'\["([A-Za-z0-9_]+)",([0-9]+\.[0-9]+)\]', d["tail"])}
        if t0:
            meta["t0"] = t0
        meta["partial"] = True
        return qs, None, meta
    sys.exit(f"{path}: no queries/slowest/tail to read")


def load(paths):
    runs = [parse_run(p) for p in paths.split(",")]
    shared_keys = set(runs[0][0])
    for q, _, _ in runs[1:]:
        shared_keys &= set(q)
    queries = {k: statistics.median(q[k] for q, _, _ in runs)
               for k in shared_keys}
    cals = [c for _, c, _ in runs]
    cal = None
    if all(c and c.get("pre") and c.get("post") for c in cals):
        cal = statistics.median(
            (c["pre"] * c["post"]) ** 0.5 for c in cals)
    drift = any(m["drift"] for _, _, m in runs)
    # Recomputed IO-band check (r17): a run whose recorded IO pre sits
    # outside the pinned band counts as drifted even if its baked
    # calibration_drift flag predates the IO rule.
    io_out = [m["io_pre"] for _, _, m in runs
              if m["io_pre"] is not None
              and not (IO_BAND[0] <= m["io_pre"] <= IO_BAND[1])]
    # Largest declared registry size across the runs (None if unknown).
    nq = [m["nqueries"] for _, _, m in runs if m["nqueries"]]
    partial = any(m["partial"] for _, _, m in runs)
    # Timeline metadata from the first run that carries it (the driver
    # side of an audit is a single artifact; boards don't need one).
    t0 = next((m["t0"] for _, _, m in runs if m.get("t0")), None)
    seed = next((m["seed"] for _, _, m in runs if m.get("seed") is not None),
                None)
    calf = next((m["cal"] for _, _, m in runs if m.get("cal")), None)
    calio = next((m["cal_io"] for _, _, m in runs if m.get("cal_io")), None)
    return queries, cal, {"drift": drift, "nqueries": max(nq) if nq else None,
                          "partial": partial, "io_out": io_out,
                          "t0": t0, "seed": seed,
                          "cal": calf, "cal_io": calio}


def probe_factor(meta, total):
    """Piecewise-linear 'box factor at time t' from the artifact's own
    probe series: each sample is probe_value / family_clean_reference,
    families (CPU, IO) interpolated separately and combined by max,
    clamped to >= 1.0 (probes only ever explain slowness away, never
    inflate a ratio). Returns (f, samples) where f(t) -> factor and
    samples is the flat [(t, factor, label)] list, or (None, []) when
    the artifact carries no probe series (tail artifacts)."""
    fams = []
    flat = []
    for key, ref, label in (("cal", CPU_CLEAN, "cpu"),
                            ("cal_io", IO_CLEAN, "io")):
        c = meta.get(key)
        if not c:
            continue
        pts = []
        if c.get("pre") is not None:
            pts.append((0.0, c["pre"] / ref))
        for t, v in zip(c.get("mid_t") or [], c.get("mid") or []):
            pts.append((t, v / ref))
        if c.get("post") is not None:
            pts.append((total, c["post"] / ref))
        pts.sort()
        if len(pts) >= 2:
            fams.append(pts)
            flat += [(t, v, label) for t, v in pts]
    if not fams:
        return None, []

    def interp(pts, t):
        if t <= pts[0][0]:
            return pts[0][1]
        if t >= pts[-1][0]:
            return pts[-1][1]
        for (t1, v1), (t2, v2) in zip(pts, pts[1:]):
            if t1 <= t <= t2:
                return v1 + (v2 - v1) * (t - t1) / (t2 - t1 or 1.0)
        return pts[-1][1]

    return (lambda t: max(1.0, max(interp(p, t) for p in fams)),
            sorted(flat))


def classify_phase(flagged, drv, meta, median_ratio=None):
    """Print a verdict on the flagged (>2x board) entries from the
    driver run's timeline + probe series:
      HOT-RUN / TAIL-DEGRADED — the run's own probes say the box was
        uniformly or progressively hot (median driver/board elevated,
        probe samples above their clean references); per-entry ratios
        are normalized by the interpolated probe factor at each
        entry's t0 BEFORE any window judgement, so a hot box never
        files as "suspect N unrelated plans" (the r18 failure mode).
      CONTIGUOUS — the (residual) entries cluster into few small time
        windows => transient box phase; confirm via solo re-run
        (tools/attribute.sh), not plan investigation.
      SCATTERED — residual entries spread across the run with no
        probe explanation => suspect the entries' plans/code.
    Timeline source, in preference order: the artifact's recorded t0
    offsets (r18+); else, for legacy unseeded artifacts, start offsets
    reconstructed as the cumulative sum of durations in alphabetical
    order. A seeded artifact without t0 is unclassifiable (the Scala
    shuffle is not reproducible here)."""
    t0 = meta.get("t0")
    declined_note = ""
    if t0:
        known = [q for q, *_ in flagged if q in t0]
        if len(known) < len(flagged):
            print(f"phase-classifier: {len(flagged) - len(known)} flagged "
                  f"entries missing from the recovered t0 timeline — "
                  f"classification covers {len(known)}/{len(flagged)}")
            # A verdict from a minority of the flagged entries misled
            # the r18 audit (3/10 coverage said CONTIGUOUS while the
            # full timeline read differently) — below half coverage the
            # verdict is explicitly non-binding (r18 ADVICE).
            declined_note = (f" [PARTIAL — covers {len(known)}/{len(flagged)}"
                            f" flagged; indicative only"
                            + (", NOT BINDING below half coverage — adopt "
                               "the full snapshot (BENCH_rN_full.json or "
                               "bench_runs/ archive) for a binding verdict"
                               if len(known) * 2 < len(flagged) else "")
                            + "]")
        if not known:
            return
        offs = t0
        order = sorted(t0, key=t0.get)
        src = "recorded t0 timeline"
    elif meta.get("seed") is not None:
        print("phase-classifier: seeded artifact without a t0 timeline — "
              "run order not reconstructable, cannot classify")
        return
    elif meta.get("partial"):
        print("phase-classifier: truncated legacy artifact without t0 — "
              "timeline not reconstructable; audit the committed "
              "bench_full.json instead")
        return
    else:
        order = sorted(drv)
        offs, t = {}, 0.0
        for q in order:
            offs[q] = t
            t += drv[q]
        src = ("cumulative-sum reconstruction over the legacy alphabetical "
               "order (assumes an unseeded pre-r18 driver run: an artifact "
               "produced WITH SPARK_GRAFT_BENCH_SEED but recording no seed "
               "would be silently misplaced on this timeline)")
    last = order[-1]
    total = offs[last] + drv.get(last, 0.0)
    # HOT-RUN normalization (r18 VERDICT #3c): when the run reads
    # uniformly elevated AND its own probe series sits above the clean
    # references, divide each flagged entry's ratio by the interpolated
    # box factor at its t0 before judging windows. Trigger: median
    # driver/board > 1.1 and any probe sample > 1.25x its clean ref.
    fq_all = [(q, r) for q, _, _, r in flagged if q in offs]
    residual = dict(fq_all)
    hot = False
    f, samples = probe_factor(meta, total)
    if f and median_ratio is not None and median_ratio > 1.1:
        peak = max(v for _, v, _ in samples)
        if peak > 1.25:
            hot = True
            ramp = ", ".join(
                f"{lab} {t:.0f}s:{v:.2f}x" for t, v, lab in samples)
            print(f"phase-classifier: HOT-RUN/TAIL-DEGRADED — median "
                  f"driver/board {median_ratio:.3f} with probe samples "
                  f"above clean refs (cpu~{CPU_CLEAN}s io~{IO_CLEAN}s): "
                  f"{ramp}")
            residual = {}
            for q, r in fq_all:
                fac = f(offs[q])
                nr = (r or 0.0) / fac
                if nr > 2.0:
                    residual[q] = nr
            explained = len(fq_all) - len(residual)
            print(f"  probe-factor normalization explains {explained}/"
                  f"{len(fq_all)} flagged entries (residual >2x after "
                  f"normalization: "
                  f"{', '.join(sorted(residual)) or 'none'})")
            if not residual:
                print("  => HOT-RUN: every flagged entry is explained by "
                      "the run's own probe series — attribute via "
                      "tools/attribute.sh (solo clean-box re-run), do not "
                      "investigate plans" + declined_note)
                return
    fq = sorted(residual, key=offs.get)
    pos = {q: i for i, q in enumerate(order)}
    idxs = sorted(pos[q] for q in fq)
    # MULTI-WINDOW clustering (r18: the flagged entries sat in TWO
    # probe-bracketed windows — early probe-blind + degraded tail — and
    # a single min..max window read 94% of the run => SCATTERED).
    # Cluster by time gap (> max(30s, 10% of run) between one entry's
    # end and the next's start splits); phase-shaped = few clusters
    # whose SUMMED span is a small fraction of the run.
    gap = max(30.0, 0.10 * total)
    clusters = []
    for q in fq:
        s, e = offs[q], offs[q] + drv.get(q, 0.0)
        if clusters and s - clusters[-1][1] <= gap:
            clusters[-1][1] = max(clusters[-1][1], e)
        else:
            clusters.append([s, e])
    span = sum(e - s for s, e in clusters)
    frac = span / total if total > 0 else 1.0
    win = ", ".join(f"{s:.1f}-{e:.1f}s" for s, e in clusters)
    print(f"phase-classifier ({src}): "
          f"{len(fq)}{' residual' if hot else ''} flagged entries at run "
          f"positions {idxs[0]}-{idxs[-1]}, {len(clusters)} time window"
          f"{'s' if len(clusters) != 1 else ''} [{win}] — summed span "
          f"{span:.1f}s = {100 * frac:.0f}% of the {total:.0f}s run")
    # Phase-shaped = the flagged entries fall in few small windows
    # (r17's six: 12%; the r18 evidence: 2 windows ~30%; a live phase
    # with interleaved warn entries: 21%). A genuine code regression
    # has no reason to cluster in run time under a seeded order, so
    # >35% summed span or many disjoint windows is scattered.
    if frac <= 0.35 and len(clusters) <= 3:
        print("  => CONTIGUOUS in time"
              + (f" ({len(clusters)} bracketed windows)"
                 if len(clusters) > 1 else "")
              + (": hot run + bracketed window(s)" if hot else "")
              + ": consistent with a transient box phase, not a plan "
              "change — confirm the entries read board-level in a solo "
              "re-run (tools/attribute.sh) before touching code"
              + (" (single entry: window is trivial; the re-run check "
                 "is the whole signal)" if len(idxs) == 1 else "")
              + declined_note)
    else:
        print("  => SCATTERED across the run: not a box phase — "
              "suspect these entries' plans/code" + declined_note)


def find_full_snapshot(driver_path):
    """A truncated driver tail keeps ~50/147 durations and a partial
    t0 timeline; the canonical full-precision artifact is the thing to
    audit when a copy survives (r18 VERDICT #2 — the only full copy of
    BENCH_r18 lived in scratch bench_full.json and was overwritten).
    Preference order: a committed round snapshot BENCH_rN_full.json
    next to the artifact; else a bench_runs/ archive entry (Bench
    writes one per run since r19) matched by the tail's recorded
    total ('value', r3-rounded) and seed. Returns (path, why)|None."""
    stem = re.sub(r"\.json$", "", driver_path)
    cand = stem + "_full.json"
    if os.path.exists(cand):
        return cand, "committed round snapshot"
    try:
        d = json.load(open(driver_path))
    except Exception:
        return None
    tail = d.get("tail", "")
    mv = re.search(r'"value":([0-9.]+)', tail)
    if not mv:
        return None
    val = float(mv.group(1))
    ms = re.search(r'"seed":(\d+|null)', tail)
    rundir = os.path.join(os.path.dirname(driver_path) or ".", "bench_runs")
    for p in sorted(glob.glob(os.path.join(rundir, "*.json")), reverse=True):
        try:
            fd = json.load(open(p))
        except Exception:
            continue
        if "queries" not in fd:
            continue
        if abs(fd.get("value", -1.0) - val) > 0.002:
            continue
        if ms and str(fd.get("seed")) != ms.group(1).replace("null", "None"):
            continue
        return p, "bench_runs archive (matched by recorded total + seed)"
    return None


def driver_audit(driver_path, board_paths, allow_drift):
    if "," not in driver_path:
        snap = find_full_snapshot(driver_path)
        if snap:
            print(f"adopting full artifact {snap[0]} for {driver_path} "
                  f"({snap[1]}) — full-coverage audit instead of the "
                  f"truncated tail")
            driver_path = snap[0]
    drv, cal_drv, meta = load(driver_path)
    board, cal_board, _ = load(board_paths)
    factor = None
    if meta.get("io_out"):
        meta["drift"] = True
        print(f"driver artifact's IO probe pre "
              f"{'/'.join(f'{v:.2f}' for v in meta['io_out'])}s is outside "
              f"the pinned clean band [{IO_BAND[0]:.2f},{IO_BAND[1]:.2f}] "
              f"(recomputed here — binding even when the artifact's baked "
              f"calibration_drift flag predates the r17 IO rule)")
    if meta["drift"]:
        if not allow_drift:
            print("REFUSED: the driver run measured its own box outside a "
                  "pinned clean band — the CPU pre probe left its band, the "
                  "IO pre probe left its band, or every later probe of one "
                  "family sat above that family's ceiling. Re-run the bench "
                  "on a quiet box, or pass --allow-drift to audit anyway "
                  "with calibration-normalized ratios.")
            sys.exit(2)
        if cal_drv and cal_board:
            factor = cal_drv / cal_board
            print(f"WARNING: calibration_drift=true on the driver artifact; "
                  f"normalizing every ratio by the box factor {factor:.3f} "
                  f"(driver cal {cal_drv:.3f}s / board cal {cal_board:.3f}s)")
        else:
            print("WARNING: calibration_drift=true and no calibration to "
                  "normalize with — ratios below are raw and suspect")
    shared = sorted(set(drv) & set(board))
    if not shared:
        sys.exit("no shared queries between driver and board")
    # Truncation awareness: an audit that quietly covers a third of the
    # registry isn't an audit — always print coverage, and flag partial.
    registry = meta["nqueries"] or len(board)
    skipped = max(0, registry - len(shared))
    print(f"driver-vs-board audit over {len(shared)} shared entries "
          f"(board = {board_paths})")
    print(f"coverage: {len(shared)}/{registry} registry entries"
          + (f" — SKIPPED {skipped} (driver artifact is a truncated tail; "
             f"audit the committed bench_full.json for full coverage)"
             if skipped else " (complete)"))
    rows = sorted(((q, drv[q], board[q],
                    (drv[q] / board[q] if board[q] else float("inf"))
                    / (factor or 1.0))
                   for q in shared), key=lambda r: -r[3])
    w = max(len(q) for q, *_ in rows)
    rl = "norm" if factor else "ratio"
    print(f"{'query':<{w}}  {'driver':>8}  {'board':>8}  {rl:>6}")
    for q, dv, bv, r in rows[:25]:
        print(f"{q:<{w}}  {dv:8.2f}  {bv:8.2f}  {r:6.2f}")
    if len(rows) > 25:
        print(f"... {len(rows) - 25} more (all below {rows[24][3]:.2f}x)")
    ratios = [r[3] for r in rows]
    med_ratio = statistics.median(ratios)
    print(f"\nmedian driver/board ratio: {med_ratio:.3f}")
    # MATERIALITY FLOOR (r17): a single unseeded driver run rolls >2x
    # on sub-second entries from the JIT-ramp tail alone (r17 alpha
    # preflight: corpus_funnel 1.42 vs 0.64 board, audio_decode 0.70
    # vs 0.32 — r15's alpha runs put the same entries at 1.1-1.5x, so
    # it is run noise, not a plan defect). Real driver-context
    # inflations are multi-second (r16: ann_ivfpq_batch_topk +17.3 s;
    # r12/r13 containment_neardup likewise), so FAIL requires >2x AND
    # >1 s absolute — sub-second rolls are listed as warnings only.
    # Absolute deltas use the NORMALIZED driver value when a box factor
    # is active (--allow-drift): the ratio r is calibration-normalized,
    # so a raw dv-bv floor would disagree with it on drifted artifacts
    # (r17 ADVICE) — e.g. a 1.5x box factor makes every raw delta look
    # 1.5x more material than the normalized ratio says it is.
    f = factor or 1.0
    bad = [(q, dv, bv, r) for q, dv, bv, r in rows
           if r > 2.0 and dv / f - bv > 1.0]
    soft = [(q, dv, bv, r) for q, dv, bv, r in rows
            if r > 2.0 and dv / f - bv <= 1.0]
    for q, dv, bv, r in soft:
        print(f"warn: {q} at {r:.2f}x but only +{dv / f - bv:.2f}s absolute "
              "(below the 1s materiality floor — position/JIT noise class)")
    # AGGREGATE materiality (r17 ADVICE): the per-entry 1s floor must
    # not let a systematic sub-second inflation across many entries
    # pass as warnings only (30 entries x +0.9s = +27s). Sum the
    # warn-class absolute inflation; past 5s it is a FAIL in its own
    # right even though no single entry is material.
    soft_total = sum(dv / f - bv for q, dv, bv, r in soft)
    agg_bad = soft_total > 5.0
    if agg_bad:
        print(f"FAIL: warn-class entries sum to +{soft_total:.1f}s absolute "
              "(>5s aggregate floor) — a systematic sub-second inflation, "
              "not isolated position/JIT noise")
    if bad:
        print("FAIL: entries >2x their board median AND >1s absolute "
              "(driver-context inflation — attribute before shipping):")
        for q, dv, bv, r in bad:
            print(f"  {q}: {r:.2f}x (+{dv / f - bv:.1f}s)")
    if bad or agg_bad:
        # Classify over EVERY >2x entry (material or warn-class): the
        # materiality floor splits one box phase's entries into fails
        # and warns, and judging contiguity from the fails alone would
        # read a dense phase as scattered.
        classify_phase(bad + soft, drv, meta, median_ratio=med_ratio)
        sys.exit(1)
    print("OK: no entry exceeds 2x its board median by more than 1s"
          + (f" ({skipped} unaudited — see coverage above)" if skipped else ""))



def main():
    args = sys.argv[1:]
    allow_drift = "--allow-drift" in args
    args = [a for a in args if a != "--allow-drift"]
    if args and args[0] == "--driver":
        if len(args) < 2:
            sys.exit("usage: round_compare.py --driver [--allow-drift] "
                     "DRIVER.json [BOARD.json,...]")
        driver_audit(args[1], args[2] if len(args) > 2 else DEFAULT_BOARD,
                     allow_drift)
        sys.exit(0)

    if not args:
        sys.exit(__doc__.strip())

    if len(args) == 1:
        old_paths, new_paths = DEFAULT_BOARD, args[0]
        print("old side defaulted to the r17 definitive cold board")
    else:
        old_paths, new_paths = args[0], args[1]

    old, cal_old, _ = load(old_paths)
    new, cal_new, meta_new = load(new_paths)
    if meta_new["drift"]:
        print("WARNING: new side carries calibration_drift=true — its box was "
              "measurably contaminated mid-run; normalized ratios partially "
              "correct for the average, not the phase structure")
    shared = sorted(set(old) & set(new))
    if not shared:
        sys.exit("no shared queries between the two sides")

    factor = None
    if cal_old and cal_new:
        factor = cal_new / cal_old
        print(f"calibration: old {cal_old:.3f}s new {cal_new:.3f}s "
              f"-> box factor {factor:.3f} (normalizing)")
    else:
        print("calibration: absent on one side -> raw ratios only")

    rows = []
    for q in shared:
        raw = new[q] / old[q] if old[q] else float("nan")
        norm = raw / factor if factor else None
        rows.append((q, old[q], new[q], raw, norm))
    rows.sort(key=lambda r: -(r[4] if r[4] is not None else r[3]))

    w = max(len(q) for q, *_ in rows)
    hdr = f"{'query':<{w}}  {'old':>8}  {'new':>8}  {'raw':>6}"
    if factor:
        hdr += f"  {'norm':>6}"
    print(hdr)
    for q, o, n, raw, norm in rows:
        line = f"{q:<{w}}  {o:8.2f}  {n:8.2f}  {raw:6.2f}"
        if factor:
            line += f"  {norm:6.2f}"
        print(line)

    raws = [r[3] for r in rows]
    print(f"\nmedian raw ratio: {statistics.median(raws):.3f}")
    if factor:
        norms = [r[4] for r in rows]
        print(f"median normalized ratio: {statistics.median(norms):.3f}")
        worst = [(q, norm) for q, _, _, _, norm in rows if norm > 1.3]
        if worst:
            print("normalized >1.3x: " +
                  ", ".join(f"{q} ({n:.2f}x)" for q, n in worst))
        else:
            print("no entry regresses >1.3x after normalization")


if __name__ == "__main__":
    main()
